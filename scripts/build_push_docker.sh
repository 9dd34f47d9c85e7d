#!/bin/bash
# Build and push the training + preprocessing images (reference
# build_push_docker.sh, with the registry parameterized instead of
# hardcoded and no credentials baked into the image).
#
# Usage: REGISTRY=europe-west4-docker.pkg.dev/<project>/<repo> \
#        ./scripts/build_push_docker.sh [tag]
set -euo pipefail

REGISTRY="${REGISTRY:?set REGISTRY=<artifact-registry path>}"
TAG="${1:-latest}"
ROOT="$(dirname "$0")/.."

docker buildx build "$ROOT" --platform linux/amd64 \
    --tag "$REGISTRY/ikea-recommender-tpu:$TAG"
docker buildx build "$ROOT" -f "$ROOT/Dockerfile.dataprocessing" \
    --platform linux/amd64 \
    --tag "$REGISTRY/ikea-recommender-tpu-dataproc:$TAG"

docker push "$REGISTRY/ikea-recommender-tpu:$TAG"
docker push "$REGISTRY/ikea-recommender-tpu-dataproc:$TAG"
