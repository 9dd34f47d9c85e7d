# TPU training image (replaces the reference's Vertex AI pytorch-gpu image,
# reference Dockerfile:1-34). Use a Cloud TPU JAX base; the entrypoint runs
# an experiment config baked or mounted at /experiment.yaml.
FROM python:3.11-slim

WORKDIR /app

COPY pyproject.toml README.md ./
COPY ikea_recommender_tpu ./ikea_recommender_tpu
COPY scripts ./scripts

# jax[tpu] pulls libtpu for Cloud TPU VMs.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[data]

# No secrets baked into the image (the reference committed wandb keys in
# configs/Dockerfile — deliberately not replicated). Pass WANDB_API_KEY etc.
# via the environment at deploy time.
ENTRYPOINT ["python", "-m", "ikea_recommender_tpu.run.cli", "-f", "/experiment.yaml"]
