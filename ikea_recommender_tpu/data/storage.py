"""Path-schema-dispatching file abstraction.

Keeps the reference's ``Gfile`` idea (``ikea/data_utils/gfile.py:7-61``):
one interface for local paths and remote object-store paths. The GCS branch
is gated on ``google-cloud-storage`` being importable (it is not baked into
the TPU image); everything else runs on the local FS.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from typing import List


def _is_gcs(path: str) -> bool:
    return path.startswith("gs://")


class Storage:
    def __init__(self, project: str | None = None):
        self.project = project
        self._client = None

    # -- GCS plumbing (optional dependency) --------------------------------
    def _gcs(self):
        if self._client is None:
            try:
                from google.cloud import storage as gcs  # type: ignore
            except ImportError as exc:  # pragma: no cover
                raise RuntimeError(
                    "gs:// paths need google-cloud-storage, which is not "
                    "installed in this image; stage data locally instead"
                ) from exc
            self._client = gcs.Client(project=self.project)
        return self._client

    def _split_gcs(self, path: str):
        rest = path[len("gs://") :]
        bucket, _, blob = rest.partition("/")
        return bucket, blob

    # -- API ---------------------------------------------------------------
    def open(self, path: str, mode: str = "r"):
        if _is_gcs(path):  # pragma: no cover - needs GCS
            bucket, blob = self._split_gcs(path)
            return self._gcs().bucket(bucket).blob(blob).open(mode)
        if "w" in mode or "a" in mode:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        return open(path, mode)

    def exists(self, path: str) -> bool:
        if _is_gcs(path):  # pragma: no cover - needs GCS
            bucket, blob = self._split_gcs(path)
            return self._gcs().bucket(bucket).blob(blob).exists()
        return os.path.exists(path)

    def copy(self, src: str, dst: str) -> None:
        if not _is_gcs(src) and not _is_gcs(dst):
            os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
            shutil.copy(src, dst)
            return
        with self.open(src, "rb") as fin, self.open(dst, "wb") as fout:  # pragma: no cover
            shutil.copyfileobj(fin, fout)

    def list_files(self, prefix: str) -> List[str]:
        if _is_gcs(prefix):  # pragma: no cover - needs GCS
            bucket, blob_prefix = self._split_gcs(prefix)
            blobs = self._gcs().list_blobs(bucket, prefix=blob_prefix)
            return [f"gs://{bucket}/{b.name}" for b in blobs]
        if os.path.isdir(prefix):
            return sorted(
                os.path.join(prefix, f) for f in os.listdir(prefix)
            )
        return sorted(glob.glob(prefix + "*"))

    def makedirs(self, path: str) -> None:
        if not _is_gcs(path):
            os.makedirs(path, exist_ok=True)


def load_json_gz_records(path: str, storage: Storage | None = None) -> list:
    """gzip-JSON session-file reader (reference
    ``ikea/data_utils/utils.py:90-103``): one JSON object per line."""
    storage = storage or Storage()
    with storage.open(path, "rb") as fh:
        raw = fh.read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    text = raw.decode() if isinstance(raw, bytes) else raw
    return [json.loads(line) for line in text.splitlines() if line.strip()]
