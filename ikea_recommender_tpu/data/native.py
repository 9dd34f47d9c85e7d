"""ctypes bindings for the native host-side data engine (native/src/).

The reference ingests JSON-lines replay buffers with ``pd.read_json``
(``ikea/data_utils/replay_buffer.py:48``) — a generic parser that builds a
Python object per cell. The native parser is specialized to the 7-column
buffer row schema and writes straight into preallocated numpy arrays,
multithreaded across newline shards.

The shared library is built lazily with g++ on first use (no pybind11 in
this image — plain C ABI + ctypes). Every entry point degrades gracefully:
callers fall back to the pandas path when the toolchain or library is
unavailable, so the framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SRC = os.path.join(_NATIVE_DIR, "src", "jsonl_buffer.cpp")
_LIB = os.path.join(_NATIVE_DIR, "build", "libikea_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared", "-pthread",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed. None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.ikea_jsonl_count.restype = ctypes.c_int64
        lib.ikea_jsonl_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.ikea_jsonl_parse.restype = ctypes.c_int
        lib.ikea_jsonl_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


_ARRAY_COLS = ("state", "next_state")
_INT_COLS = ("action", "true_state_len", "true_next_state_len")


def parse_jsonl_buffer(
    data: bytes,
    columns: Sequence[str],
    n_threads: int = 0,
) -> Optional[Dict[str, np.ndarray]]:
    """Parse a JSON-lines replay/eval buffer into column arrays.

    Returns None when the native library is unavailable (caller falls back
    to pandas). Raises ValueError on malformed input. Only columns present
    in the first row are returned (eval buffers carry a subset).
    """
    lib = load_library()
    if lib is None:
        return None
    n = lib.ikea_jsonl_count(data, len(data))
    if n == 0:
        return {c: np.empty((0,), np.int32) for c in columns}

    # Sniff column presence + state_len from the first NON-EMPTY line (the
    # C++ row counter skips blank lines, so sniffing must too); any sniffing
    # failure falls back to the pandas path rather than raising here.
    try:
        first_line = next(ln for ln in data.splitlines() if ln.strip())
        first = json.loads(first_line)
    except (StopIteration, ValueError):
        return None
    present = [c for c in columns if c in first]
    # Columns the C++ parser understands; if the file carries a requested
    # column beyond that set (e.g. action_type), use the pandas path so the
    # caller never gets a silently-partial result.
    known = set(_ARRAY_COLS) | set(_INT_COLS) | {"r_act", "is_end"}
    if any(c not in known for c in present):
        return None
    state_len = len(first["state"]) if "state" in first else 0

    out: Dict[str, np.ndarray] = {}
    ptrs = {}
    for c in present:
        if c in _ARRAY_COLS:
            out[c] = np.empty((n, state_len), np.int32)
        elif c in _INT_COLS:
            out[c] = np.empty((n,), np.int32)
        elif c == "r_act":
            out[c] = np.empty((n,), np.float32)
        elif c == "is_end":
            out[c] = np.empty((n,), np.uint8)
        else:
            continue
        ptrs[c] = out[c].ctypes.data_as(ctypes.c_void_p)

    err = ctypes.create_string_buffer(256)
    rc = lib.ikea_jsonl_parse(
        data, len(data), state_len, n,
        ptrs.get("state"), ptrs.get("action"), ptrs.get("r_act"),
        ptrs.get("next_state"), ptrs.get("true_state_len"),
        ptrs.get("true_next_state_len"), ptrs.get("is_end"),
        n_threads or os.cpu_count() or 1, err, len(err),
    )
    if rc != 0:
        raise ValueError(f"native jsonl parse failed: {err.value.decode()}")
    if "is_end" in out:
        out["is_end"] = out["is_end"].astype(bool)
    return out
