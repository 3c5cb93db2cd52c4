"""ctypes binding of the native Criteo TSV parser (csrc/criteo_parse.cc).

Same compile-on-first-use scheme as the host KV tier (backends/host_kv.py):
g++ + C ABI + ctypes, no pybind11. ctypes drops the GIL around the call, so
parsing overlaps the training loop's Python work. Falls back cleanly: callers
check `available()` and use the pure-Python parser otherwise
(data/criteo.py:parse_lines — the two are bit-compatible, tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

NUM_DENSE = 13
NUM_SPARSE = 26

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _repo_root() -> str:
    """Directory holding csrc/. MEEPO_CSRC overrides for non-editable
    installs where the package does not live inside a source checkout."""
    env = os.environ.get("MEEPO_CSRC")
    if env:
        return env
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_and_load() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_ERR is not None:
            raise RuntimeError(_LIB_ERR)
        try:
            root = _repo_root()
            src = os.path.join(root, "csrc", "criteo_parse.cc")
            outdir = os.path.join(root, "_native")
            os.makedirs(outdir, exist_ok=True)
            so = os.path.join(outdir, "libcriteoparse.so")
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                # pid-unique tmp: concurrent first-use builds from multiple
                # processes must not interleave writes to one output file
                tmp = f"{so}.tmp.{os.getpid()}"
                cmd = [
                    "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                    "-march=native", src, "-o", tmp,
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)  # atomic; last builder wins
            lib = ctypes.CDLL(so)
        except (subprocess.SubprocessError, OSError) as e:
            # any failure (read-only checkout, missing source, bad compiler)
            # must fall back to the Python parser, not crash the pipeline
            _LIB_ERR = f"criteo_parse build failed: {e}"
            raise RuntimeError(_LIB_ERR)
        lib.criteo_parse_batch.restype = ctypes.c_long
        lib.criteo_parse_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return lib


def available() -> bool:
    if os.environ.get("MEEPO_NATIVE_PARSE", "1") == "0":
        return False
    try:
        _build_and_load()
        return True
    except RuntimeError:
        return False


def parse_block(block: bytes, max_rows: int):
    """One text block (complete lines) -> (rows, dense, ids, label)."""
    lib = _build_and_load()
    dense = np.zeros((max_rows, NUM_DENSE), np.float32)
    ids = np.zeros((max_rows, NUM_SPARSE), np.int64)
    label = np.zeros((max_rows,), np.float32)
    rows = lib.criteo_parse_batch(
        block, len(block), max_rows,
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return rows, dense, ids, label


def parse_lines_native(lines, batch_size: int) -> Iterator[dict]:
    """Drop-in for criteo.parse_lines over an iterator of str lines: groups
    batch_size lines into one buffer and parses them in one native call."""
    buf: list = []
    for line in lines:
        buf.append(line if line.endswith("\n") else line + "\n")
        if len(buf) == batch_size:
            rows, dense, ids, label = parse_block(
                "".join(buf).encode(), batch_size
            )
            assert rows == batch_size
            yield {"dense": dense, "ids": ids, "label": label}
            buf = []
    # final partial batch dropped (static shapes under jit), same as Python
