"""Host-DRAM KV tier (SURVEY.md C6): ctypes binding of csrc/host_kv.cc plus a
pure-Python reference implementation with identical semantics.

The C++ library is compiled on first use with g++ (no pybind11 in the image;
the C ABI + ctypes keeps the boundary dependency-free). ctypes releases the
GIL around every foreign call, so batch lookups run the C++ thread pool while
Python threads (e.g. the training loop) keep going — the reference class gets
the same effect from its native CUDA/C++ backends (.gitignore:14-17).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_EMPTY = np.int64(-(2**63))
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
    """Compile csrc/host_kv.cc -> _native/libhostkv.so (cached by mtime)."""
    global _LIB, _LIB_ERR
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_ERR is not None:
            raise RuntimeError(_LIB_ERR)
        root = _repo_root()
        src = os.path.join(root, "csrc", "host_kv.cc")
        outdir = os.path.join(root, "_native")
        os.makedirs(outdir, exist_ok=True)
        # MEEPO_SANITIZE=1 builds the tier with ASan+UBSan (SURVEY.md §5
        # race/sanitizer CI config); the sanitized .so is kept separate so a
        # normal run never pays sanitizer overhead.
        san = os.environ.get("MEEPO_SANITIZE") == "1"
        so = os.path.join(outdir, "libhostkv_asan.so" if san else "libhostkv.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            tmp = f"{so}.tmp.{os.getpid()}"  # pid-unique: concurrent builds
            cmd = [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-march=native", "-pthread", src, "-o", tmp,
            ]
            if san:
                cmd[1:1] = ["-g", "-fsanitize=address,undefined",
                            "-fno-omit-frame-pointer"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)
            except (subprocess.SubprocessError, OSError) as e:
                _LIB_ERR = f"host_kv build failed: {e}"
                raise RuntimeError(_LIB_ERR) from e
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.hkv_create.restype = c.c_void_p
        lib.hkv_create.argtypes = [c.c_int, c.c_int64]
        lib.hkv_destroy.argtypes = [c.c_void_p]
        lib.hkv_insert.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p]
        lib.hkv_lookup.restype = c.c_int64
        lib.hkv_lookup.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p]
        lib.hkv_erase.restype = c.c_int64
        lib.hkv_erase.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p]
        lib.hkv_size.restype = c.c_int64
        lib.hkv_size.argtypes = [c.c_void_p]
        lib.hkv_capacity.restype = c.c_int64
        lib.hkv_capacity.argtypes = [c.c_void_p]
        lib.hkv_export.restype = c.c_int64
        lib.hkv_export.argtypes = [
            c.c_void_p, c.c_int64, c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p,
        ]
        lib.hkv_clear.argtypes = [c.c_void_p]
        _LIB = lib
        return lib


def _as_keys(keys) -> np.ndarray:
    k = np.ascontiguousarray(keys, dtype=np.int64)
    assert k.ndim == 1, f"keys must be [n], got {k.shape}"
    return k


class HostKVStore:
    """C++ host-DRAM store: int64 key -> float32[width] row (SURVEY.md C6)."""

    def __init__(self, width: int, capacity_hint: int = 1 << 16):
        self._lib = _build_and_load()
        self.width = int(width)
        self._h = self._lib.hkv_create(self.width, int(capacity_hint))
        if not self._h:
            raise MemoryError("hkv_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.hkv_destroy(h)
            self._h = None

    def insert_batch(self, keys, rows) -> None:
        k = _as_keys(keys)
        r = np.ascontiguousarray(rows, dtype=np.float32)
        assert r.shape == (len(k), self.width), (r.shape, len(k), self.width)
        self._lib.hkv_insert(self._h, len(k), k.ctypes.data, r.ctypes.data)

    def lookup_batch(self, keys) -> Tuple[np.ndarray, np.ndarray]:
        k = _as_keys(keys)
        out = np.empty((len(k), self.width), np.float32)
        found = np.empty(len(k), np.uint8)
        self._lib.hkv_lookup(self._h, len(k), k.ctypes.data, out.ctypes.data, found.ctypes.data)
        return out, found.astype(bool)

    def erase_batch(self, keys) -> np.ndarray:
        k = _as_keys(keys)
        found = np.empty(len(k), np.uint8)
        self._lib.hkv_erase(self._h, len(k), k.ctypes.data, found.ctypes.data)
        return found.astype(bool)

    def export(self, chunk: int = 65536) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        cur = 0
        nxt = np.zeros(1, np.int64)
        keys = np.empty(chunk, np.int64)
        rows = np.empty((chunk, self.width), np.float32)
        while True:
            n = self._lib.hkv_export(
                self._h, cur, chunk, keys.ctypes.data, rows.ctypes.data, nxt.ctypes.data
            )
            if n > 0:
                yield keys[:n].copy(), rows[:n].copy()
            cur = int(nxt[0])
            if cur >= self._lib.hkv_capacity(self._h):
                return

    def clear(self) -> None:
        self._lib.hkv_clear(self._h)

    def __len__(self) -> int:
        return int(self._lib.hkv_size(self._h))


class PyKVStore:
    """Pure-Python dict store with HostKVStore semantics: the fallback when a
    native toolchain is unavailable, and the oracle for conformance tests."""

    def __init__(self, width: int, capacity_hint: int = 0):
        self.width = int(width)
        self._d: dict = {}
        self._lock = threading.Lock()

    def insert_batch(self, keys, rows) -> None:
        k = _as_keys(keys)
        r = np.ascontiguousarray(rows, dtype=np.float32)
        assert r.shape == (len(k), self.width)
        with self._lock:
            for i, key in enumerate(k):
                if key != _EMPTY:
                    self._d[int(key)] = r[i].copy()

    def lookup_batch(self, keys) -> Tuple[np.ndarray, np.ndarray]:
        k = _as_keys(keys)
        out = np.zeros((len(k), self.width), np.float32)
        found = np.zeros(len(k), bool)
        with self._lock:
            for i, key in enumerate(k):
                row = self._d.get(int(key))
                if row is not None:
                    out[i] = row
                    found[i] = True
        return out, found

    def erase_batch(self, keys) -> np.ndarray:
        k = _as_keys(keys)
        found = np.zeros(len(k), bool)
        with self._lock:
            for i, key in enumerate(k):
                found[i] = self._d.pop(int(key), None) is not None
        return found

    def export(self, chunk: int = 65536) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        with self._lock:
            items = list(self._d.items())
        for o in range(0, len(items), chunk):
            part = items[o : o + chunk]
            yield (
                np.array([k for k, _ in part], np.int64),
                np.stack([v for _, v in part]) if part else np.zeros((0, self.width), np.float32),
            )

    def clear(self) -> None:
        with self._lock:
            self._d.clear()

    def __len__(self) -> int:
        return len(self._d)
