"""Python binding for the native ratings loader (ctypes; no pybind11).

Blueprint: SURVEY.md C18 + the framework's native-runtime tier: mmap'd
columnar rating files, zero-copy host shards for multi-host loading
(SURVEY.md C15), and a double-buffered threaded minibatch sampler whose
with-replacement semantics match the plate subsampler exactly.

Builds the shared library lazily with g++ on first use (cached next to the
source); if no compiler is available every entry point falls back to a
numpy implementation with identical behavior.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_MAGIC = 0x4254505230303131
_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "ratings_loader.cc")
_SO = os.path.join(_HERE, "cpp", "_ratings_loader.so")

_lib = None
_lib_lock = threading.Lock()


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.btpr_open.restype = ctypes.c_void_p
        lib.btpr_open.argtypes = [ctypes.c_char_p]
        lib.btpr_size.restype = ctypes.c_uint64
        lib.btpr_size.argtypes = [ctypes.c_void_p]
        lib.btpr_read_shard.restype = ctypes.c_int
        lib.btpr_read_shard.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.btpr_batch_start.restype = ctypes.c_void_p
        lib.btpr_batch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.btpr_batch_next.restype = ctypes.c_uint64
        lib.btpr_batch_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.btpr_batch_close.argtypes = [ctypes.c_void_p]
        lib.btpr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available():
    try:
        _load_lib()
        return True
    except Exception:
        return False


def write_ratings(path, users, items, ratings):
    """Write the columnar binary format."""
    users = np.ascontiguousarray(users, np.int32)
    items = np.ascontiguousarray(items, np.int32)
    ratings = np.ascontiguousarray(ratings, np.float32)
    n = users.shape[0]
    assert items.shape[0] == n and ratings.shape[0] == n
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", _MAGIC, n))
        f.write(users.tobytes())
        f.write(items.tobytes())
        f.write(ratings.tobytes())
    return path


class RatingsDataset:
    """mmap-backed ratings dataset with host-shard reads and a prefetching
    minibatch iterator."""

    def __init__(self, path, use_native=None):
        self.path = path
        if use_native is None:
            use_native = native_available()
        self.native = bool(use_native)
        self._iters = set()
        if self.native:
            lib = _load_lib()
            self._h = lib.btpr_open(path.encode())
            if not self._h:
                raise IOError(f"could not open ratings file {path}")
            self._n = int(lib.btpr_size(self._h))
        else:
            with open(path, "rb") as f:
                magic, n = struct.unpack("<QQ", f.read(16))
            if magic != _MAGIC:
                raise IOError(f"bad magic in {path}")
            self._n = int(n)
            self._mm = np.memmap(path, np.uint8, "r")
            self._users = self._mm[16:16 + 4 * n].view(np.int32)
            self._items = self._mm[16 + 4 * n:16 + 8 * n].view(np.int32)
            self._ratings = self._mm[16 + 8 * n:16 + 12 * n].view(np.float32)

    def __len__(self):
        return self._n

    def read_shard(self, start, count):
        """Contiguous slice (users, items, ratings) — this host's shard
        (pair with parallel.launcher.host_shard index math)."""
        if start + count > self._n:
            raise IndexError("shard out of range")
        u = np.empty(count, np.int32)
        i = np.empty(count, np.int32)
        r = np.empty(count, np.float32)
        if self.native:
            lib = _load_lib()
            rc = lib.btpr_read_shard(
                self._h, start, count,
                u.ctypes.data_as(ctypes.c_void_p),
                i.ctypes.data_as(ctypes.c_void_p),
                r.ctypes.data_as(ctypes.c_void_p),
            )
            assert rc == 0
        else:
            u[:] = self._users[start:start + count]
            i[:] = self._items[start:start + count]
            r[:] = self._ratings[start:start + count]
        return u, i, r

    def batches(self, batch_size, seed=0, num_threads=4):
        """Infinite iterator of uniformly-sampled (with replacement)
        minibatches; the native path gathers the NEXT batch on worker
        threads while the caller consumes the current one."""
        if self.native:
            lib = _load_lib()
            it = lib.btpr_batch_start(self._h, batch_size, seed,
                                      num_threads)
            self._iters.add(it)
            try:
                while True:
                    if it not in self._iters:
                        # close() already tore this iterator down; calling
                        # into the freed native handle would be
                        # use-after-free (r2 review finding)
                        return
                    u = np.empty(batch_size, np.int32)
                    i = np.empty(batch_size, np.int32)
                    r = np.empty(batch_size, np.float32)
                    got = lib.btpr_batch_next(
                        it,
                        u.ctypes.data_as(ctypes.c_void_p),
                        i.ctypes.data_as(ctypes.c_void_p),
                        r.ctypes.data_as(ctypes.c_void_p),
                    )
                    if got == 0:
                        return
                    yield u, i, r
            finally:
                if it in self._iters:
                    self._iters.discard(it)
                    lib.btpr_batch_close(it)
        else:
            rng = np.random.default_rng(seed)
            while True:
                idx = rng.integers(0, self._n, batch_size)
                yield (self._users[idx], self._items[idx],
                       self._ratings[idx])

    def close(self):
        if self.native and self._h:
            lib = _load_lib()
            # stop any live batch iterators BEFORE unmapping: their worker
            # threads read the mmap (an unclosed generator would otherwise
            # race close() and segfault)
            for it in list(self._iters):
                self._iters.discard(it)
                lib.btpr_batch_close(it)
            lib.btpr_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
