"""ctypes bindings for the native host runtime (with automatic build and
numpy fallbacks). See auncel_native.cpp for what lives here and why."""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libauncel_native.so")
_lib = None
_load_failed = False   # tri-state: None+False = untried


def _try_load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        # remember failure: re-running `make` (up to its 120 s timeout)
        # on EVERY call would tax each numpy-fallback code path
        return None
    # ALWAYS let make decide (no-op when the .so is newer than the .cpp):
    # an exists-only check would dlopen a STALE library built before a
    # newer entry point was added, and the symbol binding below would
    # crash every native code path instead of rebuilding.
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        return _bind(lib)
    except (OSError, AttributeError):
        # missing file or missing symbol (stale build that make could not
        # refresh): soft-fail to the numpy fallbacks, never crash callers
        _load_failed = True
        return None


def _bind(lib):
    global _lib
    lib.vecs_strip_headers.restype = ctypes.c_int
    lib.vecs_strip_headers.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.kway_merge_topk.restype = None
    lib.kway_merge_topk.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.pack_lists.restype = None
    lib.pack_lists.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int64] * 3 \
        + [ctypes.c_void_p] * 2
    lib.gather_rows.restype = None
    lib.gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p]
    _lib = lib
    return lib


def _reset_for_tests() -> None:
    """Drop the cached handle/failure so tests can exercise _try_load."""
    global _lib, _load_failed
    _lib, _load_failed = None, False


def available() -> bool:
    return _try_load() is not None


def vecs_strip_headers(raw: np.ndarray, d: int) -> np.ndarray | None:
    """raw: int32 [n*(d+1)] -> int32 [n, d]; None if native lib missing or
    headers are inconsistent."""
    lib = _try_load()
    if lib is None:
        return None
    n = raw.size // (d + 1)
    raw = np.ascontiguousarray(raw[: n * (d + 1)], np.int32)
    out = np.empty((n, d), np.int32)
    rc = lib.vecs_strip_headers(
        raw.ctypes.data, n, d, out.ctypes.data)
    return out if rc == 0 else None


def kway_merge_topk(vals: np.ndarray, ids: np.ndarray,
                    lower_is_better: bool):
    """vals/ids: [S, B, k] sorted best-first -> ([B, k], [B, k]).
    Falls back to numpy when the lib is absent or S > 64."""
    S, B, k = vals.shape
    lib = _try_load()
    if lib is None or S > 64:
        flat_v = np.transpose(vals, (1, 0, 2)).reshape(B, S * k)
        flat_i = np.transpose(ids, (1, 0, 2)).reshape(B, S * k)
        order = np.argsort(flat_v if lower_is_better else -flat_v, axis=1,
                           kind="stable")[:, :k]
        return (np.take_along_axis(flat_v, order, 1),
                np.take_along_axis(flat_i, order, 1))
    vals = np.ascontiguousarray(vals, np.float32)
    ids = np.ascontiguousarray(ids, np.int64)
    out_v = np.empty((B, k), np.float32)
    out_i = np.empty((B, k), np.int64)
    lib.kway_merge_topk(vals.ctypes.data, ids.ctypes.data, S, B, k,
                        int(lower_is_better), out_v.ctypes.data,
                        out_i.ctypes.data)
    return out_v, out_i


def gather_rows(src: np.ndarray, rows: np.ndarray,
                out: np.ndarray | None = None) -> np.ndarray | None:
    """dst[i] = src[rows[i]] with threaded row copies (the reference's
    prefetch_lists pread-thread capability over the npy mmap): MAJOR
    page faults — the regime an on-disk index exists for, corpus >> RAM
    — fan out across cores instead of numpy's serial fancy index
    (measured 26x on a cache-evicted 235 MB page set; parity when the
    pages are already cached, both ~3 GB/s memcpy-bound). ``src`` may be
    an np.memmap. Returns None when the native lib is unavailable
    (callers fall back to src[rows])."""
    lib = _try_load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    # every validation failure returns None (the documented fallback
    # contract) instead of asserting: the C memcpy has no bounds checks,
    # and `assert` disappears under python -O — the numpy fallback then
    # surfaces a caller bug as a safe IndexError, not heap corruption
    if not src.flags["C_CONTIGUOUS"]:
        return None
    if out is None:
        out = np.empty((rows.size,) + src.shape[1:], src.dtype)
    elif (not out.flags["C_CONTIGUOUS"] or out.dtype != src.dtype
          or out.shape != (rows.size,) + src.shape[1:]):
        return None
    if rows.size:
        if rows.min() < 0 or rows.max() >= src.shape[0]:
            return None
        row_bytes = (int(np.prod(src.shape[1:], dtype=np.int64))
                     * src.itemsize)
        lib.gather_rows(src.ctypes.data, rows.ctypes.data, rows.size,
                        row_bytes, out.ctypes.data)
    return out


def pack_lists(x: np.ndarray, vid: np.ndarray, order: np.ndarray,
               starts: np.ndarray, nlist: int, cap: int):
    """Returns (db [nlist, cap, d] f32, ids [nlist, cap] i32) or None."""
    lib = _try_load()
    if lib is None:
        return None
    n, d = x.shape
    x = np.ascontiguousarray(x, np.float32)
    vid = np.ascontiguousarray(vid, np.int64)
    order = np.ascontiguousarray(order, np.int64)
    starts = np.ascontiguousarray(starts, np.int64)
    db = np.zeros((nlist, cap, d), np.float32)
    out_ids = np.full((nlist, cap), -1, np.int32)
    lib.pack_lists(x.ctypes.data, vid.ctypes.data, order.ctypes.data,
                   starts.ctypes.data, nlist, cap, d,
                   db.ctypes.data, out_ids.ctypes.data)
    return db, out_ids
