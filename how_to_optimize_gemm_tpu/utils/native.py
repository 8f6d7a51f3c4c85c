"""ctypes loader for the native (C++) harness utilities in csrc/.

Builds libhtog_native.so on first use (g++, ~1 s) and exposes:
- native_dclock()           — CLOCK_MONOTONIC_RAW seconds
- native_compare(out, ref)  — max-abs-diff + first offender
- native_fill(n, seed)      — xoshiro256** uniform(-1,1) fill

Every entry has a pure-Python/numpy fallback at its call site (timing.py,
oracle.py), so a missing compiler degrades gracefully.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[2]
_CSRC = _REPO / "csrc"
_SO = _CSRC / "libhtog_native.so"

_lib = None


def _stale() -> bool:
    """True when the .so is missing or older than any source/Makefile —
    a previously built library must pick up new csrc/ code (a stale .so
    would fail with missing symbols on newly added entry points)."""
    if not _SO.exists():
        return True
    so_mtime = _SO.stat().st_mtime
    srcs = list(_CSRC.glob("*.cpp")) + [_CSRC / "Makefile"]
    return any(s.exists() and s.stat().st_mtime > so_mtime
               for s in srcs)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    lib.htog_dclock.restype = ctypes.c_double
    lib.htog_compare.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.htog_fill_uniform.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_float]
    lib.htog_write_mfile.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
    lib.htog_write_mfile.restype = ctypes.c_int
    lib.htog_read_mfile.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
    lib.htog_read_mfile.restype = ctypes.c_int64
    # paged-KV allocator (csrc/paged_alloc.cpp; parallel/kv_alloc.py
    # wraps these as PagedAllocatorNative)
    tok_ptr = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    lib.pa_new.argtypes = [i64, i64, i64, i64, ctypes.c_int]
    lib.pa_new.restype = ctypes.c_void_p
    lib.pa_delete.argtypes = [ctypes.c_void_p]
    lib.pa_grow_slot.argtypes = [ctypes.c_void_p, i64, i64]
    lib.pa_grow_slot.restype = ctypes.c_int
    lib.pa_release_slot.argtypes = [ctypes.c_void_p, i64]
    lib.pa_attach_prefix.argtypes = [ctypes.c_void_p, i64, tok_ptr,
                                     i64, i64]
    lib.pa_attach_prefix.restype = i64
    lib.pa_register_prefix.argtypes = [ctypes.c_void_p, i64, tok_ptr,
                                       i64, i64]
    lib.pa_table_ptr.argtypes = [ctypes.c_void_p]
    lib.pa_table_ptr.restype = ctypes.c_void_p
    for fn in ("pa_free_pages", "pa_cached_pages", "pa_hit_tokens"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
        getattr(lib, fn).restype = i64
    lib.pa_slot_npages.argtypes = [ctypes.c_void_p, i64]
    lib.pa_slot_npages.restype = i64
    lib._pa_tok_ptr = tok_ptr
    _lib = lib
    return lib


def paged_alloc_lib():
    """The loaded native library with pa_* prototypes attached
    (PagedAllocatorNative's handle)."""
    return _load()


def native_dclock() -> float:
    return _load().htog_dclock()


def native_compare(out: np.ndarray, ref: np.ndarray, denom: float,
                   rel_gate: float):
    """Returns (max_abs, first_bad or None)."""
    lib = _load()
    out = np.ascontiguousarray(out, np.float32)
    ref = np.ascontiguousarray(ref, np.float64)
    assert out.shape == ref.shape and out.ndim == 2
    max_abs = ctypes.c_double()
    fi = ctypes.c_int64()
    fj = ctypes.c_int64()
    lib.htog_compare(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.shape[0], out.shape[1], denom, rel_gate,
        ctypes.byref(max_abs), ctypes.byref(fi), ctypes.byref(fj))
    first = (fi.value, fj.value) if fi.value >= 0 else None
    return max_abs.value, first


def native_write_mfile(path: str, version: str,
                       rows: list[tuple[int, float, float]]) -> None:
    lib = _load()
    flat = np.array([[p, g, d] for p, g, d in rows],
                    np.float64).reshape(-1)
    if flat.size == 0:
        flat = np.zeros(0, np.float64)
    rc = lib.htog_write_mfile(
        str(path).encode(), version.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(rows))
    if rc != 0:
        raise OSError(f"htog_write_mfile({path}) failed")


def native_read_mfile(path: str, max_rows: int = 4096
                      ) -> list[tuple[int, float, float]]:
    lib = _load()
    buf = np.zeros(max_rows * 3, np.float64)
    n = lib.htog_read_mfile(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows)
    if n < 0:
        raise OSError(f"htog_read_mfile({path}) failed")
    return [(int(buf[3 * i]), float(buf[3 * i + 1]), float(buf[3 * i + 2]))
            for i in range(n)]


def native_fill(count: int, seed: int = 0, constant: float | None = None
                ) -> np.ndarray:
    lib = _load()
    buf = np.empty(count, np.float32)
    lib.htog_fill_uniform(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count, seed, 0 if constant is None else 1,
        0.0 if constant is None else constant)
    return buf
