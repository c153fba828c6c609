"""ctypes bindings for the native host library (csrc/bs_host.cpp).

Compiled on demand with g++ (no pybind11 in the image); every entry
point has a pure-Python fallback, so the framework works without a
toolchain — the native path just makes layout compilation fast at
production scale (10^5+ blocks).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_lib():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "csrc", "bs_host.cpp")
    if not os.path.exists(src):
        return None
    cache = os.path.join(here, "build")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libbs_host.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bs_grouped_schedule.restype = ctypes.c_int
    lib.bs_grouped_schedule.argtypes = [
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p, i32p, i32p, i32p]
    lib.bs_supertile_schedule.restype = ctypes.c_int
    lib.bs_supertile_schedule.argtypes = [
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i64p, i32p, i32p, i32p, i32p]
    lib.bs_cluster_rows.restype = ctypes.c_int
    lib.bs_cluster_rows.argtypes = [
        ctypes.c_int64, i32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p]
    lib.bs_sample_batch.restype = None
    lib.bs_sample_batch.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p]
    return lib


def get_lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_lib()
    return _LIB


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grouped_schedule(row_of, in_blk, w_id, n_rows, G, R):
    """Native build_grouped_schedule core; returns
    (rows, in_idx, w_idx, w_valid) or None if the library is missing.
    Entries must be sorted by row."""
    lib = get_lib()
    if lib is None:
        return None
    row_of = np.ascontiguousarray(row_of, np.int32)
    in_blk = np.ascontiguousarray(in_blk, np.int32)
    w_id = np.ascontiguousarray(w_id, np.int32)
    nnz = row_of.shape[0]
    CH = ctypes.c_int32(0)
    groups = lib.bs_grouped_schedule(
        nnz, _i32(row_of), _i32(in_blk), _i32(w_id), n_rows, G, R,
        ctypes.byref(CH), None, None, None, None)
    if groups < 0:
        return None
    CH = CH.value
    rows = np.zeros((groups, CH), np.int32)
    in_idx = np.zeros((groups, CH, G), np.int32)
    w_idx = np.zeros((groups, CH, G), np.int32)
    w_valid = np.zeros((groups, CH, G), np.int32)
    lib.bs_grouped_schedule(
        nnz, _i32(row_of), _i32(in_blk), _i32(w_id), n_rows, G, R,
        None, _i32(rows), _i32(in_idx), _i32(w_idx), _i32(w_valid))
    return rows, in_idx, w_idx, w_valid


def supertile_schedule(row_of, in_blk, w_id, n_rows, V, R):
    """Native build_supertile_schedule core; returns
    (rows, in_idx, w_idx, w_valid, padded_blocks) or None."""
    lib = get_lib()
    if lib is None:
        return None
    row_of = np.ascontiguousarray(row_of, np.int32)
    in_blk = np.ascontiguousarray(in_blk, np.int32)
    w_id = np.ascontiguousarray(w_id, np.int32)
    nnz = row_of.shape[0]
    CH = ctypes.c_int32(0)
    padded = ctypes.c_int64(0)
    groups = lib.bs_supertile_schedule(
        nnz, _i32(row_of), _i32(in_blk), _i32(w_id), n_rows, V, R,
        ctypes.byref(CH), ctypes.byref(padded), None, None, None, None)
    if groups < 0:
        return None
    CH = CH.value
    rows = np.zeros((groups, CH), np.int32)
    in_idx = np.zeros((groups, CH, V), np.int32)
    w_idx = np.zeros((groups, CH, V), np.int32)
    w_valid = np.zeros((groups, CH, V), np.int32)
    lib.bs_supertile_schedule(
        nnz, _i32(row_of), _i32(in_blk), _i32(w_id), n_rows, V, R,
        None, None, _i32(rows), _i32(in_idx), _i32(w_idx), _i32(w_valid))
    return rows, in_idx, w_idx, w_valid, padded.value


def cluster_rows_native(row_of, in_blk, n_rows, n_cols, R):
    """Native greedy union-minimizing clustering; returns the row
    permutation, or None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    row_of = np.ascontiguousarray(row_of, np.int32)
    in_blk = np.ascontiguousarray(in_blk, np.int32)
    perm = np.empty(n_rows, np.int32)
    rc = lib.bs_cluster_rows(row_of.shape[0], _i32(row_of), _i32(in_blk),
                             n_rows, n_cols, R, _i32(perm))
    if rc != 0:
        return None
    return perm.astype(np.int64)


def sample_batch(data: np.ndarray, offsets: np.ndarray, ctx: int):
    """Native batched window gather from a uint8 corpus; returns (x, y)
    int32 (batch, ctx) arrays, or None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    batch = offsets.shape[0]
    x = np.empty((batch, ctx), np.int32)
    y = np.empty((batch, ctx), np.int32)
    lib.bs_sample_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.shape[0],
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch, ctx, _i32(x), _i32(y))
    return x, y
