"""ctypes loader for the C++ wavepack scheduler (_scheduler.cpp).

The production analog of the reference's C++ preprocessor (sw/data_formatter.h)
— Python stays the API layer, the sequential hot loop runs native.  Compiled
on demand with g++ into the package directory; if no toolchain is available
every caller falls back to the identical pure-Python implementation.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_scheduler.cpp")
_SO = os.path.join(_HERE, "_scheduler.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.wp_schedule_segments.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.wp_schedule_segments.restype = None
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.wp_schedule_bm.argtypes = [
                ctypes.c_int64, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, i64p, ctypes.c_int64,
                i64p, i64p, i32p, i32p,
                ctypes.POINTER(ctypes.c_uint8), i32p, ctypes.c_int64]
            lib.wp_schedule_bm.restype = ctypes.c_int64
            u32p = ctypes.POINTER(ctypes.c_uint32)
            lib.wp_emit.argtypes = [
                ctypes.c_int64, i64p, i64p, i32p, i32p, i32p, i32p, u32p,
                ctypes.c_int32, ctypes.c_int32, u32p, i32p]
            lib.wp_emit.restype = None
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def schedule_segments(seg_bounds: np.ndarray, stripe: np.ndarray,
                      lam: np.ndarray, bank: np.ndarray,
                      addr: np.ndarray, bank2: np.ndarray):
    lib = _load()
    assert lib is not None
    n = stripe.size
    k_of = np.empty(n, np.int64)
    choice = np.zeros(n, np.uint8)
    seg_bounds = np.ascontiguousarray(seg_bounds, np.int64)
    args = [np.ascontiguousarray(a, np.int32)
            for a in (stripe, lam, bank, addr, bank2)]
    lib.wp_schedule_segments(
        ctypes.c_int64(seg_bounds.size - 1),
        seg_bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        args[0].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        args[1].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        args[2].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        args[3].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        args[4].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k_of.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        choice.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return k_of, choice


def emit(T_total: int, S: int, t_glob, s_loc, lane_used, lam, bfield,
         ha_field, vals_sorted, steal_mantissa: bool, pad_val):
    """One-pass stream emission: scatter values to dest slots and index
    fields to their transposed positions.  Returns (vals, idxT), byte-equal
    to the numpy fallback in wavepack.pack()."""
    lib = _load()
    assert lib is not None
    n = t_glob.size
    vals = np.full((T_total, S, 128), pad_val, vals_sorted.dtype)
    idxT = np.zeros((T_total, S, 128), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    t_glob = np.ascontiguousarray(t_glob, np.int64)
    s_loc = np.ascontiguousarray(s_loc, np.int64)
    ints = [np.ascontiguousarray(a, np.int32)
            for a in (lane_used, lam, bfield, ha_field)]
    vbits = np.ascontiguousarray(vals_sorted).view(np.uint32)
    lib.wp_emit(ctypes.c_int64(n),
                t_glob.ctypes.data_as(i64p), s_loc.ctypes.data_as(i64p),
                *[a.ctypes.data_as(i32p) for a in ints],
                vbits.ctypes.data_as(u32p),
                ctypes.c_int32(int(steal_mantissa)), ctypes.c_int32(S),
                vals.view(np.uint32).ctypes.data_as(u32p),
                idxT.ctypes.data_as(i32p))
    return vals, idxT


def schedule_bm(sigma, lam, bank, h, cls, cls2, bank2, R, S, CT, K,
                stop_frac=0.0):
    """Block-major scheduler; returns
    (t_of, s_of, lane_of, bsel_of, choice_of, class_map)."""
    lib = _load()
    assert lib is not None
    n = sigma.size
    args = [np.ascontiguousarray(a, np.int32)
            for a in (sigma, lam, bank, h, cls, cls2, bank2)]
    # composite-key stable argsort == lexsort((pos, h, bank, cls, sigma))
    key = (((sigma.astype(np.int64) * (int(cls.max()) + 1 if n else 1)
             + cls) * 128 + bank) * 128 + h)
    order = np.ascontiguousarray(np.argsort(key, kind="stable"), np.int64)
    t_of = np.full(n, -1, np.int64)
    s_of = np.zeros(n, np.int64)
    lane_of = np.zeros(n, np.int32)
    bsel_of = np.zeros(n, np.int32)
    choice_of = np.zeros(n, np.uint8)
    G = S // 128
    cap = max(64, int(n * 8 // (S * 128)) + 64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    while True:
        cm = np.zeros(cap * G * K, np.int32)
        rc = lib.wp_schedule_bm(
            ctypes.c_int64(n),
            *[a.ctypes.data_as(i32p) for a in args],
            ctypes.c_int32(R), ctypes.c_int32(S), ctypes.c_int32(CT),
            ctypes.c_int32(K),
            order.ctypes.data_as(i64p),
            ctypes.c_int64(int(stop_frac * S * 128)),
            t_of.ctypes.data_as(i64p), s_of.ctypes.data_as(i64p),
            lane_of.ctypes.data_as(i32p), bsel_of.ctypes.data_as(i32p),
            choice_of.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cm.ctypes.data_as(i32p), ctypes.c_int64(cap))
        if rc >= 0:
            T = int(rc)
            return (t_of, s_of, lane_of, bsel_of, choice_of,
                    cm[:T * G * K].reshape(T, G, K))
        cap = int(-rc) * 2
