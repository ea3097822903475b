"""ctypes bindings for the native host runtime (libmfcore.so).

`load()` returns the library handle or None; callers fall back to the
pure-python paths when the library is absent.  `build()` compiles it with
the in-tree Makefile (g++, links zlib)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmfcore.so")
_lib = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and auto_build:
        build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.mf_connected_components.restype = ctypes.c_int32
    lib.mf_connected_components.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32]
    lib.mf_reassign_edges.restype = None
    lib.mf_reassign_edges.argtypes = [
        i32p, f32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_int32]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.mf_label_stats.restype = None
    lib.mf_label_stats.argtypes = [
        i32p, u8p, i32p, u8p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p]
    lib.mf_model_seg_overlap.restype = None
    lib.mf_model_seg_overlap.argtypes = [
        u8p, u8p, i32p, ctypes.c_int64, i32p]
    lib.mf_depth_moments.restype = None
    lib.mf_depth_moments.argtypes = [
        u8p, f32p, ctypes.c_int64, i64p, f64p, f64p]
    lib.mf_u8_bboxes.restype = None
    lib.mf_u8_bboxes.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.mf_inflate.restype = ctypes.c_int64
    lib.mf_inflate.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.mf_depth_mm_to_m.restype = None
    lib.mf_depth_mm_to_m.argtypes = [u16p, f32p, ctypes.c_int64]
    # sparse Cholesky (compiled only when Eigen headers were found)
    try:
        lib.mf_chol_create.restype = ctypes.c_void_p
        lib.mf_chol_create.argtypes = [ctypes.c_int32, i32p, i32p, f32p]
        lib.mf_chol_refactor.restype = ctypes.c_int32
        lib.mf_chol_refactor.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, i32p, i32p, f32p]
        lib.mf_chol_solve.restype = ctypes.c_int32
        lib.mf_chol_solve.argtypes = [ctypes.c_void_p, f32p, f32p]
        lib.mf_chol_destroy.restype = None
        lib.mf_chol_destroy.argtypes = [ctypes.c_void_p]
        lib.has_chol = True
    except AttributeError:
        lib.has_chol = False
    _lib = lib
    return _lib
