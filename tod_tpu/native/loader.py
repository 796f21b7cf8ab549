"""ctypes bindings for libtodtpu.so (planner + frame ring).

pybind11 isn't available in this environment; the C ABI + ctypes keeps the
boundary simple and dependency-free (SURVEY.md environment notes).
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from tod_tpu.native import build as _build

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


@functools.cache
def _lib() -> ctypes.CDLL | None:
    path = _build.ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.tod_dijkstra.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, _i32p, ctypes.c_int, _f64p, _i64p,
    ]
    lib.tod_dijkstra.restype = ctypes.c_int
    lib.tod_dijkstra_height.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, _i32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, _f64p, _i64p,
    ]
    lib.tod_dijkstra_height.restype = ctypes.c_int
    lib.tod_dijkstra_height_bidir.argtypes = lib.tod_dijkstra_height.argtypes
    lib.tod_dijkstra_height_bidir.restype = ctypes.c_int
    lib.tod_ring_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.tod_ring_create.restype = ctypes.c_void_p
    lib.tod_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.tod_ring_start_producer.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_uint64, ctypes.c_char_p,
    ]
    lib.tod_ring_start_producer.restype = ctypes.c_int
    lib.tod_ring_push.argtypes = [ctypes.c_void_p, _u8p, _u16p]
    lib.tod_ring_push.restype = ctypes.c_int
    lib.tod_ring_pop.argtypes = [ctypes.c_void_p, _u8p, _u16p, ctypes.c_int]
    lib.tod_ring_pop.restype = ctypes.c_int
    lib.tod_ring_size.argtypes = [ctypes.c_void_p]
    lib.tod_ring_size.restype = ctypes.c_int
    lib.tod_ring_stat_pushed.argtypes = [ctypes.c_void_p]
    lib.tod_ring_stat_pushed.restype = ctypes.c_uint64
    lib.tod_ring_stat_dropped.argtypes = [ctypes.c_void_p]
    lib.tod_ring_stat_dropped.restype = ctypes.c_uint64
    lib.tod_synth_frame.argtypes = [
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_int, ctypes.c_int, _u8p, _u16p,
    ]
    lib.tod_pack_rgb_u32.argtypes = [_u8p, ctypes.c_int64, _u32p]
    lib.tod_unpack_rgb_u32.argtypes = [_u32p, ctypes.c_int64, _u8p]
    lib.tod_trace_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _u8p, _u16p,
    ]
    lib.tod_trace_write.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def get() -> ctypes.CDLL:
    lib = _lib()
    if lib is None:
        raise RuntimeError("libtodtpu.so unavailable (no g++ toolchain?)")
    return lib
