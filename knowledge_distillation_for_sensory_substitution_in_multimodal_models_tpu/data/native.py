"""ctypes bindings for the native host-preprocessing library
(``native/libdepthops.so``; build with ``native/build.sh``).

Exposes :func:`depth_to_3ch_native`, a drop-in, bit-exact replacement for
:func:`..data.depth.depth_to_3ch_numpy` running the Prewitt encoding in
OpenMP C++ (the reference's CPU hot loop #1 — SURVEY.md §3.1).  Falls back
to the numpy implementation when the library is absent, so the pipeline
never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .depth import depth_to_3ch_numpy

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libdepthops.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    sig = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ]
    lib.depth_to_3ch.argtypes = sig
    lib.depth_to_3ch.restype = None
    # the baked variant landed in r5: older .so builds may lack it
    if hasattr(lib, "depth_to_3ch_bake"):
        lib.depth_to_3ch_bake.argtypes = sig
        lib.depth_to_3ch_bake.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def depth_to_3ch_native(depth: np.ndarray,
                        imagenet_bake: bool = False) -> np.ndarray:
    """uint8 [H, W, 3] Prewitt encoding; native when built, numpy otherwise.

    ``imagenet_bake=True`` additionally applies the reference's eval-path
    ImageNet bake (`evaluate_onevision.py:279-288`) in the same native
    pass — the evaluator's host hot loop (bench.py --mode eval_loop)."""
    lib = _load()
    fn_name = "depth_to_3ch_bake" if imagenet_bake else "depth_to_3ch"
    if lib is None or not hasattr(lib, fn_name):
        return depth_to_3ch_numpy(depth, imagenet_bake=imagenet_bake)
    h, w = depth.shape
    src = np.ascontiguousarray(depth, dtype=np.float32)
    out = np.empty((h, w, 3), dtype=np.uint8)
    scratch = np.empty(4 * h * w, dtype=np.float32)
    getattr(lib, fn_name)(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h), ctypes.c_int(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
