"""Build + load the native host ops (g++ -> shared object, ctypes).

The JIT-compile-on-import pattern mirrors the reference's
torch.utils.cpp_extension.load (ref score_sde/op/upfirdn2d.py:18-24) but
without torch: one g++ invocation, cached by source mtime, loaded via
ctypes. Degrades gracefully (native_available() == False) if no compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_SRC_DIR, "upfirdn2d.cc")
_SO = os.path.join(_SRC_DIR, "libdiffpure_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_SO)


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if _needs_build():
            _build()
        lib = ctypes.CDLL(_SO)
        c_float_p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        f32 = ctypes.c_float
        lib.upfirdn2d_f32.argtypes = [c_float_p, c_float_p, c_float_p,
                                      i64, i64, i64, i64, i64, i64,
                                      i64, i64, i64, i64]
        lib.upfirdn2d_f32.restype = None
        lib.fused_bias_act_f32.argtypes = [c_float_p, c_float_p, c_float_p,
                                           i64, i64, f32, f32]
        lib.fused_bias_act_f32.restype = None
        lib.fused_bias_act_grad_f32.argtypes = [c_float_p, c_float_p,
                                                c_float_p, c_float_p,
                                                i64, i64, f32, f32]
        lib.fused_bias_act_grad_f32.restype = None
        _lib = lib
    except Exception as e:  # no compiler / build failure -> python fallback
        print(f"[diffpure_tpu] native ops unavailable: {e}", file=sys.stderr)
        _lib = None
    return _lib


def native_available() -> bool:
    return load_native() is not None
