"""On-demand build + load of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and dlopen the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "lp_parser.cpp")
    out = os.path.join(here, "liblpparse.so")

    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        tmp = os.path.join(
            tempfile.gettempdir(), f"liblpparse-{os.getpid()}.so"
        )
        if not _build(src, tmp):
            return None
        try:
            os.replace(tmp, out)
        except OSError:
            out = tmp  # package dir read-only: keep the temp copy

    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None

    c_char_p = ctypes.c_char_p
    c_i32 = ctypes.c_int32
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_dp = ctypes.POINTER(ctypes.c_double)
    void_p = ctypes.c_void_p

    lib.lp_parse_file.restype = void_p
    lib.lp_parse_file.argtypes = [c_char_p]
    lib.lp_parse_buffer.restype = void_p
    lib.lp_parse_buffer.argtypes = [c_char_p, ctypes.c_size_t]
    lib.lp_error.restype = c_char_p
    lib.lp_error.argtypes = [void_p]
    for name in ("lp_maximize", "lp_n_vars", "lp_n_obj", "lp_n_quad",
                 "lp_n_cst", "lp_n_elements"):
        fn = getattr(lib, name)
        fn.restype = c_i32
        fn.argtypes = [void_p]
    lib.lp_obj_constant.restype = ctypes.c_double
    lib.lp_obj_constant.argtypes = [void_p]
    for name in ("lp_var_names", "lp_cst_labels"):
        fn = getattr(lib, name)
        fn.restype = c_char_p
        fn.argtypes = [void_p]
    for name in ("lp_var_min", "lp_var_max", "lp_var_type", "lp_obj_idx",
                 "lp_qa", "lp_qb", "lp_cst_op", "lp_cst_rhs", "lp_cst_start",
                 "lp_el_var", "lp_el_coef"):
        fn = getattr(lib, name)
        fn.restype = c_i32p
        fn.argtypes = [void_p]
    for name in ("lp_obj_coef", "lp_qcoef"):
        fn = getattr(lib, name)
        fn.restype = c_dp
        fn.argtypes = [void_p]
    lib.lp_free.restype = None
    lib.lp_free.argtypes = [void_p]

    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None
