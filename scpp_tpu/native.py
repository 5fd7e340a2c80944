"""ctypes bindings for the native runtime library (native/).

Native components (C++, built with ``make -C native``):
  - ``scpp_simulate``: adaptive embedded-RK integrator with independent
    C++ flow maps — the golden-trajectory oracle replacing the
    unbuildable reference binary (SURVEY §6 baseline procedure),
  - ``scpp_parse_info``: INFO config parser (native counterpart of the
    reference's Boost ParameterServer).

All callers degrade gracefully when the shared library is absent
(``native_available() == False``); the Python implementations are the
functional fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "build_native", "simulate_native",
           "parse_info_native", "MODEL_IDS"]

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libscpp_native.so")

MODEL_IDS = {"Rocket2D": 0, "RocketQuat": 1, "RocketEuler": 2}

_lib = None


def build_native() -> bool:
    """Build the shared library if a toolchain is available."""
    try:
        subprocess.run(["make", "-C", _LIB_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.scpp_simulate.restype = ctypes.c_int
    lib.scpp_simulate.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.scpp_parse_info.restype = ctypes.c_long
    lib.scpp_parse_info.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_long]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def simulate_native(model_name: str, par, x0, u0, u1, dt,
                    rtol: float = 1e-12, atol: float = 1e-12):
    """High-accuracy adaptive integration of one control interval via the
    C++ oracle. Returns (x_final, n_steps)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    model_id = MODEL_IDS[model_name]
    par = np.ascontiguousarray(par, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    u0 = np.ascontiguousarray(u0, np.float64)
    u1 = np.ascontiguousarray(u1, np.float64)
    x_out = np.zeros_like(x0)
    n_steps = ctypes.c_long(0)
    rc = lib.scpp_simulate(model_id, par, x0, u0, u1, float(dt),
                           float(rtol), float(atol), x_out,
                           ctypes.byref(n_steps))
    if rc != 0:
        raise RuntimeError(f"native integration failed (rc={rc})")
    return x_out, int(n_steps.value)


def parse_info_native(path: str) -> dict:
    """Parse an INFO file via the native parser into a flat dict of
    dotted-path keys."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nbytes = lib.scpp_parse_info(path.encode(), None, 0)
    if nbytes < 0:
        raise ValueError(f"failed to parse {path}")
    buf = ctypes.create_string_buffer(nbytes + 1)
    lib.scpp_parse_info(path.encode(), buf, nbytes + 1)
    out = {}
    for line in buf.value.decode().splitlines():
        key, _, value = line.partition("=")
        out[key] = value
    return out
