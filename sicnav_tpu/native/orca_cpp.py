"""ctypes bridge to the native C++ ORCA engine (orca_native.cpp).

Builds the shared library on first use (g++ -O3 -march=native) and caches it
next to the source — the analog of the reference's generated-solver cache
keyed by content hash (campc_acados_opt.py:51-57).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "orca_native.cpp")
_LIB = None
_BUILD_FAILED = False


def _build_lib():
    with open(_SRC, "rb") as f:
        tag = hashlib.md5(f.read()).hexdigest()[:12]
    out = os.path.join(os.path.dirname(_SRC), f"_orca_native_{tag}.so")
    if not os.path.exists(out):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out],
            check=True, capture_output=True)
    return out


def _get_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is None and not _BUILD_FAILED:
        try:
            lib = ctypes.CDLL(_build_lib())
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.orca_step.argtypes = [
                f32p, f32p, f32p, f32p, f32p, ctypes.c_int,
                f32p, ctypes.c_int,
                ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, f32p]
            lib.orca_step.restype = None
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def orca_step_native(pos, vel, rad, pref_vel, max_speed, walls=None,
                     neighbor_dist=10.0, max_neighbors=10, time_horizon=2.0,
                     time_horizon_obst=0.5, dt=0.25):
    """New ORCA velocities for all agents at once.

    pos, vel, pref_vel: (N, 2); rad, max_speed: (N,);
    walls: (W, 2, 2) or None. Returns (N, 2) float32.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native ORCA library unavailable")
    pos = np.ascontiguousarray(pos, np.float32)
    vel = np.ascontiguousarray(vel, np.float32)
    rad = np.ascontiguousarray(rad, np.float32)
    pref_vel = np.ascontiguousarray(pref_vel, np.float32)
    max_speed = np.ascontiguousarray(max_speed, np.float32)
    n = pos.shape[0]
    if walls is None or len(walls) == 0:
        walls_arr = np.zeros((0, 4), np.float32)
    else:
        walls_arr = np.ascontiguousarray(
            np.asarray(walls, np.float32).reshape(-1, 4))
    out = np.zeros((n, 2), np.float32)
    lib.orca_step(pos, vel, rad, pref_vel, max_speed, n,
                  walls_arr, walls_arr.shape[0],
                  np.float32(neighbor_dist), max_neighbors,
                  np.float32(time_horizon), np.float32(time_horizon_obst),
                  np.float32(dt), out)
    return out
