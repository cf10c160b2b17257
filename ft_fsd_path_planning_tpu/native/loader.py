"""ctypes binding for the native replay loader, with lazy self-build.

The C++ loader parses session JSON logs directly into the packed fixed-shape
frame tensors (no Python-object churn). The shared library is built on first
use with the system toolchain and cached next to the source; a pure-Python
fallback keeps the framework importable without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import json
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "replay_loader.cpp"
_LIB = _DIR / "libreplay_loader.so"
_STAMP = _DIR / "libreplay_loader.hash"

_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        # Content-hash staleness check: mtimes are unreliable after a git
        # checkout, so a stamp file records the source hash the cached
        # library was built from.
        src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()
        stale = (
            not _LIB.exists()
            or not _STAMP.exists()
            or _STAMP.read_text().strip() != src_hash
        )
        if stale:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_LIB)],
                check=True,
                capture_output=True,
            )
            _STAMP.write_text(src_hash)
        lib = ctypes.CDLL(str(_LIB))
        lib.rl_load_session.restype = ctypes.c_int
        lib.rl_load_session.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _load_python(path: str, n_max: int, max_frames: int):
    """Pure-Python fallback with identical output layout."""
    data = json.loads(Path(path).read_text())[:max_frames]
    t = len(data)
    cones = np.zeros((t, n_max, 3), np.float32)
    cones[:, :, 2] = -1.0
    mask = np.zeros((t, n_max), np.uint8)
    positions = np.zeros((t, 2), np.float32)
    directions = np.zeros((t, 2), np.float32)
    for i, frame in enumerate(data):
        positions[i] = frame["car_position"][:2]
        directions[i] = frame["car_direction"][:2]
        slot = 0
        for cone_type, lst in enumerate(frame["slam_cones"]):
            arr = np.asarray(lst, np.float32).reshape(-1, 2)
            for p in arr:
                if slot >= n_max:
                    break
                cones[i, slot, :2] = p
                cones[i, slot, 2] = cone_type
                mask[i, slot] = 1
                slot += 1
    return cones, mask, positions, directions


def load_session(path: str, n_max: int = 128, max_frames: int = 4096):
    """Load a recorded session into packed frame tensors.

    Returns (cones (T, N, 3) f32, mask (T, N) u8, positions (T, 2),
    directions (T, 2)).
    """
    lib = _get_lib()
    if lib is None:
        return _load_python(path, n_max, max_frames)

    cones = np.zeros((max_frames, n_max, 3), np.float32)
    mask = np.zeros((max_frames, n_max), np.uint8)
    positions = np.zeros((max_frames, 2), np.float32)
    directions = np.zeros((max_frames, 2), np.float32)
    t = lib.rl_load_session(
        str(path).encode(),
        n_max,
        max_frames,
        cones.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        directions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if t < 0:
        return _load_python(path, n_max, max_frames)
    return cones[:t], mask[:t], positions[:t], directions[:t]
