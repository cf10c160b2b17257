"""Native C++ replay loader vs the pure-Python reference loader."""

from pathlib import Path

import numpy as np
import pytest

from ft_fsd_path_planning_tpu.native import loader

SKIDPAD_JSON = Path("/root/reference/fsd_path_planning/demo/skidpad.json")


@pytest.mark.skipif(not SKIDPAD_JSON.exists(), reason="replay log missing")
def test_native_matches_python():
    lib = loader._get_lib()
    assert lib is not None, "native loader failed to build"

    native = loader.load_session(SKIDPAD_JSON, n_max=64, max_frames=400)
    python = loader._load_python(SKIDPAD_JSON, n_max=64, max_frames=400)

    assert native[0].shape == python[0].shape
    for a, b in zip(native, python):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.skipif(not SKIDPAD_JSON.exists(), reason="replay log missing")
def test_native_loader_speed():
    import time

    lib = loader._get_lib()
    assert lib is not None

    t0 = time.perf_counter()
    loader.load_session(SKIDPAD_JSON, n_max=64, max_frames=400)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    loader._load_python(SKIDPAD_JSON, n_max=64, max_frames=400)
    python_t = time.perf_counter() - t0
    # the native path should never be slower
    assert native_t < python_t, (native_t, python_t)
