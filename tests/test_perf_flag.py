"""`experimental_performance_improvements` — the sorting-result cache.

The reference flag (README.md:24-27) caches the per-side sorting result and
reuses it when the cone set barely moved (core_trace_sorter.py:100-110,
189-250): ~20% per-frame speedup on stable SLAM maps. The TPU equivalent
lives at the facade boundary (models/facade.py::_step_with_sort_cache): a
host-side similarity check gates a second compiled program that skips the
beam-search sorter and reuses the cached sorted order on current positions.
"""

import numpy as np

from ft_fsd_path_planning_tpu import ConeTypes, MissionTypes, PathPlanner
from tests.reference_oracle import load_reference
from tests.test_pathing import path_parity_deviation
from tests.test_pipeline_parity import corridor_frames

ref_pkg = load_reference()


def jittered_frames(n_frames=5, jitter=0.02, seed=0):
    """Same corridor, cones wiggling a couple of cm per frame (SLAM noise) —
    the workload the reference cache exists for."""
    rng = np.random.default_rng(seed)
    base = corridor_frames(n_frames=1, curv=0.5)[0]
    cones0, _, _ = base
    frames = []
    for t in range(n_frames):
        cones = [np.zeros((0, 2)) for _ in range(5)]
        for ct in (ConeTypes.LEFT, ConeTypes.RIGHT):
            cones[ct] = cones0[ct] + rng.normal(0, jitter, cones0[ct].shape)
        frames.append((cones, np.array([t * 0.4, 0.0]), np.array([1.0, 0.0])))
    return frames


def test_cache_hits_and_output_parity_vs_uncached():
    cached = PathPlanner(
        MissionTypes.trackdrive, experimental_performance_improvements=True
    )
    plain = PathPlanner(MissionTypes.trackdrive)

    for cones, pos, direction in jittered_frames():
        out_c = cached.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        out_p = plain.calculate_path_in_global_frame(cones, pos, direction)
        # reused order on near-identical cones must land on the same path
        dev = path_parity_deviation(out_p, out_c)
        assert dev < 0.05, f"deviation {dev:.3f}"

    assert cached.sort_cache_hits >= 3, cached.sort_cache_hits
    assert plain.sort_cache_hits == 0


def test_cache_misses_on_cone_set_change():
    planner = PathPlanner(
        MissionTypes.trackdrive, experimental_performance_improvements=True
    )
    frames = jittered_frames(n_frames=2)
    cones, pos, direction = frames[0]
    planner.calculate_path_in_global_frame(cones, pos, direction)

    # a cone moved >0.1 m -> similarity fails -> full re-sort
    moved = [c.copy() for c in frames[1][0]]
    moved[ConeTypes.LEFT][3] += 0.5
    planner.calculate_path_in_global_frame(moved, frames[1][1], frames[1][2])
    assert planner.sort_cache_hits == 0

    # a cone count change -> shape mismatch -> miss
    fewer = [c.copy() for c in frames[1][0]]
    fewer[ConeTypes.RIGHT] = fewer[ConeTypes.RIGHT][:-1]
    planner.calculate_path_in_global_frame(fewer, frames[1][1], frames[1][2])
    assert planner.sort_cache_hits == 0


def test_parity_vs_reference_with_flag_enabled():
    """Both planners run with the flag ON over a jittered corridor replay —
    the cache-hit path must stay within the 5 cm parity bar."""
    ref_planner = ref_pkg.PathPlanner(
        ref_pkg.MissionTypes.trackdrive, experimental_performance_improvements=True
    )
    our_planner = PathPlanner(
        MissionTypes.trackdrive, experimental_performance_improvements=True
    )
    for cones, pos, direction in jittered_frames():
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        dev = path_parity_deviation(ref_out, our_out)
        assert dev < 0.05, f"deviation {dev:.3f}"
    assert our_planner.sort_cache_hits >= 3


def test_cache_refreshes_on_hit_under_slow_drift():
    """The reference rebuilds its cache entry from the fresh cones every
    call (core_trace_sorter.py:189-196), so similarity is frame-to-frame;
    a slow drift of 6 cm/frame (under the 0.1 m threshold per frame but
    far beyond it cumulatively) must keep hitting."""
    planner = PathPlanner(
        MissionTypes.trackdrive, experimental_performance_improvements=True
    )
    base_cones, pos, direction = corridor_frames(n_frames=1, curv=0.0)[0]
    n_frames = 6
    for t in range(n_frames):
        cones = [np.zeros((0, 2)) for _ in range(5)]
        for ct in (ConeTypes.LEFT, ConeTypes.RIGHT):
            cones[ct] = base_cones[ct] + t * 0.06  # diagonal drift
        out = planner.calculate_path_in_global_frame(
            cones, pos + t * 0.06, direction
        )
        assert np.all(np.isfinite(out))
    # frame 0 misses (cold), every drifting frame after must hit
    assert planner.sort_cache_hits == n_frames - 1, planner.sort_cache_hits
