"""Generate the trackdrive golden-replay file: the reference planner's paths
over the committed 300-frame closed-track session.

The reference's de-facto integration test is replaying multi-lap logs through
the full stateful planner (reference demo/json_demo.py:103-131). The FSG/FSS
logs are stripped from this mount, so the committed session
(``demo/closed_track_session.json``, 2 laps, per-frame SLAM jitter) is the
replay workload; this tool runs it through the REFERENCE implementation once
— both with and without ``experimental_performance_improvements`` — and
commits the resulting paths as the parity target for
``tests/test_trackdrive_replay.py`` and the ``bench.py`` replay block.

Run from the repo root: ``python tools/make_trackdrive_golden.py``.
Requires the reference mount at /root/reference (numba shimmed to identity).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.reference_oracle import load_reference  # noqa: E402

SESSION = Path("ft_fsd_path_planning_tpu/demo/closed_track_session.json")
OUT = Path("ft_fsd_path_planning_tpu/demo/trackdrive_golden.npz")


def replay_reference(frames, performance_improvements: bool):
    ref = load_reference()
    planner = ref.PathPlanner(
        ref.MissionTypes.trackdrive,
        experimental_performance_improvements=performance_improvements,
    )
    # count reference sort-cache hits (per side) by wrapping the similarity
    # check — core_trace_sorter.py:218-250 returns True exactly on a hit
    sorter = planner.cone_sorting.trace_sorter
    orig = sorter.input_is_very_similar_to_previous_input
    hits = []

    def counting(*args, **kwargs):
        result = orig(*args, **kwargs)
        hits.append(bool(result))
        return result

    sorter.input_is_very_similar_to_previous_input = counting

    paths = []
    for frame in frames:
        cones = [np.array(c, np.float64).reshape(-1, 2) for c in frame["slam_cones"]]
        out = planner.calculate_path_in_global_frame(
            cones,
            np.array(frame["car_position"], np.float64),
            np.array(frame["car_direction"], np.float64),
        )
        paths.append(np.asarray(out, np.float32))
    return np.stack(paths), int(sum(hits)), len(hits)


def main() -> None:
    raw = SESSION.read_bytes()
    frames = json.loads(raw)
    session_sha = hashlib.sha256(raw).hexdigest()

    plain, _, _ = replay_reference(frames, performance_improvements=False)
    cached, n_hits, n_checks = replay_reference(frames, performance_improvements=True)

    flag_dev = np.abs(plain[:, :, 1:3] - cached[:, :, 1:3]).max()
    np.savez_compressed(
        OUT,
        paths_plain=plain,
        paths_cached=cached,
        session_sha256=np.frombuffer(bytes.fromhex(session_sha), np.uint8),
        ref_cache_hits=np.array([n_hits, n_checks]),
    )
    print(
        f"wrote {OUT} ({OUT.stat().st_size / 1024:.0f} KiB): "
        f"{len(plain)} frames, reference per-side cache hits "
        f"{n_hits}/{n_checks}, max flag-on/off path delta {flag_dev:.4f} m"
    )


if __name__ == "__main__":
    main()
