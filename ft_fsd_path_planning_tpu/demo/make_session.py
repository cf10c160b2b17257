"""Generate the self-contained recorded-session JSON shipped under demo/.

The reference ships recorded real-session logs (`demo/skidpad.json`, plus
FSG/FSS blobs stripped from this mount) as its de-facto integration and
benchmark workload (reference demo/json_demo.py:103-131, schema :260-264).
This repo ships a self-generated closed-track session in the exact same
schema so the CLI demo, the native C++ loader, and the replay benchmark run
without the reference mount: a smooth random closed loop (the
`closed_track_scenario` generator), the car driving ``N_LAPS`` laps, the
whole SLAM map visible every frame with per-frame observation noise.

Regenerate with ``python -m ft_fsd_path_planning_tpu.demo.make_session``.
The generator is deterministic (SEED below); the benchmark re-derives the
ground-truth centerline from the same seed to score replay deviation.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ft_fsd_path_planning_tpu.parallel.scenarios import closed_track_scenario

SEED = 3
N_LAPS = 2
FRAMES_PER_LAP = 150
OBS_NOISE = 0.02  # per-frame SLAM jitter (m)
SESSION_PATH = Path(__file__).parent / "closed_track_session.json"


def ground_truth():
    """(left, right, unknown, centerline, tangents) of the session track."""
    return closed_track_scenario(seed=SEED)


def generate_session() -> list[dict]:
    left, right, unknown, cl, tangent = ground_truth()
    rng = np.random.default_rng(SEED + 1)
    n = len(cl)
    frames = []
    total = N_LAPS * FRAMES_PER_LAP
    for i in range(total):
        j = (i * n * N_LAPS) // total % n
        jitter = lambda arr: np.round(
            arr + rng.normal(0.0, OBS_NOISE, arr.shape), 4
        )
        frames.append(
            {
                "car_position": np.round(cl[j], 4).tolist(),
                "car_direction": np.round(tangent[j], 4).tolist(),
                "slam_cones": [
                    jitter(unknown).tolist(),
                    jitter(right).tolist(),  # ConeTypes.RIGHT = 1
                    jitter(left).tolist(),  # ConeTypes.LEFT = 2
                    [],
                    [],
                ],
            }
        )
    return frames


def main() -> None:
    frames = generate_session()
    SESSION_PATH.write_text(json.dumps(frames, separators=(",", ":")))
    size_kb = SESSION_PATH.stat().st_size / 1024
    print(f"wrote {SESSION_PATH} ({len(frames)} frames, {size_kb:.0f} KiB)")


if __name__ == "__main__":
    main()
