"""CLI replay demo — the reference `python -m fsd_path_planning.demo`
equivalent (demo/json_demo.py): replays a recorded session JSON through the
planner, reports per-frame timing, optionally saves an animation.

Usage:
    python -m ft_fsd_path_planning_tpu.demo DATA.json [--mission skidpad]
        [--remove-color-info] [--output-path anim.mp4] [--max-frames N]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes


def select_mission_by_filename(name: str) -> MissionTypes:
    """Reference json_demo.py:38-51."""
    lowered = name.lower()
    if "accel" in lowered:
        return MissionTypes.acceleration
    if "skidpad" in lowered:
        return MissionTypes.skidpad
    return MissionTypes.trackdrive


def load_data_json(data_path: Path, remove_color_info: bool = False):
    import json

    data = json.loads(data_path.read_text())
    positions = np.array([d["car_position"] for d in data])
    directions = np.array([d["car_direction"] for d in data])
    cone_observations = [
        [np.array(c).reshape(-1, 2) for c in d["slam_cones"]] for d in data
    ]
    if remove_color_info:
        stripped = []
        for cones in cone_observations:
            new_obs = [np.zeros((0, 2)) for _ in range(5)]
            if any(len(c) for c in cones):
                new_obs[ConeTypes.UNKNOWN] = np.vstack(
                    [c.reshape(-1, 2) for c in cones]
                )
            stripped.append(new_obs)
        cone_observations = stripped
    return positions, directions, cone_observations


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_path", type=Path)
    parser.add_argument("--mission", type=str, default=None)
    parser.add_argument("--remove-color-info", action="store_true")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--output-path", type=Path, default=None)
    args = parser.parse_args()

    mission = (
        MissionTypes[args.mission]
        if args.mission
        else select_mission_by_filename(args.data_path.name)
    )
    print(f"mission: {mission.name}")

    positions, directions, cone_observations = load_data_json(
        args.data_path, remove_color_info=args.remove_color_info
    )
    if args.max_frames:
        positions = positions[: args.max_frames]
        directions = directions[: args.max_frames]
        cone_observations = cone_observations[: args.max_frames]

    planner = PathPlanner(mission)

    # warmup / compile (reference json_demo.py:88-94)
    t0 = time.perf_counter()
    planner.calculate_path_in_global_frame(
        cone_observations[0], positions[0], directions[0]
    )
    print(f"compile + first frame: {time.perf_counter() - t0:.1f} s")

    results = []
    timings = []
    for i, (cones, pos, direction) in enumerate(
        zip(cone_observations, positions, directions)
    ):
        t0 = time.perf_counter()
        out = planner.calculate_path_in_global_frame(cones, pos, direction)
        dt = time.perf_counter() - t0
        timings.append(dt)
        results.append(out)
        if dt > 0.1:
            print(f"frame {i}: {dt * 1000:.1f} ms (outlier)")

    timings_arr = np.array(timings[1:]) * 1000
    print(
        f"frames: {len(timings)}  mean: {timings_arr.mean():.2f} ms  "
        f"p50: {np.percentile(timings_arr, 50):.2f} ms  "
        f"p99: {np.percentile(timings_arr, 99):.2f} ms"
    )

    if args.output_path is not None:
        _save_animation(args.output_path, results, positions, cone_observations)


def _save_animation(path: Path, results, positions, cone_observations) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.animation import ArtistAnimation
    except ImportError:
        print("matplotlib unavailable; skipping animation")
        return

    fig, ax = plt.subplots(figsize=(8, 8))
    artists = []
    for out, pos, cones in zip(results, positions, cone_observations):
        frame_artists = []
        for cone_type, color in ((ConeTypes.LEFT, "b"), (ConeTypes.RIGHT, "gold"), (ConeTypes.UNKNOWN, "gray")):
            pts = cones[cone_type]
            if len(pts):
                frame_artists.extend(ax.plot(pts[:, 0], pts[:, 1], ".", color=color))
        frame_artists.extend(ax.plot(out[:, 1], out[:, 2], "-r"))
        frame_artists.extend(ax.plot([pos[0]], [pos[1]], "ks"))
        artists.append(frame_artists)
    ax.set_aspect("equal")
    anim = ArtistAnimation(fig, artists, interval=100)
    anim.save(str(path), fps=10)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
