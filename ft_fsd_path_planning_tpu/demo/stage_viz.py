"""Per-stage pipeline visualization — the reference's streamlit debug pages
(`demo/streamlit_demo/{cone_sorting,cone_matching,path_calculation}.py`) as a
headless matplotlib renderer (streamlit is not a dependency of this image).

Renders one figure with four panels for a named scenario:
  1. input cones + k-NN adjacency graph (sorting's search space)
  2. beam-search result: per-side winning configurations, candidate-pool
     costs, and per-config self-intersection counts
  3. cone matching: matches and synthesized virtual cones
  4. final MPC path colored by curvature

Usage:
    python -m ft_fsd_path_planning_tpu.demo.stage_viz hairpin -o /tmp/hairpin.png
    python -m ft_fsd_path_planning_tpu.demo.stage_viz --list
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner
from ft_fsd_path_planning_tpu.demo.scenarios import ALL_SCENARIOS
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.models.facade import flatten_cones_by_type
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes

_SIDE_COLOR = {ConeTypes.LEFT: "tab:blue", ConeTypes.RIGHT: "goldenrod"}


def render(name: str, out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cones, pos, direction = ALL_SCENARIOS[name]()
    planner = PathPlanner(MissionTypes.trackdrive)
    (path, sorted_l, sorted_r, left_v, right_v, l2r, r2l) = (
        planner.calculate_path_in_global_frame(
            cones, pos, direction, return_intermediate_results=True
        )
    )

    cfg = planner.cfg
    pts, mask = flatten_cones_by_type(cones, cfg.shapes.n_cones)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    pos_j = jnp.asarray(pos, jnp.float32)
    dir_j = jnp.asarray(direction, jnp.float32)

    fig, axes = plt.subplots(2, 2, figsize=(15, 13))
    for ax in axes.ravel():
        ax.set_aspect("equal")
        for ct in (ConeTypes.LEFT, ConeTypes.RIGHT, ConeTypes.UNKNOWN):
            arr = np.asarray(cones[ct]).reshape(-1, 2)
            if len(arr):
                ax.plot(arr[:, 0], arr[:, 1], ".",
                        color=_SIDE_COLOR.get(ct, "gray"), ms=8)
        ax.plot([pos[0]], [pos[1]], "ks", ms=9)
        ax.annotate("", xy=pos[:2] + direction[:2] * 2.5, xytext=pos[:2],
                    arrowprops=dict(arrowstyle="->", color="k"))

    # --- panel 1: adjacency graph
    ax = axes[0, 0]
    ax.set_title("1. k-NN adjacency (sorting search space)")
    for ct in (ConeTypes.LEFT, ConeTypes.RIGHT):
        prefix, _ = sorting.select_starting_cones(
            cfg.sorting, pts_j, mask_j, int(ct), pos_j, dir_j
        )
        adj, _, _ = sorting.build_adjacency(
            cfg.sorting, pts_j, mask_j, int(ct), prefix[0]
        )
        adj = np.asarray(adj)
        xy = pts[:, :2]
        for i, j in zip(*np.nonzero(np.triu(adj))):
            ax.plot(xy[[i, j], 0], xy[[i, j], 1], "-",
                    color=_SIDE_COLOR[ct], lw=0.6, alpha=0.5)

    # --- panel 2: beam search results + pool stats
    ax = axes[0, 1]
    ax.set_title("2. beam search: winners + pool")
    info = []
    for ct in (ConeTypes.LEFT, ConeTypes.RIGHT):
        res = sorting.sort_one_side(cfg, pts_j, mask_j, int(ct), pos_j, dir_j)
        configs = np.asarray(res.configs)
        valid = np.asarray(res.valid)
        costs = np.asarray(res.costs)
        xy = pts[:, :2]
        # runner-up configs, faint
        order = np.argsort(costs)
        for k in order[1:6]:
            if not valid[k]:
                continue
            seq = configs[k][configs[k] >= 0]
            ax.plot(xy[seq, 0], xy[seq, 1], "--", color=_SIDE_COLOR[ct],
                    lw=0.8, alpha=0.35)
        best = np.asarray(res.best)
        seq = best[best >= 0]
        if len(seq):
            ax.plot(xy[seq, 0], xy[seq, 1], "-", color=_SIDE_COLOR[ct], lw=2.2)
        # self-intersection counts over the pool (reference debug metric)
        cfg_pts = xy[np.clip(configs, 0, len(xy) - 1)]
        cfg_mask = (configs >= 0) & valid[:, None]
        crossings = np.asarray(
            geo.polyline_self_intersections(
                jnp.asarray(cfg_pts, jnp.float32), jnp.asarray(cfg_mask)
            )
        )
        n_valid = int(valid.sum())
        info.append(
            f"{ConeTypes(ct).name}: pool={n_valid}  "
            f"best cost={costs[order[0]]:.3f}  "
            f"self-crossings(best)={crossings[order[0]]}"
        )
    ax.text(0.02, 0.02, "\n".join(info), transform=ax.transAxes,
            fontsize=9, va="bottom",
            bbox=dict(boxstyle="round", fc="w", alpha=0.8))

    # --- panel 3: matching
    ax = axes[1, 0]
    ax.set_title("3. matching: pairs + virtual cones")
    for side_pts, matches, other_pts, color in (
        (left_v, l2r, right_v, "tab:blue"),
        (right_v, r2l, left_v, "goldenrod"),
    ):
        if len(side_pts):
            ax.plot(side_pts[:, 0], side_pts[:, 1], "o", mfc="none",
                    color=color, ms=10)
        for i, m in enumerate(np.asarray(matches)):
            if m >= 0 and i < len(side_pts) and m < len(other_pts):
                ax.plot([side_pts[i, 0], other_pts[m, 0]],
                        [side_pts[i, 1], other_pts[m, 1]],
                        "-", color="gray", lw=0.7, alpha=0.6)

    # --- panel 4: final path + curvature
    ax = axes[1, 1]
    ax.set_title("4. MPC path (colored by curvature)")
    sc = ax.scatter(path[:, 1], path[:, 2], c=path[:, 3], cmap="coolwarm",
                    s=22, vmin=-0.2, vmax=0.2)
    fig.colorbar(sc, ax=ax, label="curvature [1/m]", shrink=0.8)
    if len(sorted_l):
        ax.plot(sorted_l[:, 0], sorted_l[:, 1], "-", color="tab:blue", lw=1, alpha=0.5)
    if len(sorted_r):
        ax.plot(sorted_r[:, 0], sorted_r[:, 1], "-", color="goldenrod", lw=1, alpha=0.5)

    fig.suptitle(f"scenario: {name}", fontsize=14)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"saved {out_path}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("scenario", nargs="?", default="simple_corner")
    parser.add_argument("-o", "--output", default="stage_viz.png")
    parser.add_argument("--list", action="store_true")
    parser.add_argument(
        "--device", default="cpu",
        help="debug renders default to CPU: they compile several one-off "
        "programs, which is seconds on host but minutes on a remote chip",
    )
    args = parser.parse_args()
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.list:
        print("\n".join(sorted(ALL_SCENARIOS)))
        return
    render(args.scenario, args.output)


if __name__ == "__main__":
    main()
