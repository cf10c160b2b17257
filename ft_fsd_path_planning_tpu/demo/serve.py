"""Live-parameter exploration server — the reference's interactive streamlit
pages without streamlit.

The reference lets a user pick curated scenarios, edit planner parameters,
and paste custom frame JSON, re-running the pipeline live
(`streamlit_main.py:83-88`, `demo/streamlit_demo/common.py:304-324`).
Streamlit is not in this image, so this module serves the same capability
from the standard library: a single-page app (vanilla JS + SVG) backed by a
tiny HTTP endpoint that runs the REAL planner on every request.

Run:  python -m ft_fsd_path_planning_tpu.demo.serve [--port 8008]
Then open http://localhost:8008/ — pick a scenario or paste frame JSON
(reference schema: {car_position, car_direction, slam_cones}), tweak the
config fields, and Plan. The first plan per (mission, budget, beam, ...)
combination compiles the pipeline (tens of seconds; cached in-process and in
the persistent compile cache after that); later plans run in milliseconds.

Endpoints:
  GET  /            the explorer page
  GET  /scenarios   curated fixture list (demo/scenarios.py)
  POST /plan        {"config": {...}, "frames": [frame, ...]} ->
                    {"paths": [[...]], "intermediates": {...}, "timing_ms": ...}
"""

from __future__ import annotations

import json
import math
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner
from ft_fsd_path_planning_tpu.config import (
    PathConfig,
    ShapeBudget,
    SortingConfig,
    default_config,
)
from ft_fsd_path_planning_tpu.demo import scenarios

SCENARIOS = {
    "straight": scenarios.straight,
    "simple_corner": scenarios.simple_corner,
    "corner_missing_blue": scenarios.corner_missing_blue,
    "corner_missing_yellow": scenarios.corner_missing_yellow,
    "hairpin": scenarios.hairpin,
    "hairpin_extreme": scenarios.hairpin_extreme,
    "colorless_straight": scenarios.colorless_straight,
    "noisy_corner": scenarios.noisy_corner,
}

# editable knobs -> where they live in the config tree
_KNOBS = {
    "mission": ("trackdrive", "mission preset (trackdrive/skidpad/acceleration)"),
    "n_cones": (128, "cone shape budget (static: changing recompiles)"),
    "beam_width": (32, "beam K replacing the reference's exhaustive DFS"),
    "max_length": (12, "max cones per sorted side config"),
    "max_dist": (6.5, "adjacency edge cutoff [m]"),
    "threshold_directional_angle_deg": (40.0, "directional angle gate [deg]"),
    "threshold_absolute_angle_deg": (65.0, "absolute angle gate [deg]"),
    "smoothing": (0.2, "FITPACK smoothing s for the centerline fit"),
    "mpc_path_length": (20.0, "MPC horizon length [m]"),
    "experimental_performance_improvements": (False, "sorting-result cache"),
}


def _build_config(overrides: dict):
    mission = MissionTypes[overrides.get("mission", "trackdrive")]
    sorting = SortingConfig(
        beam_width=int(overrides.get("beam_width", 32)),
        max_length=int(overrides.get("max_length", 12)),
        max_dist=float(overrides.get("max_dist", 6.5)),
        threshold_directional_angle=math.radians(
            float(overrides.get("threshold_directional_angle_deg", 40.0))
        ),
        threshold_absolute_angle=math.radians(
            float(overrides.get("threshold_absolute_angle_deg", 65.0))
        ),
    )
    path = PathConfig(
        smoothing=float(overrides.get("smoothing", 0.2)),
        mpc_path_length=float(overrides.get("mpc_path_length", 20.0)),
    )
    # config_len must track max_length (side configs hold max_length cones)
    shapes_kw = {"config_len": int(overrides.get("max_length", 12))}
    cfg = default_config(
        mission,
        experimental_performance_improvements=bool(
            overrides.get("experimental_performance_improvements", False)
        ),
        n_cones=int(overrides.get("n_cones", 128)),
        sorting=sorting,
        path=path,
    )
    if cfg.shapes.config_len != shapes_kw["config_len"]:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, shapes=dataclasses.replace(cfg.shapes, **shapes_kw)
        )
    return cfg


_PLANNERS: dict = {}
_PLAN_LOCK = __import__("threading").Lock()


def _plan(payload: dict) -> dict:
    overrides = payload.get("config", {})
    cfg = _build_config(overrides)
    key = cfg
    planner = _PLANNERS.get(key)
    if planner is None:
        # fresh planner per config — stateful missions need their own state
        planner = PathPlanner(cfg.mission, config=cfg)
        _PLANNERS[key] = planner

    frames = payload.get("frames", [])
    out_paths, inter = [], []
    t0 = time.perf_counter()
    for frame in frames:
        cones = [np.array(c, float).reshape(-1, 2) for c in frame["slam_cones"]]
        res = planner.calculate_path_in_global_frame(
            cones,
            np.array(frame["car_position"], float),
            np.array(frame["car_direction"], float),
            return_intermediate_results=True,
        )
        path, sl, sr, lv, rv, _, _ = res
        out_paths.append(np.round(path, 4).tolist())
        inter.append(
            {
                "sorted_left": np.round(sl, 3).tolist(),
                "sorted_right": np.round(sr, 3).tolist(),
                "left_with_virtual": np.round(lv, 3).tolist(),
                "right_with_virtual": np.round(rv, 3).tolist(),
            }
        )
    dt = (time.perf_counter() - t0) * 1e3
    return {"paths": out_paths, "intermediates": inter, "timing_ms": round(dt, 1)}


def _scenario_payload() -> dict:
    out = {}
    for name, fn in SCENARIOS.items():
        cones, pos, direction = fn()
        out[name] = {
            "car_position": np.asarray(pos, float).tolist(),
            "car_direction": np.asarray(direction, float).tolist(),
            "slam_cones": [np.asarray(c, float).tolist() for c in cones],
        }
    return out


_PAGE = Path(__file__).parent / "explore.html"


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path in ("/", "/index.html"):
            self._send(200, _PAGE_BYTES, "text/html; charset=utf-8")
        elif self.path == "/scenarios":
            body = json.dumps(
                {"scenarios": _scenario_payload(), "knobs": _KNOBS}
            ).encode()
            self._send(200, body, "application/json")
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):  # noqa: N802
        if self.path != "/plan":
            self._send(404, b"not found", "text/plain")
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n))
            with _PLAN_LOCK:  # planners are stateful; jax dispatch single-file
                result = _plan(payload)
            self._send(200, json.dumps(result).encode(), "application/json")
        except Exception:
            self._send(
                500,
                json.dumps({"error": traceback.format_exc()}).encode(),
                "application/json",
            )

    def log_message(self, fmt, *args):  # quiet
        pass


def main() -> None:
    import argparse

    global _PAGE_BYTES
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    args = parser.parse_args()
    _PAGE_BYTES = _PAGE.read_bytes()

    server = ThreadingHTTPServer((args.host, args.port), _Handler)
    print(f"explorer at http://{args.host}:{args.port}/  (ctrl-c to stop)")
    server.serve_forever()


_PAGE_BYTES = b""

if __name__ == "__main__":
    main()
