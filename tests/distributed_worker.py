"""One process of the 2-process CPU multi-host test.

Run as: python -m tests.distributed_worker <process_id> <num_processes> <port>
<outdir>. Each process owns 4 virtual CPU devices; the cluster forms a
global 8-device mesh over Gloo and each process feeds only its local rows
of the frame batch (per-host shard loading).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
_CACHE_DIR = str(Path(__file__).resolve().parent.parent / ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ft_fsd_path_planning_tpu.parallel.batch import sharded_batched_step  # noqa: E402
from ft_fsd_path_planning_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    host_local_slice,
    initialize_distributed,
    make_global_batch,
    make_global_state,
)
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch  # noqa: E402

GLOBAL_BATCH = 8

initialize_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

import __graft_entry__  # noqa: E402  (repo root on sys.path via cwd)

cfg = __graft_entry__._tiny_config()
mesh = global_mesh()

# deterministic global workload; this process materializes ONLY its rows
frames_full = jax.tree.map(np.asarray, make_frame_batch(cfg, GLOBAL_BATCH, seed=0))
lo, hi = host_local_slice(GLOBAL_BATCH)
local_frames = jax.tree.map(lambda x: x[lo:hi], frames_full)

gframes = make_global_batch(mesh, local_frames, GLOBAL_BATCH)
gstates = make_global_state(cfg, mesh, GLOBAL_BATCH)

step = sharded_batched_step(cfg, mesh)
outs, _, metrics = step(gstates, gframes)

# save this process's shard rows (sorted by global row index)
shards = sorted(outs.path.addressable_shards, key=lambda s: s.index[0].start or 0)
rows = np.concatenate([np.asarray(s.data) for s in shards])
np.save(outdir / f"paths_{pid}.npy", rows)
(outdir / f"metrics_{pid}.json").write_text(
    json.dumps({
        "lo": lo,
        "hi": hi,
        "n_frames": float(metrics.n_frames),
        "mean_path_length": float(metrics.mean_path_length),
        "mean_abs_curvature": float(metrics.mean_abs_curvature),
    })
)
print(f"[{pid}] ok", flush=True)
