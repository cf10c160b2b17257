"""Pallas TPU kernel: the fused beam-search hot loop of the cone sorter.

The XLA version of the search (models/sorting.py:_beam_search_side) runs
``max_length - 1`` scan steps of ~60 small ops each; on TPU every step costs
~1.5 ms of kernel-launch + latency overhead for <100 MFLOP of real work, and
the scan dominates the whole pipeline (~2/3 of the planner step).

This kernel runs the ENTIRE search loop in one pallas_call with the classic
transposed-batching layout: the batch of independent (frame x side) searches
lives in the *lane* dimension (128 per grid tile), so every step of the
sequential search is a full-width VPU op across programs and all state stays
in VMEM for the whole loop:

  * beam front expansion reads the packed per-node neighbor table with a
    one-hot contraction (no gathers);
  * all eight DFS pruning gates (end_configurations.py:109-223) are
    elementwise (K, C)-shaped math; angles use an in-kernel Cephes-style
    atan2 (Mosaic has no atan2 lowering);
  * top-K survivor selection is rank-based: rank(p) = #{q : (s_q, q) <
    (s_p, p)} via chunked pairwise comparison, then a one-hot rank-gather of
    the packed survivor features — exact, unordered-set-equivalent to the
    XLA path's top_k (which XLA lowers to a full pair sort).

Feature-row layout (shared with the XLA path, F = L + 16):
  [configs(L) | length | done | angle_sum | n_under | residual | init_cost |
   wrong_sum | last_idx | last_pos(2) | prev_pos(2) | prev2_pos(2) |
   first_pos(2)]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BIG = 1e30  # finite stand-in for +inf scores (inf would NaN in arithmetic)

# test hook: force interpret-mode execution (CPU) when no explicit flag given
INTERPRET = False

# params row layout
_P_CARX, _P_CARY, _P_DIRX, _P_DIRY, _P_SIGN, _P_TLEN = range(6)
N_PARAMS = 6


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cephes-style f32 atan2 from elementwise primitives (~1e-6 rad)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    big = jnp.maximum(ax, ay)
    small = jnp.minimum(ax, ay)
    t = small / jnp.maximum(big, 1e-30)  # in [0, 1]
    # Cephes atanf core, |u| <= tan(pi/8): 1e-8; reduce t>tan(pi/8) via
    # atan(t) = pi/4 + atan((t-1)/(t+1))
    use_red = t > 0.4142135623730950
    u = jnp.where(use_red, (t - 1.0) / (t + 1.0), t)
    z = u * u
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * u + u
    a = jnp.where(use_red, 0.25 * jnp.pi + p, p)
    a = jnp.where(ay > ax, 0.5 * jnp.pi - a, a)  # undo min/max swap
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    a = jnp.where(y < 0.0, -a, a)
    return jnp.where((ax == 0.0) & (ay == 0.0), 0.0, a)


def _angle_between(vx, vy, wx, wy):
    """Angle in [0, pi] between 2-D vectors = atan2(|cross|, dot)."""
    cross = vx * wy - vy * wx
    dot = vx * wx + vy * wy
    return _atan2(jnp.abs(cross), dot)


def _seg_intersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1, eps=1e-6):
    """Mirror of geometry.segments_intersect on coordinate components."""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    proper = ((d1 > eps) & (d2 < -eps) | (d1 < -eps) & (d2 > eps)) & (
        (d3 > eps) & (d4 < -eps) | (d3 < -eps) & (d4 > eps)
    )

    def on_seg(px, py, qx, qy, rx, ry):
        wx = (rx >= jnp.minimum(px, qx) - eps) & (rx <= jnp.maximum(px, qx) + eps)
        wy = (ry >= jnp.minimum(py, qy) - eps) & (ry <= jnp.maximum(py, qy) + eps)
        return wx & wy

    touch = (
        (jnp.abs(d1) <= eps) & on_seg(bx0, by0, bx1, by1, ax0, ay0)
        | (jnp.abs(d2) <= eps) & on_seg(bx0, by0, bx1, by1, ax1, ay1)
        | (jnp.abs(d3) <= eps) & on_seg(ax0, ay0, ax1, ay1, bx0, by0)
        | (jnp.abs(d4) <= eps) & on_seg(ax0, ay0, ax1, ay1, bx1, by1)
    )
    return proper | touch


def _beam_kernel(
    table_ref,  # (N, 4C, LANES)
    feats_ref,  # (F, K, LANES) initial state, feature-major
    alive_ref,  # (K, LANES) f32 0/1
    params_ref,  # (N_PARAMS, LANES)
    out_feats_ref,  # (F, K, LANES)
    out_alive_ref,  # (K, LANES)
    *,
    n: int,
    k: int,
    l: int,
    c: int,
    weights: tuple,
    gates: dict,
):
    f_dim = l + 16
    table = table_ref[:]
    params = params_ref[:]
    car_x, car_y = params[_P_CARX], params[_P_CARY]  # (LANES,)
    dir_x, dir_y = params[_P_DIRX], params[_P_DIRY]
    sign = params[_P_SIGN]
    target_len = params[_P_TLEN]

    # car body segment for gate 8 (sorting.py:321-328)
    dnrm = jax.lax.rsqrt(jnp.maximum(dir_x * dir_x + dir_y * dir_y, 1e-30))
    half = gates["car_size"] / 2.0
    cs_x = car_x - dir_x * dnrm * half
    cs_y = car_y - dir_y * dnrm * half
    ce_x = car_x + dir_x * dnrm * gates["car_size"]
    ce_y = car_y + dir_y * dnrm * gates["car_size"]

    w0, w1, w2, w3, w6 = weights

    def step(_, carry):
        feats, alive = carry  # (F, K, LANES), (K, LANES)

        configs = [feats[j] for j in range(l)]  # each (K, LANES)
        lengths = feats[l]
        done = feats[l + 1] > 0.5
        angle_sum = feats[l + 2]
        n_under = feats[l + 3]
        residual = feats[l + 4]
        init_cost = feats[l + 5]
        wrong_sum = feats[l + 6]
        last_idx = feats[l + 7]
        last_x, last_y = feats[l + 8], feats[l + 9]
        prev_x, prev_y = feats[l + 10], feats[l + 11]
        prev2_x, prev2_y = feats[l + 12], feats[l + 13]
        first_x, first_y = feats[l + 14], feats[l + 15]

        # ---- expansion: one-hot contraction against the node table,
        # chunked over N to bound the live (K, chunk, LANES) buffers
        nchunk = 32
        cand_idx = [jnp.zeros((k, LANES), jnp.float32) for _ in range(c)]
        can0 = [jnp.zeros((k, LANES), jnp.float32) for _ in range(c)]
        cand_x = [jnp.zeros((k, LANES), jnp.float32) for _ in range(c)]
        cand_y = [jnp.zeros((k, LANES), jnp.float32) for _ in range(c)]
        for n0 in range(0, n, nchunk):
            n_iota = jax.lax.broadcasted_iota(
                jnp.int32, (k, nchunk, LANES), 1).astype(jnp.float32) + float(n0)
            oh = (last_idx[:, None, :] == n_iota).astype(jnp.float32)
            for j in range(c):
                cand_idx[j] = cand_idx[j] + jnp.sum(
                    oh * table[n0 : n0 + nchunk, j, :][None, :, :], axis=1)
                can0[j] = can0[j] + jnp.sum(
                    oh * table[n0 : n0 + nchunk, c + j, :][None, :, :], axis=1)
                cand_x[j] = cand_x[j] + jnp.sum(
                    oh * table[n0 : n0 + nchunk, 2 * c + j, :][None, :, :], axis=1)
                cand_y[j] = cand_y[j] + jnp.sum(
                    oh * table[n0 : n0 + nchunk, 3 * c + j, :][None, :, :], axis=1)
        cand_idx = jnp.stack(cand_idx, axis=1)  # (K, C, LANES)
        # stacked as f32 then compared: Mosaic cannot concatenate i1 vectors
        can0 = jnp.stack(can0, axis=1) > 0.5
        cand_x = jnp.stack(cand_x, axis=1)
        cand_y = jnp.stack(cand_y, axis=1)

        p = lengths - 1.0  # (K, LANES)

        # ---- gate 1: not already in config
        in_cfg = jnp.zeros(cand_idx.shape, bool)
        for j in range(l):
            in_cfg = in_cfg | (cand_idx == configs[j][:, None, :])
        can = can0 & ~in_cfg

        # ---- gate 2: ellipse (p >= 1)
        mjx, mjy = last_x - prev_x, last_y - prev_y
        inv = jax.lax.rsqrt(jnp.maximum(mjx * mjx + mjy * mjy, 1e-24))
        mjx, mjy = mjx * inv, mjy * inv
        relx = cand_x - last_x[:, None, :]
        rely = cand_y - last_y[:, None, :]
        xr = relx * mjx[:, None, :] + rely * mjy[:, None, :]
        yr = mjx[:, None, :] * rely - mjy[:, None, :] * relx
        ell = (xr / gates["ellipse_major"]) ** 2 + (yr / gates["ellipse_minor"]) ** 2 < 1.0
        can = can & (ell | (p < 1.0)[:, None, :])

        # ---- gate 3: second cone on correct side (p == 0)
        ccx = cand_x - car_x[None, None, :]
        ccy = cand_y - car_y[None, None, :]
        dsign = _atan2(
            dir_x[None, None, :] * ccy - dir_y[None, None, :] * ccx,
            dir_x[None, None, :] * ccx + dir_y[None, None, :] * ccy,
        )
        side_ok = (jnp.sign(dsign) == sign[None, None, :]) | (
            jnp.abs(dsign) < gates["side_eps"]
        )
        can = can & (side_ok | (p != 0.0)[:, None, :])

        # ---- gate 4: no cone skipped between last and candidate
        # m runs over the same neighbor set; blocker if both distances < 6
        # and angle at m > 150 deg
        v_ml_x = last_x[:, None, :] - cand_x  # (K, M, LANES) with M == C
        v_ml_y = last_y[:, None, :] - cand_y
        d_ml = jnp.sqrt(v_ml_x * v_ml_x + v_ml_y * v_ml_y)
        blocked = jnp.zeros(can.shape, bool)
        cos_thr = math.cos(gates["between_angle"])
        for m in range(c):
            vmcx = cand_x - cand_x[:, m : m + 1, :]  # (K, C, LANES)
            vmcy = cand_y - cand_y[:, m : m + 1, :]
            d_mc = jnp.sqrt(vmcx * vmcx + vmcy * vmcy)
            dots = v_ml_x[:, m : m + 1, :] * vmcx + v_ml_y[:, m : m + 1, :] * vmcy
            cos_gate = dots < cos_thr * d_ml[:, m : m + 1, :] * d_mc
            not_self = cand_idx != cand_idx[:, m : m + 1, :]
            blocked = blocked | (
                can0[:, m : m + 1, :]
                & not_self
                & (d_mc < gates["between_dist"])
                & (d_ml[:, m : m + 1, :] < gates["between_dist"])
                & cos_gate
            )
        can = can & ~blocked

        # ---- gate 5: direction-change thresholds (p >= 1)
        spx, spy = last_x - prev_x, last_y - prev_y  # (K, LANES)
        snx = cand_x - last_x[:, None, :]
        sny = cand_y - last_y[:, None, :]
        diff = _atan2(
            spx[:, None, :] * sny - spy[:, None, :] * snx,
            spx[:, None, :] * snx + spy[:, None, :] * sny,
        )
        seg_len = jnp.sqrt(snx * snx + sny * sny)
        abs_ok = jnp.abs(diff) <= gates["thr_abs"]
        directional = (sign[None, None, :] * diff < gates["thr_dir"]) | (
            seg_len < gates["close_dist"]
        )
        can = can & ((abs_ok & directional) | (p < 1.0)[:, None, :])

        # ---- gate 6: flip-kill (p >= 2)
        ppx, ppy = prev_x - prev2_x, prev_y - prev2_y
        diff2 = _atan2(ppx * spy - ppy * spx, ppx * spx + ppy * spy)[:, None, :]
        flip = (jnp.sign(diff) != jnp.sign(diff2)) & (jnp.abs(diff - diff2) > 1.3)
        can = can & (~flip | (p < 2.0)[:, None, :])

        # ---- gate 7: offset from start (p == 1)
        off_ok = (
            dir_x[None, None, :] * (cand_x - first_x[:, None, :])
            + dir_y[None, None, :] * (cand_y - first_y[:, None, :])
        ) > 0.0
        can = can & (off_ok | (p != 1.0)[:, None, :])

        # ---- gate 8: car-body crossing
        crosses = _seg_intersect(
            last_x[:, None, :], last_y[:, None, :], cand_x, cand_y,
            cs_x[None, None, :], cs_y[None, None, :],
            ce_x[None, None, :], ce_y[None, None, :],
        )
        can = can & ~crosses

        expandable = (alive > 0.5) & ~done & (lengths < target_len[None, :])
        can = can & expandable[:, None, :]

        # ---- children carries
        theta = _angle_between(
            prev_x[:, None, :] - last_x[:, None, :],
            prev_y[:, None, :] - last_y[:, None, :],
            snx, sny,
        )
        add_int = (p >= 1.0)[:, None, :]
        c_angle = angle_sum[:, None, :] + jnp.where(
            add_int, (jnp.pi - theta) / jnp.pi, 0.0
        )
        c_under = n_under[:, None, :] + jnp.where(
            add_int & (theta < gates["under_angle"]), 1.0, 0.0
        )
        c_resid = residual[:, None, :] + jnp.maximum(0.0, seg_len - 3.0)
        first_ang = _angle_between(
            cand_x - first_x[:, None, :], cand_y - first_y[:, None, :],
            dir_x[None, None, :], dir_y[None, None, :],
        )
        c_init = jnp.where((p == 0.0)[:, None, :], first_ang, init_cost[:, None, :])
        wrong_inc = jnp.where(
            (jnp.sign(diff) == sign[None, None, :])
            & (jnp.abs(diff) > gates["under_angle"]),
            diff,
            0.0,
        )
        c_wrong = wrong_sum[:, None, :] + jnp.where(add_int, wrong_inc, 0.0)

        c_len = lengths[:, None, :] + 1.0
        n_int = jnp.maximum(c_len - 2.0, 1.0)
        c_score = (
            w0 * c_angle / n_int * (c_under + 1.0)
            + w1 * c_resid
            + w2 / jnp.maximum(c_len, 1.0)
            + w3 * c_init
            + w6 * jnp.abs(c_wrong) * (c_len >= 4.0)
        )
        c_score = jnp.where(can, c_score, _BIG)

        # ---- parents: freeze leaves
        newly_done = expandable & ~jnp.any(can, axis=1)
        done2 = done | newly_done
        frozen = (alive > 0.5) & (done2 | ~expandable)
        n_int_p = jnp.maximum(lengths - 2.0, 1.0)
        p_score = (
            w0 * angle_sum / n_int_p * (n_under + 1.0)
            + w1 * residual
            + w2 / jnp.maximum(lengths, 1.0)
            + w3 * init_cost
            + w6 * jnp.abs(wrong_sum) * (lengths >= 4.0)
        )
        p_score = jnp.where(frozen, p_score, _BIG)

        # ---- pool features, per feature row: (P, LANES), P = K + K*C
        pool_sz = k + k * c

        def pool_row(parent_row, child_rows):
            # Children pooled j-major (neighbor-major): pool index K + j*K + k_,
            # matching the XLA path's `[parent] + [per-neighbor (K,) blocks]`
            # concatenation so tie-breaking on pool index selects the same
            # survivors in both implementations.
            return jnp.concatenate(
                [parent_row, child_rows.transpose(1, 0, 2).reshape(k * c, LANES)],
                axis=0,
            )

        pool = []
        for j in range(l):
            write_here = lengths[:, None, :] == float(j)
            child_cfg_j = jnp.where(write_here, cand_idx, configs[j][:, None, :])
            pool.append(pool_row(configs[j], child_cfg_j))
        pool.append(pool_row(lengths, jnp.broadcast_to(c_len, (k, c, LANES))))
        pool.append(pool_row(done2.astype(jnp.float32), jnp.zeros((k, c, LANES))))
        pool.append(pool_row(angle_sum, c_angle))
        pool.append(pool_row(n_under, c_under))
        pool.append(pool_row(residual, c_resid))
        pool.append(pool_row(init_cost, c_init))
        pool.append(pool_row(wrong_sum, c_wrong))
        pool.append(pool_row(last_idx, cand_idx))
        pool.append(pool_row(last_x, cand_x))
        pool.append(pool_row(last_y, cand_y))
        bcast = lambda a: jnp.broadcast_to(a[:, None, :], (k, c, LANES))
        pool.append(pool_row(prev_x, bcast(last_x)))
        pool.append(pool_row(prev_y, bcast(last_y)))
        pool.append(pool_row(prev2_x, bcast(prev_x)))
        pool.append(pool_row(prev2_y, bcast(prev_y)))
        pool.append(pool_row(first_x, bcast(first_x)))
        pool.append(pool_row(first_y, bcast(first_y)))

        scores = jnp.concatenate(
            [p_score, c_score.transpose(1, 0, 2).reshape(k * c, LANES)], axis=0
        )

        # ---- rank-based exact top-K (ties broken by pool index, matching
        # the XLA top_k's stable lowest-index-first order)
        chunk = 32
        rank = jnp.zeros((pool_sz, LANES), jnp.float32)
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (pool_sz, 1, LANES), 0).astype(jnp.float32)
        for q0 in range(0, pool_sz, chunk):
            s_q = scores[q0 : q0 + chunk][None, :, :]  # (1, chunk, LANES)
            q_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, chunk, LANES), 1).astype(jnp.float32) + float(q0)
            better = (s_q < scores[:, None, :]) | (
                (s_q == scores[:, None, :]) & (q_iota < p_iota)
            )
            rank = rank + jnp.sum(better.astype(jnp.float32), axis=1)

        # ---- rank-gather the K survivors: out[k_] = pool row with rank k_
        sel_scores = jnp.zeros((k, LANES), jnp.float32)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, chunk, LANES), 0).astype(jnp.float32)
        acc = [jnp.zeros((k, LANES), jnp.float32) for _ in range(f_dim)]
        for q0 in range(0, pool_sz, chunk):
            oh = (rank[q0 : q0 + chunk][None, :, :] == k_iota).astype(jnp.float32)
            for f in range(f_dim):
                acc[f] = acc[f] + jnp.sum(oh * pool[f][q0 : q0 + chunk][None, :, :], axis=1)
            sel_scores = sel_scores + jnp.sum(
                oh * scores[q0 : q0 + chunk][None, :, :], axis=1
            )
        new_alive = (sel_scores < _BIG * 0.5).astype(jnp.float32)
        # invalid slots: configs -1, length 0, last_idx -1 (mirror XLA path)
        for j in range(l):
            acc[j] = jnp.where(new_alive > 0.5, acc[j], -1.0)
        acc[l] = jnp.where(new_alive > 0.5, acc[l], 0.0)
        acc[l + 1] = jnp.where(new_alive > 0.5, acc[l + 1], 0.0)
        acc[l + 7] = jnp.where(new_alive > 0.5, acc[l + 7], -1.0)
        return jnp.stack(acc, axis=0), new_alive

    feats, alive = jax.lax.fori_loop(
        0, l - 1, step, (feats_ref[:], alive_ref[:])
    )
    out_feats_ref[:] = feats
    out_alive_ref[:] = alive


def fused_beam_search(
    node_table: jax.Array,  # (B2, N, 4C)
    feats0: jax.Array,  # (B2, F, K)
    alive0: jax.Array,  # (B2, K) f32
    params: jax.Array,  # (B2, N_PARAMS)
    *,
    n: int,
    k: int,
    l: int,
    c: int,
    weights: tuple,
    gates: dict,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the whole beam search for a batch of independent side-searches.

    Returns (feats (B2, F, K), alive (B2, K)).
    """
    if interpret is None:
        interpret = INTERPRET
    b = node_table.shape[0]
    f_dim = l + 16
    pad = (-b) % LANES
    if pad:
        node_table = jnp.concatenate(
            [node_table, jnp.zeros((pad,) + node_table.shape[1:], node_table.dtype)]
        )
        feats0 = jnp.concatenate(
            [feats0, jnp.zeros((pad,) + feats0.shape[1:], feats0.dtype)]
        )
        alive0 = jnp.concatenate([alive0, jnp.zeros((pad, k), alive0.dtype)])
        params = jnp.concatenate(
            [params, jnp.ones((pad, N_PARAMS), params.dtype)]
        )
    tiles = (b + pad) // LANES

    tt = jnp.transpose(node_table, (1, 2, 0))  # (N, 4C, B)
    ft = jnp.transpose(feats0, (1, 2, 0))  # (F, K, B)
    at = jnp.transpose(alive0, (1, 0))  # (K, B)
    pt = jnp.transpose(params, (1, 0))  # (S, B)

    kern = functools.partial(
        _beam_kernel, n=n, k=k, l=l, c=c, weights=weights, gates=gates
    )
    out_feats, out_alive = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((f_dim, k, b + pad), jnp.float32),
            jax.ShapeDtypeStruct((k, b + pad), jnp.float32),
        ),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((n, 4 * c, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_dim, k, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_PARAMS, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((f_dim, k, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # the step working set (pool features + rank matrices) exceeds the
            # default 16M scoped-vmem budget; the chip has headroom
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tt, ft, at, pt)

    feats = jnp.transpose(out_feats, (2, 0, 1))[:b]
    alive = jnp.transpose(out_alive, (1, 0))[:b]
    return feats, alive
