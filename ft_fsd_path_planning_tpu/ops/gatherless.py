"""Gather-free lookup primitives.

On this TPU target, XLA lowers general batched `gather` HLOs to a scalar-core
loop (~2 GB/s effective — profiled at 0.4-0.7 ms per op regardless of size,
see BENCH notes). Every dynamic lookup on the hot path therefore goes through
these helpers, which express the lookup as a one-hot contraction: the compare
fuses into the surrounding computation and the contraction rides the MXU.

`precision=HIGHEST` keeps the selection exact in float32 (a one-hot row picks
out exactly one table row; the 0/1 weights are exact in every MXU pass mode,
and HIGHEST accumulates the payload at f32 fidelity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def take_rows(table: Array, idx: Array) -> Array:
    """table (..., N, F) float, idx (..., K) int -> (..., K, F).

    Out-of-range indices (e.g. -1 padding) return zero rows instead of
    clamping — callers mask those slots anyway.
    """
    n = table.shape[-2]
    oh = (idx[..., None] == jnp.arange(n)).astype(table.dtype)
    return jnp.einsum("...kn,...nf->...kf", oh, table, precision=_HI)


def take_vec(values: Array, idx: Array) -> Array:
    """values (..., N) float, idx (..., K) int -> (..., K)."""
    n = values.shape[-1]
    oh = (idx[..., None] == jnp.arange(n)).astype(values.dtype)
    return jnp.einsum("...kn,...n->...k", oh, values, precision=_HI)


def take_int_rows(table: Array, idx: Array) -> Array:
    """Integer-payload variant of take_rows; exact for |values| < 2**24."""
    out = take_rows(table.astype(jnp.float32), idx)
    return jnp.round(out).astype(table.dtype)


def shift_left(arr: Array, k: Array, fill: float = 0.0) -> Array:
    """out[i] = arr[i + k] for i + k < n, else fill. k: traced scalar in [0, n].

    Expressed as concat + lax.dynamic_slice (contiguous copy) — never a gather.
    """
    n = arr.shape[0]
    buf = jnp.concatenate([arr, jnp.full_like(arr, fill)], axis=0)
    return jax.lax.dynamic_slice_in_dim(buf, k, n, axis=0)


def shift_right(arr: Array, k: Array, fill: float = 0.0) -> Array:
    """out[i] = arr[i - k] for i >= k, else fill. k: traced scalar in [0, n]."""
    n = arr.shape[0]
    buf = jnp.concatenate([jnp.full_like(arr, fill), arr], axis=0)
    return jax.lax.dynamic_slice_in_dim(buf, n - k, n, axis=0)


def window(arr: Array, start: Array, size: int, fill: float = 0.0) -> Array:
    """Rows [start, start + size) of arr, fill outside [0, n).

    start: traced scalar in [-size, n]. Unbatched this is a contiguous
    dynamic_slice; under vmap a per-lane dynamic_slice lowers to a
    scalar-core loop over lanes (~0.4 ms/step for one size-20 window at
    batch 256 — profiled), so the batched rule switches to a one-hot
    contraction unless the table is so large that the one-hot operand would
    out-weigh the lane loop.
    """

    def _impl(a: Array, s: Array) -> Array:
        pad = jnp.full((size,) + a.shape[1:], fill, a.dtype)
        buf = jnp.concatenate([pad, a, pad], axis=0)
        return jax.lax.dynamic_slice_in_dim(buf, s + size, size, axis=0)

    _window = jax.custom_batching.custom_vmap(_impl)

    @_window.def_vmap
    def _window_vmap(axis_size, in_batched, a, s):
        a_b, s_b = in_batched
        if not a_b:
            a = jnp.broadcast_to(a, (axis_size,) + a.shape)
        if not s_b:
            s = jnp.broadcast_to(s, (axis_size,))
        n = a.shape[1]
        if n * size > 1 << 20:  # huge tables: keep the per-lane slice loop
            return jax.lax.map(lambda args: _impl(*args), (a, s)), True
        idx = s[:, None] + jnp.arange(size)  # (B, size)
        oh = (idx[:, :, None] == jnp.arange(n)).astype(a.dtype)
        flat = a.reshape(axis_size, n, -1)
        out = jnp.einsum("bwn,bnf->bwf", oh, flat, precision=_HI)
        out = out.reshape((axis_size, size) + a.shape[2:])
        if fill != 0.0:
            in_range = (idx >= 0) & (idx < n)
            shape = (axis_size, size) + (1,) * (a.ndim - 2)
            out = jnp.where(in_range.reshape(shape), out, fill)
        return out, True

    return _window(arr, start)


def circular_roll(arr: Array, s: Array) -> Array:
    """out[i] = arr[(i + s) mod n] for traced scalar s in [0, n]."""
    n = arr.shape[0]
    buf = jnp.concatenate([arr, arr], axis=0)
    return jax.lax.dynamic_slice_in_dim(buf, s, n, axis=0)


def select_slot(values: Array, slot: Array) -> Array:
    """values (..., K, C, V), slot (..., K) int in [0, C) -> (..., K, V).

    Per-row slot selection (the `x[row, slot[row]]` pattern) as a one-hot
    reduce over the slot axis.
    """
    c = values.shape[-2]
    oh = (slot[..., None] == jnp.arange(c)).astype(values.dtype)
    return jnp.einsum("...kc,...kcv->...kv", oh, values, precision=_HI)
