"""Unit tests for ops/gatherless.py — the one-hot / dynamic-slice lookup
primitives that carry the whole hot path (beam search, cost, relocalization).

Every primitive is checked against a plain NumPy / `jnp.take` oracle,
including the documented edge contracts:

- out-of-range indices -> zero rows (NOT clamping),
- integer payloads survive the f32 round-trip only below 2**24,
- traced-shift scalars at the boundaries of their documented ranges,
- the finiteness contract: a non-finite row anywhere in a table poisons
  every output row of a one-hot contraction (0 * inf = nan), so callers
  must scrub inputs — this is asserted as *documented behavior* so a
  future "fix" that silently changes it is caught.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import gatherless as gl

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# take_rows / take_vec / take_int_rows / select_slot (one-hot contractions)
# ---------------------------------------------------------------------------


def test_take_rows_matches_take():
    table = jnp.asarray(RNG.normal(size=(33, 5)), jnp.float32)
    idx = jnp.asarray(RNG.integers(0, 33, size=17))
    got = np.asarray(gl.take_rows(table, idx))
    want = np.asarray(jnp.take(table, idx, axis=0))
    np.testing.assert_array_equal(got, want)  # one-hot pick is exact


def test_take_rows_batched():
    table = jnp.asarray(RNG.normal(size=(4, 12, 3)), jnp.float32)
    idx = jnp.asarray(RNG.integers(0, 12, size=(4, 6)))
    got = np.asarray(gl.take_rows(table, idx))
    want = np.stack(
        [np.asarray(table)[b][np.asarray(idx)[b]] for b in range(4)]
    )
    np.testing.assert_array_equal(got, want)


def test_take_rows_out_of_range_returns_zero_rows():
    table = jnp.asarray(RNG.normal(size=(8, 3)) + 5.0, jnp.float32)
    idx = jnp.asarray([-1, 0, 7, 8, 100, -100])
    got = np.asarray(gl.take_rows(table, idx))
    np.testing.assert_array_equal(got[0], np.zeros(3))
    np.testing.assert_array_equal(got[3], np.zeros(3))
    np.testing.assert_array_equal(got[4], np.zeros(3))
    np.testing.assert_array_equal(got[5], np.zeros(3))
    np.testing.assert_array_equal(got[1], np.asarray(table)[0])
    np.testing.assert_array_equal(got[2], np.asarray(table)[7])


def test_take_vec_matches_take_and_zero_fills():
    vals = jnp.asarray(RNG.normal(size=20), jnp.float32)
    idx = jnp.asarray([0, 19, 5, -1, 20])
    got = np.asarray(gl.take_vec(vals, idx))
    np.testing.assert_array_equal(got[:3], np.asarray(vals)[[0, 19, 5]])
    assert got[3] == 0.0 and got[4] == 0.0


def test_take_int_rows_exact_below_2_24():
    # largest exactly-representable contiguous integer in f32 is 2**24
    vals = np.array([[0], [1], [2**24 - 1], [-(2**24 - 1)], [12345]], np.int32)
    table = jnp.asarray(vals)
    idx = jnp.asarray([2, 3, 4, 0, 1])
    got = np.asarray(gl.take_int_rows(table, idx))
    np.testing.assert_array_equal(got, vals[np.asarray(idx)])
    assert got.dtype == np.int32


def test_take_int_rows_breaks_above_2_24():
    """Above 2**24 the f32 round-trip loses integers — the guard in
    config (n_cones et al. far below 2**24) is what keeps callers safe."""
    table = jnp.asarray([[2**24 + 1]], jnp.int32)
    got = int(gl.take_int_rows(table, jnp.asarray([0]))[0, 0])
    assert got != 2**24 + 1  # documented limitation, not a silent assumption


def test_select_slot():
    values = jnp.asarray(RNG.normal(size=(7, 4, 3)), jnp.float32)
    slot = jnp.asarray(RNG.integers(0, 4, size=7))
    got = np.asarray(gl.select_slot(values, slot))
    want = np.asarray(values)[np.arange(7), np.asarray(slot)]
    np.testing.assert_array_equal(got, want)


def test_onehot_contraction_nonfinite_poisoning_contract():
    """A single inf/nan row in the table NaN-poisons EVERY output row
    (0 * inf = nan inside the contraction). Callers must scrub inputs;
    this test pins the contract so the failure mode stays visible."""
    table = jnp.asarray([[1.0, 2.0], [np.inf, 3.0], [4.0, 5.0]], jnp.float32)
    got = np.asarray(gl.take_rows(table, jnp.asarray([0, 2])))
    assert np.isnan(got).any()


# ---------------------------------------------------------------------------
# shift / window / roll (dynamic-slice lookups, traced scalars)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [0, 1, 5, 9, 10])
def test_shift_left(k):
    arr = jnp.asarray(RNG.normal(size=(10, 2)), jnp.float32)
    got = np.asarray(jax.jit(gl.shift_left)(arr, jnp.asarray(k)))
    want = np.zeros_like(got)
    if k < 10:
        want[: 10 - k] = np.asarray(arr)[k:]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [0, 1, 5, 9, 10])
def test_shift_right(k):
    arr = jnp.asarray(RNG.normal(size=(10,)), jnp.float32)
    got = np.asarray(jax.jit(gl.shift_right)(arr, jnp.asarray(k), -1.0))
    want = np.full(10, -1.0, np.float32)
    if k < 10:
        want[k:] = np.asarray(arr)[: 10 - k]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("start", [-4, -1, 0, 3, 8, 10, 12])
def test_window(start):
    arr = jnp.asarray(RNG.normal(size=(12, 2)), jnp.float32)
    size = 4
    got = np.asarray(jax.jit(gl.window, static_argnums=2)(arr, jnp.asarray(start), size, 9.0))
    want = np.full((size, 2), 9.0, np.float32)
    for i in range(size):
        j = start + i
        if 0 <= j < 12:
            want[i] = np.asarray(arr)[j]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("s", [0, 1, 6, 11, 12])
def test_circular_roll(s):
    arr = jnp.asarray(RNG.normal(size=(12, 3)), jnp.float32)
    got = np.asarray(jax.jit(gl.circular_roll)(arr, jnp.asarray(s)))
    want = np.roll(np.asarray(arr), -s, axis=0)
    np.testing.assert_array_equal(got, want)
