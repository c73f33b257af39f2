"""Parity tests for the linear-pass Pallas scans (ops/pallas_scan.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from custrings_tpu.ops import pallas_scan as ps


@pytest.mark.parametrize("n", [1, 7, 128, 1024, 4096, 5000])
@pytest.mark.parametrize("dtype", [np.int32, np.uint8, np.bool_])
def test_cumsum_matches_numpy(n, dtype):
    rng = np.random.default_rng(n)
    if dtype == np.bool_:
        x = rng.integers(0, 2, n).astype(np.bool_)
    elif dtype == np.uint8:
        x = rng.integers(0, 256, n).astype(np.uint8)
    else:
        x = rng.integers(-100000, 100000, n).astype(np.int32)
    # force the kernel with a tiny tile so multi-tile carries are exercised
    got = ps.cumsum_i32(jnp.asarray(x), force=True, tile_r=8)
    want = np.cumsum(x.astype(np.int64)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("n", [1, 7, 128, 1024, 4096, 5000])
def test_cummax_matches_numpy(n):
    rng = np.random.default_rng(n + 17)
    x = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    got = ps.cummax_i32(jnp.asarray(x), force=True, tile_r=8)
    want = np.maximum.accumulate(x)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_cumsum_large_values():
    # prefix totals near int32 range stay exact (16-bit-half matmuls)
    x = np.full(4096, 500_000, np.int32)
    x[::7] = -250_000
    got = ps.cumsum_i32(jnp.asarray(x), force=True, tile_r=8)
    want = np.cumsum(x.astype(np.int64)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_small_stays_on_xla():
    x = jnp.arange(100, dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(ps.cumsum_i32(x)), np.cumsum(np.arange(100))
    )
    np.testing.assert_array_equal(
        np.asarray(ps.cummax_i32(x)), np.arange(100)
    )
