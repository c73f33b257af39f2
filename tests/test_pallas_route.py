"""Parity tests for the linear streaming routers (ops/pallas_route.py).

Small tiles force multi-tile stitching (the ring buffer / window DMA
paths) in interpret mode; the shift_compact roll network and a numpy
oracle are the references.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from custrings_tpu.ops import pallas_route as pr


@pytest.mark.parametrize("n", [256, 500, 5000, 40000])
@pytest.mark.parametrize("density", [0.0, 0.5, 1.0])
def test_compact_stream(n, density):
    rng = np.random.default_rng(n + int(density * 7))
    keep = rng.random(n) < density
    data = rng.integers(0, 256, n).astype(np.uint8)
    v32 = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    (g8, g32), k0 = pr.compact_stream(
        jnp.asarray(keep), [jnp.asarray(data), jnp.asarray(v32)], tile=256
    )
    kept = np.nonzero(keep)[0]
    w8 = np.zeros(n, np.uint8)
    w32 = np.zeros(n, np.int32)
    w8[: kept.size] = data[kept]
    w32[: kept.size] = v32[kept]
    np.testing.assert_array_equal(np.asarray(g8), w8)
    np.testing.assert_array_equal(np.asarray(g32), w32)
    np.testing.assert_array_equal(
        np.asarray(k0), np.concatenate([[0], np.cumsum(keep)])
    )


@pytest.mark.parametrize("n", [256, 500, 5000, 40000])
@pytest.mark.parametrize("step", [0, 2, 40])
def test_expand_stream(n, step):
    rng = np.random.default_rng(n + step)
    live = rng.random(n) < 0.5
    dist = np.maximum.accumulate(
        rng.integers(0, step + 1, n)
    ).astype(np.int32)
    live = live & ((np.arange(n) + dist) < n)
    vals = rng.integers(0, 256, n).astype(np.uint8)
    v32 = rng.integers(-999, 999, n).astype(np.int32)
    (got, g32), placed = pr.expand_stream(
        jnp.asarray(live),
        jnp.asarray(dist),
        [jnp.asarray(vals), jnp.asarray(v32)],
        tile=256,
        align=512,
    )
    want = np.zeros(n, np.uint8)
    w32 = np.zeros(n, np.int32)
    wpl = np.zeros(n, bool)
    jj = np.nonzero(live)[0]
    tt = jj + dist[jj]
    want[tt] = vals[jj]
    w32[tt] = v32[jj]
    wpl[tt] = True
    np.testing.assert_array_equal(np.asarray(placed), wpl)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(g32), w32)


def test_expand_stream_out_cap():
    # out_cap > n: elements may land past the input length
    n = 600
    rng = np.random.default_rng(3)
    live = np.ones(n, bool)
    dist = np.full(n, 700, np.int32)
    vals = rng.integers(0, 256, n).astype(np.uint8)
    (got,), placed = pr.expand_stream(
        jnp.asarray(live),
        jnp.asarray(dist),
        [jnp.asarray(vals)],
        out_cap=n + 768,
        tile=256,
        align=512,
    )
    want = np.zeros(n + 768, np.uint8)
    want[700 : 700 + n] = vals
    np.testing.assert_array_equal(np.asarray(got), want)
    assert np.asarray(placed).sum() == n


def test_stream_padded_view_parity(monkeypatch):
    monkeypatch.setenv("CUSTRINGS_STREAM_VIEW", "1")
    from custrings_tpu import column
    from custrings_tpu.ops import layout

    rng = np.random.default_rng(3)
    strs = [
        "".join(chr(rng.integers(97, 123)) for _ in range(rng.integers(0, 30)))
        for _ in range(300)
    ]
    strs += ["héllo wörld \U0001f389", "", "x" * 31]
    col = column.from_host_strings(strs)
    W = layout.max_row_bytes(col)
    pv = np.asarray(layout.padded_view(col, W))
    bs = [s.encode() for s in strs]
    want = np.zeros((len(bs), W), np.uint8)
    for i, b in enumerate(bs):
        want[i, : len(b)] = np.frombuffer(b, np.uint8)
    np.testing.assert_array_equal(pv, want)
    mat, nch = layout.char_matrix(col, W)
    mat = np.asarray(mat)
    for i, s in enumerate(strs):
        cps = [ord(c) for c in s]
        np.testing.assert_array_equal(mat[i, : len(cps)], cps)
        assert int(np.asarray(nch)[i]) == len(cps)


def test_compact_stream_fuzz_ragged_tiles():
    rng = np.random.default_rng(99)
    for _ in range(5):
        n = int(rng.integers(200, 3000))
        keep = rng.random(n) < rng.random()
        data = rng.integers(0, 256, n).astype(np.uint8)
        (g8,), k0 = pr.compact_stream(
            jnp.asarray(keep), [jnp.asarray(data)], tile=256
        )
        kept = np.nonzero(keep)[0]
        w8 = np.zeros(n, np.uint8)
        w8[: kept.size] = data[kept]
        np.testing.assert_array_equal(np.asarray(g8), w8)
