"""Probe: does flattening 2-D gathers fix the 41ms padded_view cost in-situ?

Timing protocol (see axon relay notes): compile/warm with buffer A, then time
with never-before-used buffer B at K=1 and K=12 inside a barrier-carried
fori_loop; per-iter = (t12 - t1) / 11.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 16384
WIDTH = 256
CAP = N_ROWS * WIDTH


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.integers(0, 256, CAP, dtype=np.uint8))
    lens = rng.integers(1, WIDTH, N_ROWS)
    offs = np.zeros(N_ROWS + 1, np.int64)
    np.cumsum(np.minimum(lens, CAP // N_ROWS), out=offs[1:])
    offsets = jnp.asarray(offs.astype(np.int32))
    return data, offsets


def padded_2d(data, offsets):
    starts = offsets[:-1][:, None]
    lens = (offsets[1:] - offsets[:-1])[:, None]
    k = jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts + k, CAP - 1)
    vals = data[idx]
    return jnp.where(k < lens, vals, jnp.uint8(0))


def padded_flat(data, offsets):
    starts = offsets[:-1][:, None]
    lens = (offsets[1:] - offsets[:-1])[:, None]
    k = jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts + k, CAP - 1)
    vals = data[idx.reshape(-1)].reshape(idx.shape)
    return jnp.where(k < lens, vals, jnp.uint8(0))


def timed(fn, k_tag):
    def body(fn, data, offsets, K):
        def step(i, carry):
            s, d = carry
            out = fn(d + s.astype(jnp.uint8), offsets)
            return (jnp.sum(out.astype(jnp.uint32)) % 7).astype(jnp.uint8), d

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.uint8(0), data))
        return s

    j1 = jax.jit(lambda d, o: body(fn, d, o, 1))
    j12 = jax.jit(lambda d, o: body(fn, d, o, 12))
    # warm/compile on buffer A
    da, oa = make_inputs(1)
    j1(da, oa).block_until_ready()
    j12(da, oa).block_until_ready()
    # time on fresh buffer B
    db, ob = make_inputs(2 + hash(k_tag) % 97)
    t0 = time.perf_counter()
    j1(db, ob).block_until_ready()
    t1 = time.perf_counter() - t0
    dc, oc = make_inputs(1000 + hash(k_tag) % 89)
    t0 = time.perf_counter()
    j12(dc, oc).block_until_ready()
    t12 = time.perf_counter() - t0
    per = (t12 - t1) / 11.0
    print(f"{k_tag}: t1={t1*1e3:.1f}ms t12={t12*1e3:.1f}ms per-iter={per*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # correctness cross-check on small case
    d, o = make_inputs(7)
    a = np.asarray(padded_2d(d, o))
    b = np.asarray(padded_flat(d, o))
    assert (a == b).all(), "flat variant mismatch"
    print("parity ok", flush=True)
    timed(padded_2d, "padded_2d")
    timed(padded_flat, "padded_flat")
