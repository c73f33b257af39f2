"""Isolate WHY padded_view's 2-D gather costs 28.6ms while a 2-D gather
from a materialized random index array costs ~0.005ms.

Variants (all [16k,256] from 4M uint8, loop-carried data perturbation):
  A_orig      idx = min(starts+k, CAP-1) fused from offsets broadcast
  B_barrier   same idx, but optimization_barrier'd before the gather
  C_noclamp   idx = starts+k (no minimum)
  D_nomask    A without the where(k<lens) mask
  E_nogather  d+s perturbation and sum only (no gather at all)
  F_randbar   materialized random idx, data perturbed (cross-check)
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
    ridx = jnp.asarray(
        rng.integers(0, CAP, N_ROWS * WIDTH, dtype=np.int32).reshape(N_ROWS, WIDTH)
    )
    return data, offsets, ridx


def idx_of(offsets):
    starts = offsets[:-1][:, None]
    k = jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    return jnp.minimum(starts + k, CAP - 1), k


def v_orig(d, offsets, ridx):
    idx, k = idx_of(offsets)
    lens = (offsets[1:] - offsets[:-1])[:, None]
    return jnp.where(k < lens, d[idx], jnp.uint8(0))


def v_barrier(d, offsets, ridx):
    idx, k = idx_of(offsets)
    idx = jax.lax.optimization_barrier(idx)
    lens = (offsets[1:] - offsets[:-1])[:, None]
    return jnp.where(k < lens, d[idx], jnp.uint8(0))


def v_noclamp(d, offsets, ridx):
    starts = offsets[:-1][:, None]
    k = jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    return d[starts + k]


def v_nomask(d, offsets, ridx):
    idx, k = idx_of(offsets)
    return d[idx]


def v_nogather(d, offsets, ridx):
    return d


def v_randbar(d, offsets, ridx):
    return d[ridx]


def timed(name, fn):
    def body(args, K):
        def step(i, carry):
            s, a = carry
            d, offsets, ridx = a
            out = fn(d + s, offsets, ridx)
            return (jnp.sum(out.astype(jnp.int32)) % 3).astype(jnp.uint8), a

        s, _ = jax.lax.fori_loop(0, K, body_fn := step, (jnp.uint8(0), args))
        return s

    j1 = jax.jit(lambda *a: body(a, 1))
    jk = jax.jit(lambda *a: body(a, 12))
    w = make_inputs(11)
    j1(*w).block_until_ready()
    jk(*w).block_until_ready()
    # ONE fresh buffer set, uploaded and blocked BEFORE timing, reused by
    # both the K=1 and K=12 calls: (t12-t1)/11 then cancels dispatch floor
    # without per-call upload variance poisoning the difference.
    b = make_inputs(211 + len(name))
    jax.block_until_ready(b)
    t0 = time.perf_counter(); j1(*b).block_until_ready(); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jk(*b).block_until_ready(); tk = time.perf_counter() - t0
    per = (tk - t1) / 11.0
    print(f"{name}: per-iter={per*1e3:.3f}ms (t1={t1*1e3:.1f} t12={tk*1e3:.1f})", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    timed("E_nogather", v_nogather)
    timed("A_orig", v_orig)
    timed("B_barrier", v_barrier)
    timed("C_noclamp", v_noclamp)
    timed("D_nomask", v_nomask)
    timed("F_randbar", v_randbar)
