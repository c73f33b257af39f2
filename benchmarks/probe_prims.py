"""Primitive cost model probe on the real chip (fresh-buffer protocol).

Each loop body must DEPEND on the carry, or XLA's while-LICM hoists the
(loop-invariant) body out and per-iter measures nothing.  Every op here
perturbs its index/input with the carried scalar `s` before use.

Measures the device cost of candidate building blocks:
  g1u8    flat 4M uint8 gather, random idx
  g1i32   flat 1M int32 gather (same byte volume as g1u8)
  g2d     [16k,256] 2-D gather from 4M (the padded_view shape)
  gblk    block gather: take(data2d[32k,128], idx[48k], axis=0)
  gta     take_along_axis [16k,384] -> [16k,256] (variable per-row rotate)
  sc4m    scatter-set 4M updates into 4M+1
  sc600k  scatter-set 600k updates into 4M+1
  sc16k   scatter-set 16k updates into 4M+1
  scadd4m scatter-add 4M updates
  cummax  associative_scan max over 4M int32
  cumsum  cumsum over 4M int32
  sort4m  lax.sort 4M int32
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = 1 << 22  # 4M


def timed(name, fn, make_inputs):
    """fn(s, *args) -> array; s is the carried int32 scalar perturbation."""

    def body(args, K):
        def step(i, carry):
            s, a = carry
            out = fn(s, *a)
            red = jnp.sum(out.astype(jnp.int32)) if out.dtype != jnp.int32 else jnp.sum(out)
            return (red % 3).astype(jnp.int32), a

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.int32(0), args))
        return s

    j1 = jax.jit(lambda *a: body(a, 1))
    jk = jax.jit(lambda *a: body(a, 12))
    a_warm = make_inputs(17)
    j1(*a_warm).block_until_ready()
    jk(*a_warm).block_until_ready()
    b = make_inputs(101 + len(name))
    jax.block_until_ready(b)
    t0 = time.perf_counter(); j1(*b).block_until_ready(); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jk(*b).block_until_ready(); tk = time.perf_counter() - t0
    per = (tk - t1) / 11.0
    print(f"{name}: per-iter={per*1e3:.3f}ms (t1={t1*1e3:.1f} t12={tk*1e3:.1f})", flush=True)


def ri(seed, n, hi, dt=np.int32):
    return jnp.asarray(np.random.default_rng(seed).integers(0, hi, n, dtype=dt))


def main():
    print("devices:", jax.devices(), flush=True)

    timed("g1u8", lambda s, d, i: d[jnp.minimum(i + s, CAP - 1)],
          lambda sd: (ri(sd, CAP, 256, np.uint8).view(jnp.uint8), ri(sd + 1, CAP, CAP)))
    timed("g1i32", lambda s, d, i: d[jnp.minimum(i + s, CAP // 4 - 1)],
          lambda sd: (ri(sd, CAP // 4, 1 << 30), ri(sd + 1, CAP // 4, CAP // 4)))
    timed("g2d", lambda s, d, i: d[jnp.minimum(i + s, CAP - 1)],
          lambda sd: (ri(sd, CAP, 256, np.uint8).view(jnp.uint8),
                      ri(sd + 1, 16384 * 256, CAP).reshape(16384, 256)))
    timed("gblk", lambda s, d, i: d.reshape(CAP // 128, 128)[jnp.minimum(i + s, CAP // 128 - 1)],
          lambda sd: (ri(sd, CAP, 1 << 30), ri(sd + 1, 49152, CAP // 128)))
    timed("gta", lambda s, m, i: jnp.take_along_axis(m, jnp.minimum(i + s, 383), axis=1),
          lambda sd: (ri(sd, (16384 * 384), 1 << 30).reshape(16384, 384),
                      ri(sd + 1, (16384 * 256), 384).reshape(16384, 256)))
    timed("sc4m", lambda s, v, i: jnp.zeros(CAP + 1, jnp.int32).at[jnp.minimum(i + s, CAP)].set(v),
          lambda sd: (ri(sd, CAP, 1 << 30), ri(sd + 1, CAP, CAP)))
    timed("sc600k", lambda s, v, i: jnp.zeros(CAP + 1, jnp.int32).at[jnp.minimum(i + s, CAP)].set(v),
          lambda sd: (ri(sd, 600 * 1024, 1 << 30), ri(sd + 1, 600 * 1024, CAP)))
    timed("sc16k", lambda s, v, i: jnp.zeros(CAP + 1, jnp.int32).at[jnp.minimum(i + s, CAP)].set(v),
          lambda sd: (ri(sd, 16384, 1 << 30), ri(sd + 1, 16384, CAP)))
    timed("scadd4m", lambda s, v, i: jnp.zeros(CAP + 1, jnp.int32).at[jnp.minimum(i + s, CAP)].add(v),
          lambda sd: (ri(sd, CAP, 1 << 20), ri(sd + 1, CAP, CAP)))
    timed("cummax", lambda s, x: jax.lax.associative_scan(jnp.maximum, x + s),
          lambda sd: (ri(sd, CAP, 1 << 30),))
    timed("cumsum", lambda s, x: jnp.cumsum(x + s),
          lambda sd: (ri(sd, CAP, 1 << 20),))
    timed("sort4m", lambda s, x: jax.lax.sort(x + s),
          lambda sd: (ri(sd, CAP, 1 << 30),))


if __name__ == "__main__":
    main()
