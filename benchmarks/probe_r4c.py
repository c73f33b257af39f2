"""Round-4 roofline probe: raw bandwidth of the streaming movers.

VERDICT r3 item 2 asks byte-bound ops for >=40 GB/s.  Current 1M-tier
replace sits at ~10.9 GB/s end-to-end; this probe separates (a) what the
linear streaming kernels themselves achieve on a big plane from (b) what
a trivial elementwise pass achieves on the same relay (the practical
roofline reference), at u8 and packed-i32 granularity, so the fix
(word-packing vs kernel tuning vs plan overhead) is chosen by
measurement, not guess.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, make_inputs, iters=4, nbytes=None):
    def body(args, K):
        def step(i, carry):
            s, a = carry
            out = fn(s, *a)
            red = jnp.max(out.astype(jnp.int32))
            return (red % 3).astype(jnp.int32), a

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.int32(0), args))
        return s

    try:
        j1 = jax.jit(lambda *a: body(a, 1))
        jk = jax.jit(lambda *a: body(a, iters))
        mk = jax.jit(make_inputs)

        def run(f, args):
            return float(jax.device_get(f(*args)))

        a = mk(17)
        jax.device_get([x[:1] for x in a])
        t0 = time.perf_counter()
        run(j1, a)
        c1 = time.perf_counter() - t0
        run(jk, a)
        b1 = mk(101)
        jax.device_get([x[:1] for x in b1])
        t0 = time.perf_counter()
        run(j1, b1)
        t1 = time.perf_counter() - t0
        b2 = mk(202)
        jax.device_get([x[:1] for x in b2])
        t0 = time.perf_counter()
        run(jk, b2)
        tk = time.perf_counter() - t0
        per = (tk - t1) / (iters - 1)
        gbs = f" {nbytes / per / 1e9:.1f}GB/s" if nbytes else ""
        print(
            f"{name}: per-iter={per * 1e3:.3f}ms{gbs}"
            f" (compile1={c1:.0f}s)",
            flush=True,
        )
        del a, b1, b2
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"[:300], flush=True)


def main():
    from custrings_tpu.ops import pallas_route as pr

    print(f"backend={jax.default_backend()}", flush=True)

    N = 1 << 28  # 268M lanes

    # --- roofline references: trivial elementwise over the same plane
    def mk_u8(seed, N=N):
        k = jax.random.key(seed)
        return (jax.random.randint(k, (N,), 0, 256, jnp.int32).astype(jnp.uint8),)

    def mk_i32(seed, N=N // 4):
        k = jax.random.key(seed)
        return (jax.random.randint(k, (N,), 0, 256, jnp.int32),)

    # copy = read N + write N bytes
    timed("copy_u8_268M", lambda s, x: x + s.astype(jnp.uint8), mk_u8,
          nbytes=2 * N)
    timed("copy_i32_67M", lambda s, x: x + s, mk_i32, nbytes=2 * N)

    # --- streaming kernels, one u8 plane
    def mk_cmp(seed, N=N):
        k1, k2 = jax.random.split(jax.random.key(seed))
        return (
            jax.random.randint(k1, (N,), 0, 256, jnp.int32).astype(jnp.uint8),
            jax.random.randint(k2, (N,), 0, 5, jnp.int32) > 0,
        )

    def run_compact(s, d, k):
        (out,), _ = pr.compact_stream(k ^ (s > 2), [d])
        return out

    timed("compact_stream_u8_268M", run_compact, mk_cmp, nbytes=2 * N)

    # i32 plane, quarter lanes = same bytes
    def mk_cmp32(seed, N=N // 4):
        k1, k2 = jax.random.split(jax.random.key(seed))
        return (
            jax.random.randint(k1, (N,), 0, 256, jnp.int32),
            jax.random.randint(k2, (N,), 0, 5, jnp.int32) > 0,
        )

    def run_compact32(s, d, k):
        (out,), _ = pr.compact_stream(k ^ (s > 2), [d])
        return out

    timed("compact_stream_i32_67M", run_compact32, mk_cmp32, nbytes=2 * N)

    # expansion: monotone dist
    def mk_exp(seed, N=N):
        k1, k2 = jax.random.split(jax.random.key(seed))
        d = jax.random.randint(k1, (N,), 0, 256, jnp.int32).astype(jnp.uint8)
        live = jax.random.randint(k2, (N,), 0, 5, jnp.int32) > 0
        dist = jnp.cumsum((~live).astype(jnp.int32)) // 4  # nondecreasing
        return (d, live, dist)

    def run_expand(s, d, live, dist):
        (out,), _ = pr.expand_stream(live, dist, [d])
        return out

    timed("expand_stream_u8_268M", run_expand, mk_exp, nbytes=2 * N)

    def mk_exp32(seed, N=N // 4):
        k1, k2 = jax.random.split(jax.random.key(seed))
        d = jax.random.randint(k1, (N,), 0, 256, jnp.int32)
        live = jax.random.randint(k2, (N,), 0, 5, jnp.int32) > 0
        dist = jnp.cumsum((~live).astype(jnp.int32)) // 4
        return (d, live, dist)

    timed("expand_stream_i32_67M", run_expand, mk_exp32, nbytes=2 * N)

    # multi-plane compaction (replace/split move several planes at once)
    def mk_cmp3(seed, N=N // 4):
        ks = jax.random.split(jax.random.key(seed), 4)
        ds = [
            jax.random.randint(ks[i], (N,), 0, 256, jnp.int32).astype(jnp.uint8)
            for i in range(3)
        ]
        keep = jax.random.randint(ks[3], (N,), 0, 5, jnp.int32) > 0
        return (*ds, keep)

    def run_compact3(s, d0, d1, d2, k):
        outs, _ = pr.compact_stream(k ^ (s > 2), [d0, d1, d2])
        return outs[0]

    timed("compact_stream_3xu8_67M", run_compact3, mk_cmp3,
          nbytes=2 * 3 * (N // 4))


if __name__ == "__main__":
    main()
