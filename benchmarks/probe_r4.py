"""Round-4 scale diagnosis probe (VERDICT r3 next-round item 1).

Measures, on the real chip, the primitives suspected of the 1M-tier
super-linear regression, at BOTH tier scales:

  cumsum_xla / cumsum_pl    XLA log-pass vs Pallas linear-pass prefix sum
  cummax_xla / cummax_pl    same for prefix max
  compact_roll              ops/shift_compact routing network, 1 u8 plane
  window                    ops/pallas_window ragged_gather (per-row DMA)

Protocol: FRESH device buffers per timing call (the relay memoizes
repeated (executable, args) pairs — probe_prims fresh-buffer protocol),
inputs generated on device (jax.random) so no host upload is timed,
fori_loop body depends on the carried scalar so XLA cannot hoist it.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, make_inputs, iters=6):
    """make_inputs(seed) -> tuple of DEVICE arrays (jitted, fresh per call)."""

    def body(args, K):
        def step(i, carry):
            s, a = carry
            out = fn(s, *a)
            red = jnp.max(out.astype(jnp.int32))
            return (red % 3).astype(jnp.int32), a

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.int32(0), args))
        return s

    try:
        # the axon relay defers execution: block_until_ready resolves the
        # handle without forcing compute, so every timing point FETCHES the
        # scalar result (device_get); the fixed round-trip floor cancels in
        # (tK - t1) / (iters - 1)
        j1 = jax.jit(lambda *a: body(a, 1))
        jk = jax.jit(lambda *a: body(a, iters))
        mk = jax.jit(make_inputs)

        def run(fn, args):
            return float(jax.device_get(fn(*args)))

        a = mk(17)
        jax.device_get([x[:1] for x in a])
        t0 = time.perf_counter()
        run(j1, a)
        c1 = time.perf_counter() - t0
        run(jk, a)  # warm both programs
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
        print(
            f"{name}: per-iter={per * 1e3:.3f}ms"
            f" (t1={t1 * 1e3:.1f} tK={tk * 1e3:.1f} compile1={c1:.0f}s)",
            flush=True,
        )
        del a, b1, b2
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"[:300], flush=True)


def main():
    from custrings_tpu.ops import pallas_scan as ps
    from custrings_tpu.ops import shift_compact
    from custrings_tpu.ops import pallas_window as pw

    print(f"backend={jax.default_backend()}", flush=True)

    for tag, N in (("4M", 1 << 22), ("268M", 1 << 28)):
        def mk_i32(seed, N=N):
            k = jax.random.key(seed)
            return (jax.random.randint(k, (N,), 0, 50, jnp.int32),)

        timed(f"cumsum_xla_{tag}",
              lambda s, x: jnp.cumsum(x + s), mk_i32)
        timed(f"cumsum_pl_{tag}",
              lambda s, x: ps.cumsum_i32(x + s, force=True), mk_i32)
        timed(f"cummax_xla_{tag}",
              lambda s, x: jax.lax.cummax(x + s, axis=0), mk_i32)
        timed(f"cummax_pl_{tag}",
              lambda s, x: ps.cummax_i32(x + s, force=True), mk_i32)

        def mk_cmp(seed, N=N):
            k1, k2 = jax.random.split(jax.random.key(seed))
            return (
                jax.random.randint(k1, (N,), 0, 256, jnp.int32).astype(
                    jnp.uint8
                ),
                jax.random.randint(k2, (N,), 0, 5, jnp.int32) > 0,
            )

        def run_compact(s, d, k):
            (out,), _ = shift_compact.compact_arrays(k ^ (s > 2), [d])
            return out

        timed(f"compact_roll_{tag}", run_compact, mk_cmp, iters=3)

    for tag, rows in (("16k", 1 << 14), ("1M", 1 << 20)):
        cap = rows * 200

        def mk_win(seed, rows=rows, cap=cap):
            k1, k2 = jax.random.split(jax.random.key(seed))
            lens = jax.random.randint(k1, (rows,), 1, 200, jnp.int32)
            off = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(lens)[:-1]]
            )
            return (
                jax.random.randint(k2, (cap,), 0, 256, jnp.int32).astype(
                    jnp.uint8
                ),
                off,
            )

        timed(
            f"window_{tag}",
            lambda s, d, st: pw.ragged_gather_i32(d, st + (s % 2), 256),
            mk_win,
            iters=3,
        )


if __name__ == "__main__":
    main()
