"""Resident-loop timing of the round-4 replace fast path: separates true
device time from per-dispatch relay overhead (fori_loop protocol from
probe_r4).  Also times a fence-only and match-only variant to apportion
the remaining cost."""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(name, fn, make_inputs, iters=6, nbytes=None):
    def body(args, K):
        def step(i, carry):
            s, a = carry
            out = fn(s, *a)
            red = jnp.max(out[: 2**10].astype(jnp.int32))
            return (red % 3).astype(jnp.int32), a

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.int32(0), args))
        return s

    try:
        j1 = jax.jit(lambda *a: body(a, 1))
        jk = jax.jit(lambda *a: body(a, iters))

        def run(f, args):
            return float(jax.device_get(f(*args)))

        a = make_inputs(17)
        jax.block_until_ready(a)
        run(j1, a)
        run(jk, a)
        b1 = make_inputs(101)
        jax.block_until_ready(b1)
        t0 = time.perf_counter()
        run(j1, b1)
        t1 = time.perf_counter() - t0
        b2 = make_inputs(202)
        jax.block_until_ready(b2)
        t0 = time.perf_counter()
        run(jk, b2)
        tk = time.perf_counter() - t0
        per = (tk - t1) / (iters - 1)
        gbs = f" {nbytes / per / 1e9:.1f}GB/s-logical" if nbytes else ""
        print(f"{name}: per-iter={per * 1e3:.3f}ms{gbs}", flush=True)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"[:300], flush=True)


def main():
    from bench import load_corpus
    from custrings_tpu.column import from_host_strings, StringColumn
    from custrings_tpu.ops import modify, layout
    from custrings_tpu.ops.find import _pat_array, _match_mask

    print(f"backend={jax.default_backend()}", flush=True)

    lines = load_corpus(16384) * 64
    col = from_host_strings(lines)
    jax.block_until_ready(col.data)
    rb = layout.row_bounds_planes(col)
    jax.block_until_ready(rb)
    nbytes = sum(len(s.encode()) for s in lines)
    p = _pat_array(b"the")
    r = _pat_array(b"THE")

    def mk(seed):
        # fresh data buffer: xor with a seed byte (cheap, on device)
        d = (col.data ^ jnp.uint8(seed % 2)) ^ jnp.uint8(seed % 2)
        return (d, col.offsets, col.validity, rb[1])

    def full(s, d, off, v, re_):
        c = StringColumn(d ^ s.astype(jnp.uint8) ^ s.astype(jnp.uint8), off, v)
        data, _ = modify._replace_same_len(c, re_, p, r, 3, False, -1)
        return data

    timed("same_len_full", full, mk, nbytes=2 * nbytes)

    def match_only(s, d, off, v, re_):
        return _match_mask(d ^ s.astype(jnp.uint8), p).astype(jnp.uint8)

    timed("match_only", match_only, mk, nbytes=nbytes)

    def fence_only(s, d, off, v, re_):
        j = jnp.arange(d.shape[0], dtype=jnp.int32)
        return ((j + 3 <= re_) & (d > s.astype(jnp.uint8))).astype(jnp.uint8)

    timed("fence_only", fence_only, mk, nbytes=nbytes)


if __name__ == "__main__":
    main()
