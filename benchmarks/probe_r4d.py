"""Round-4 end-to-end decomposition: where do the 1M-tier ops spend time?

probe_r4c showed the streaming movers are VPU-routing-bound (~7.1G
lanes/s at ANY lane width — 13.8 GB/s on u8 planes, 57 GB/s on i32),
while whole ops report 2-10 GB/s logical: most op time is OUTSIDE the
movers.  This probe times split's three phases (counts / extents /
write) and replace's plan-vs-write on the bench corpus at the 1M tier,
so the next optimization targets the measured dominant stage.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_phase(name, fn, *args, iters=3):
    try:
        outs = fn(*args)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = fn(*args)
            jax.block_until_ready(outs)
        per = (time.perf_counter() - t0) / iters
        print(f"{name}: {per * 1e3:.1f}ms", flush=True)
        return outs
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"[:300], flush=True)
        return None


def main():
    sys.path.insert(0, "/root/repo")
    from bench import load_corpus
    from custrings_tpu.column import from_host_strings
    from custrings_tpu.ops import split as sp
    from custrings_tpu.ops import modify
    from custrings_tpu.ops.split import (
        _ragged_counts,
        _ragged_extents,
        _ragged_write,
        _delim_extents_stream,
    )
    from custrings_tpu.config import bucket_bytes

    print(f"backend={jax.default_backend()}", flush=True)

    lines = load_corpus(16384) * 64  # 1M rows, bench tier_1m corpus
    t0 = time.perf_counter()
    col = from_host_strings(lines)
    jax.block_until_ready(col.data)
    print(
        f"ingest 1M rows: {time.perf_counter() - t0:.1f}s cap={col.capacity}",
        flush=True,
    )

    # --- split phases (over-threshold path: counts -> extents -> write)
    body = _delim_extents_stream
    t0 = time.perf_counter()
    tok = sp.split_record(col, " ")
    jax.block_until_ready(tok.tokens.data)
    print(f"split e2e (cold): {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    tok = sp.split_record(col, " ")
    jax.block_until_ready(tok.tokens.data)
    print(f"split e2e (warm): {(time.perf_counter() - t0) * 1e3:.1f}ms", flush=True)

    # now phase by phase with the same body the production path picks
    sargs, dargs = (), ()
    sig_static, sig_args = None, None
    # _delim_body static args: (delim, maxsplit, from_right)
    st = (" ", -1, False)
    total_tokens = None
    out = bench_phase(
        "split counts", lambda: int(_ragged_counts(col, body, st))
    )
    total_tokens = out if out is not None else 0
    tcap = bucket_bytes(total_tokens)
    ext = bench_phase(
        "split extents",
        lambda: _ragged_extents(col, body, st, tcap),
    )
    if ext is not None:
        tok_off, starts, byte_off = ext
        total_bytes = int(byte_off[-1])
        bcap = bucket_bytes(total_bytes)
        bench_phase(
            "split write", lambda: _ragged_write(col, starts, byte_off, bcap)
        )

    # --- replace plan vs write (same-length literal: the bench op)
    t0 = time.perf_counter()
    r = modify.replace_literal(col, "the", "THE")
    jax.block_until_ready(r.data)
    print(f"replace e2e (cold): {time.perf_counter() - t0:.1f}s", flush=True)
    bench_phase(
        "replace e2e",
        lambda: jax.block_until_ready(
            modify.replace_literal(col, "the", "THE").data
        ),
    )


if __name__ == "__main__":
    main()
