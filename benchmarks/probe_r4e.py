"""Verify + time the round-4 replace fast path on hardware.

_replace_same_len with precomputed row bounds and the m-way rolled
select should be ONE fused elementwise pass; correctness is checked
against Python str.replace on a corpus slice before timing.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

import jax


def main():
    from bench import load_corpus
    from custrings_tpu.column import from_host_strings, to_host_strings
    from custrings_tpu.ops import modify

    print(f"backend={jax.default_backend()}", flush=True)

    # correctness on a small slice (with overlap-prone + bordered pats)
    small = load_corpus(512)
    cs = from_host_strings(small)
    for pat, rep in (("the", "THE"), ("aa", "xy"), ("t", "Q")):
        got = to_host_strings(modify.replace_literal(cs, pat, rep))
        want = [s.replace(pat, rep) for s in small]
        ok = got == want
        print(f"replace {pat!r}->{rep!r}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            bad = next(i for i in range(len(want)) if got[i] != want[i])
            print(f"  row {bad}: got {got[bad]!r} want {want[bad]!r}", flush=True)

    lines = load_corpus(16384) * 64  # 1M tier
    col = from_host_strings(lines)
    jax.block_until_ready(col.data)
    nbytes = sum(len(s.encode()) for s in lines)

    r = modify.replace_literal(col, "the", "THE")
    jax.block_until_ready(r.data)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r = modify.replace_literal(col, "the", "THE")
        jax.block_until_ready(r.data)
    per = (time.perf_counter() - t0) / iters
    print(
        f"replace 1M-tier: {per * 1e3:.1f}ms"
        f" {2 * nbytes / per / 1e9:.1f} GB/s logical",
        flush=True,
    )


if __name__ == "__main__":
    main()
