"""Headline benchmark: strings/s/chip on split + regex + replace +
nvcategory-build over the reference tweets corpus (BASELINE.md configs 1-3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup over pandas Series.str doing the identical ops on the
same data on this host's CPU (the reference publishes no numbers —
BASELINE.md: baseline is self-measured; pandas is the natural CPU yardstick).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: remote (tunneled) TPU compiles run tens of
# seconds each; caching them on disk makes repeat bench runs start warm.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
import jax as _jax_cfg

_jax_cfg.config.update("jax_compilation_cache_dir", _CACHE)
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_jax_cfg.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def load_corpus(n_rows=8192, max_bytes=256):
    import os

    path = "/root/reference/data/tweets.csv"
    if os.path.exists(path):
        lines = open(path, encoding="utf-8").read().splitlines()[1:]
    else:
        lines = ["fallback tweet #data @user %d" % i for i in range(512)]
    out = []
    while len(out) < n_rows:
        for s in lines:
            b = s.encode("utf-8")[:max_bytes]
            out.append(b.decode("utf-8", "ignore"))
            if len(out) >= n_rows:
                break
    return out


def bench_tpu(lines, iters=3):
    import jax

    from custrings_tpu import column
    from custrings_tpu.ops import modify, split
    from custrings_tpu.ops.unique import dictionary_encode
    from custrings_tpu.regex import ops as rx

    col = column.from_host_strings(lines)

    def run_once():
        m = rx.contains_re(col, r"#\w+")
        r = modify.replace_literal(col, "the", "THE")
        tc = split.split_record(col, " ")
        keys, values = dictionary_encode(col)
        jax.block_until_ready((m, r.data, tc.tokens.data, values))

    run_once()  # warmup/compile
    t0 = time.time()
    for _ in range(iters):
        run_once()
    dt = (time.time() - t0) / iters
    return dt


def bench_pandas(lines, iters=3):
    import pandas as pd

    s = pd.Series(lines)

    def run_once():
        _ = s.str.contains(r"#\w+", regex=True)
        _ = s.str.replace("the", "THE", regex=False)
        _ = s.str.split(" ")
        _ = s.astype("category").cat.codes

    run_once()
    t0 = time.time()
    for _ in range(iters):
        run_once()
    return (time.time() - t0) / iters


def main():
    # default kept at 16384 so repeated runs hit the remote-compile cache
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    lines = load_corpus(n_rows)
    ops = 4  # contains + replace + split + categorize

    # Headline (round 2): device-resident throughput.  The axon relay in
    # this environment transports materialized outputs at ~13 MB/s with a
    # ~38 ms round-trip floor (BASELINE.md:54-63), so end-to-end numbers
    # here measure the tunnel, not the chip.  benchmarks/resident.py runs
    # K iterations of the same 4-op pipeline INSIDE one jitted program
    # (optimization_barrier'd fori_loop, two scalars leave the device) and
    # reports (t_K - t_1)/(K-1) — the chip's own execution time, the
    # number a directly-attached deployment would see.
    from benchmarks.resident import measure

    res = measure(lines, K=24)
    dt_pd = bench_pandas(lines)
    dt_e2e = bench_tpu(lines)
    print(
        json.dumps(
            {
                "metric": "strings_per_sec_chip_resident",
                "value": round(res["strings_per_sec"], 1),
                "unit": "strings/s device-resident (split+regex+replace+categorize)",
                "vs_baseline": round(dt_pd / res["sec_per_iter"], 3),
                "e2e_relay_strings_per_sec": round(ops * len(lines) / dt_e2e, 1),
                "e2e_relay_vs_baseline": round(dt_pd / dt_e2e, 3),
                "note": "vs_baseline = pandas Series.str wall time / device-resident time; e2e_* includes the axon relay transport (~13 MB/s tunnel, BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
