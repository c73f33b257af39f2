"""Headline benchmark: strings/s/chip on split + regex + replace +
nvcategory-build over the reference tweets corpus (BASELINE.md configs 1-3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup over pandas Series.str doing the identical ops on the
same data on this host's CPU (the reference publishes no numbers —
BASELINE.md: baseline is self-measured; pandas is the natural CPU yardstick).
"""

import json
import sys
import time

import numpy as np


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
    dt_tpu = bench_tpu(lines)
    dt_pd = bench_pandas(lines)
    strings_per_sec = ops * len(lines) / dt_tpu
    print(
        json.dumps(
            {
                "metric": "strings_per_sec_chip",
                "value": round(strings_per_sec, 1),
                "unit": "strings/s (split+regex+replace+categorize)",
                "vs_baseline": round(dt_pd / dt_tpu, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
