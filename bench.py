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
# The dir is salted by a hash of the compute-path sources: round-3
# measurement found a shared cache can serve a STALE/colliding executable
# across code versions (probe runs read absurd ~0 ms timings until the
# cache was dropped).  Content (not commit) salting keeps the cache warm
# across doc/test-only commits.
def _cache_dir():
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for base in ("custrings_tpu", "benchmarks"):
        for dirpath, dirnames, filenames in sorted(os.walk(
            os.path.join(root, base)
        )):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(f.read())
    return os.path.join(root, ".jax_cache", h.hexdigest()[:16])


_CACHE = _cache_dir()
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


HBM_GBPS = 819.0  # v5e HBM bandwidth (roofline denominator)


def _op_bytes(lines, which: str) -> float:
    """Logical bytes moved per op iteration (documented accounting:
    input bytes read + output bytes/offsets written; sort passes in
    categorize counted once each way over the 64-byte key prefix)."""
    cap = sum(len(s.encode()) for s in lines)
    n = len(lines)
    ntok = sum(s.count(" ") + 1 for s in lines)
    return {
        "charmatrix": cap * 2.0,
        "contains": cap * 1.0,
        "replace": cap * 2.0,
        "replace_grow": cap * 2.0,
        "split": cap * 2.0 + 8.0 * ntok,
        "categorize": 2.0 * n * min(64, max(len(s.encode()) for s in lines)),
        "spans_safe": cap * 1.0,
        "spans_ambig": cap * 1.0,
        "pipeline": cap * 6.0 + 8.0 * ntok,
    }[which]


def _tier_cleanup():
    """Free everything a finished tier can pin before the next tier
    allocates: python garbage (dead columns + their memoized planes) and
    the jit caches, whose executables hold device constants.  Recompiles
    in the next tier reload from the persistent disk cache.  Round-4's
    driver bench OOMed the 4M tier after the 16k+1M tiers had run in the
    same process (VERDICT r4 'what's missing' #3)."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    gc.collect()


def _tier(lines, K_pipe: int, K_ops: int, ops=None):
    """Per-tier measurement: resident pipeline + per-op ms/GBps/roofline."""
    from benchmarks.resident import measure, measure_ops

    per_op = measure_ops(lines, K=K_ops, ops=ops)  # per-op first: each is
    # individually fault-isolated, so a pipeline-program failure can't
    # cost the per-op evidence
    ops_out = {}
    for which, sec in per_op.items():
        if isinstance(sec, (Exception, str)):  # per-op failure, not fatal
            msg = sec if isinstance(sec, str) else f"{type(sec).__name__}: {sec}"
            ops_out[which] = {"error": msg[:200]}
            continue
        if sec < 2e-4:
            # below the relay timing noise floor (the fused one-pass ops
            # at the 16k tier finish in tens of us): record the bound
            # honestly instead of a noise-divided GB/s.  GBps/roofline
            # stay present (null) so per-op records keep one schema.
            ops_out[which] = {"ms": round(sec * 1e3, 3), "GBps": None,
                              "roofline_pct": None,
                              "below_noise_floor": True}
            continue
        gbps = _op_bytes(lines, which) / sec / 1e9
        ops_out[which] = {
            "ms": round(sec * 1e3, 3),
            "GBps": round(gbps, 2),
            "roofline_pct": round(100.0 * gbps / HBM_GBPS, 2),
        }
    tier = {"rows": len(lines), "per_op": ops_out}
    if K_pipe <= 0:  # per-op-only tier (the 4M tier skips the pipeline)
        return None, tier
    try:
        res = measure(lines, K=K_pipe)
    except Exception as e:
        tier["pipeline_error"] = f"{type(e).__name__}: {e}"[:200]
        return None, tier
    gb_pipe = _op_bytes(lines, "pipeline") / res["sec_per_iter"] / 1e9
    tier.update(
        pipeline_ms=round(res["sec_per_iter"] * 1e3, 3),
        pipeline_GBps=round(gb_pipe, 2),
        pipeline_roofline_pct=round(100.0 * gb_pipe / HBM_GBPS, 2),
    )
    return res, tier


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
    res, tier16 = _tier(lines, K_pipe=24, K_ops=16)
    if res is None:  # the 16k pipeline IS the headline: fail loudly
        raise RuntimeError(tier16.get("pipeline_error", "16k tier failed"))
    dt_pd = bench_pandas(lines)
    dt_e2e = bench_tpu(lines)

    # Round-3: a 1M-row (~200 MB) tier — byte-bound behaviour at a size
    # where fixed per-kernel overheads are amortized (VERDICT r2 item 2).
    tier1m = None
    vs_pd_1m = None
    if os.environ.get("CUSTRINGS_BENCH_1M", "1") != "0":
        _tier_cleanup()
        try:
            lines1m = load_corpus(1 << 20)
            # round 4: the 1M tier also runs the spans engines
            # (VERDICT r3 item 4) — findall/extract/replace_re all ride
            # these paths.  replace_grow is the size-changing literal
            # replace (VERDICT r4 item 4): the routing writers, not the
            # same-length elementwise fast path.
            _res1m, tier1m = _tier(
                lines1m, K_pipe=4, K_ops=3,
                ops=["charmatrix", "contains", "replace", "replace_grow",
                     "split", "categorize", "spans_safe", "spans_ambig"],
            )
            if _res1m is not None:
                vs_pd_1m = round(
                    bench_pandas(lines1m, iters=1) / _res1m["sec_per_iter"],
                    3,
                )
                tier1m["vs_baseline"] = vs_pd_1m
            del lines1m
        except Exception as e:  # 1M tier must not kill the headline
            tier1m = {"error": f"{type(e).__name__}: {e}"[:200]}

    # Round-4: a genuinely HBM-scale tier (VERDICT r3 item 5) — 4M rows
    # (~0.9 GB), BASELINE config 5's single-chip surrogate.  categorize
    # rows/s is its own headline there (BASELINE's metric definition).
    tier4m = None
    if os.environ.get("CUSTRINGS_BENCH_4M", "1") != "0":
        _tier_cleanup()
        try:
            lines4m = load_corpus(1 << 22)
            _res4m, tier4m = _tier(
                lines4m, K_pipe=0, K_ops=2,
                ops=["charmatrix", "contains", "replace", "replace_grow",
                     "split", "categorize"],
            )
            cat = tier4m.get("per_op", {}).get("categorize", {})
            if "ms" in cat:
                tier4m["categorize_rows_per_sec"] = round(
                    (1 << 22) / (cat["ms"] / 1e3), 1
                )
            del lines4m
        except Exception as e:
            tier4m = {"error": f"{type(e).__name__}: {e}"[:200]}

    full = {
        "metric": "strings_per_sec_chip_resident",
        "value": round(res["strings_per_sec"], 1),
        "unit": "strings/s device-resident (split+regex+replace+categorize)",
        "vs_baseline": round(dt_pd / res["sec_per_iter"], 3),
        "e2e_relay_strings_per_sec": round(ops * len(lines) / dt_e2e, 1),
        "e2e_relay_vs_baseline": round(dt_pd / dt_e2e, 3),
        "tier_16k": tier16,
        "tier_1m": tier1m,
        "tier_4m": tier4m,
        "note": "vs_baseline = pandas Series.str wall time / device-resident time; per-op GBps = logical bytes (bench._op_bytes) / resident time; roofline_pct vs 819 GB/s v5e HBM; e2e_* includes the axon relay transport (~13 MB/s tunnel, BASELINE.md). Per-column precomputes (tail plane, padded char matrix) ride as resident args where production memoizes them on the column (budget-gated); charmatrix measures the view build as its own line",
    }
    # Full detail first (and to a file), compact headline LAST: the
    # driver records only the final ~2000 chars of output, and round-4's
    # one-line dump lost the headline to the truncation (VERDICT r4
    # weak #6).
    full_line = json.dumps(full)
    print(full_line)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_full.json"), "w"
        ) as f:
            f.write(full_line + "\n")
    except OSError:
        pass

    def _brief(tier):
        if not isinstance(tier, dict):
            return tier
        if "error" in tier:
            return {"error": tier["error"][:80]}
        out = {}
        for op, rec in tier.get("per_op", {}).items():
            if "error" in rec:
                out[op] = "ERR"
            elif rec.get("GBps") is not None:
                out[op] = rec["GBps"]
            else:
                out[op] = f"{rec['ms']}ms"
        if "pipeline_GBps" in tier:
            out["pipeline"] = tier["pipeline_GBps"]
        if "categorize_rows_per_sec" in tier:
            out["cat_rows_s"] = tier["categorize_rows_per_sec"]
        if "vs_baseline" in tier:
            out["vs_pd"] = tier["vs_baseline"]
        return out

    headline = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "strings/s (resident; tiers=GB/s per op)",
        "vs_baseline": full["vs_baseline"],
        "e2e_relay_vs_baseline": full["e2e_relay_vs_baseline"],
        "tier_16k_GBps": _brief(tier16),
        "tier_1m_GBps": _brief(tier1m),
        "tier_4m_GBps": _brief(tier4m),
        "detail": "BENCH_full.json",
    }
    line = json.dumps(headline)
    if len(line) > 1900:  # stay under the driver's tail cap, whole
        headline.pop("tier_16k_GBps")
        line = json.dumps(headline)
    print(line)


if __name__ == "__main__":
    main()
