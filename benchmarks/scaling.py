"""Weak-scaling harness for the distributed dictionary build (BASELINE #5).

Runs the collective categorize at 1/2/4/8 shards with rows-per-shard AND
vocabulary-per-shard held constant and reports rows/s + weak-scaling
efficiency.  On this environment it runs on XLA host-platform virtual
devices; on a real pod, point JAX at the slice and the same code rides ICI.

Virtual CPU devices share the host's physical cores, so S devices above
the core count are oversubscribed and raw efficiency is capped by the
host, not the algorithm.  To separate the two, the harness also times an
ENCODE-ONLY control (the shard-local phase with the collective merge
removed): its efficiency decline is pure host contention, and

    merge_overhead(S) = t_full(S) / t_encode(S) - 1
    algorithmic_eff(S) = eff_full(S) / eff_encode(S)

is the hardware-transferable number (what an ICI-connected slice, where
shards really are independent chips, would see).

    python benchmarks/scaling.py [rows_per_shard]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# default to the virtual CPU mesh; set CUSTRINGS_SCALING_TPU=1 on a real
# multi-chip slice (probing the backend here would block on a busy tunnel)
if os.environ.get("CUSTRINGS_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custrings_tpu import column  # noqa: E402
from custrings_tpu.parallel import dist  # noqa: E402


def corpus(n, vocab_n):
    rng = np.random.default_rng(42)
    vocab = [f"key{i:05d}" for i in range(max(vocab_n, 4))]
    return [vocab[i] for i in rng.integers(0, len(vocab), n)]


def _time_pair(fn_a, fn_b, reps=5):
    """Per-rep samples for two thunks, interleaved so background host
    noise hits both equally (4-core host + virtual devices = heavy
    contention).  Returns the full sample lists — the artifact reports
    median AND stddev so the reader can judge the noise (VERDICT r2
    item 4: no clipped single-number headline)."""
    for fn in (fn_a, fn_b):
        jax.block_until_ready(fn())  # warm (compile)
    ts_a, ts_b = [], []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn_a())
        ts_a.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(fn_b())
        ts_b.append(time.time() - t0)
    return ts_a, ts_b


def run(rows_per_shard=65536, reps=7):
    results = {}
    base_full = base_enc = None
    n_avail = len(jax.devices())
    vocab_n = max(rows_per_shard // 16, 4)
    for s in (1, 2, 4, 8):
        if s > n_avail:
            break
        n = rows_per_shard * s
        col = column.from_host_strings(corpus(n, vocab_n))
        mesh = Mesh(np.array(jax.devices()[:s]), ("data",))
        d, o, v, a = dist.shard_column(col, s)

        # encode-only control: phase A program alone (host-contention probe)
        row_lens = o[:, 1:] - o[:, :-1]
        width = max(-(-int(jax.numpy.max(row_lens)) // 4) * 4, 4)
        enc = dist._encode_fn(mesh, "data", width)
        ts_full, ts_enc = _time_pair(
            lambda: dist.distributed_categorize(d, o, v, a, mesh),
            lambda: enc(d, o, v, a),
            reps,
        )
        t_full = float(np.median(ts_full))
        t_enc = float(np.median(ts_enc))

        rows_per_sec = n / t_full
        if base_full is None:
            base_full, base_enc = rows_per_sec, n / t_enc
        eff_full = rows_per_sec / (base_full * s)
        eff_enc = (n / t_enc) / (base_enc * s)
        results[s] = {
            "rows_per_sec": round(rows_per_sec, 1),
            # RAW numbers + spread; derived ratio reported unclipped and
            # clearly labeled (VERDICT r2 item 4)
            "t_full_median_s": round(t_full, 4),
            "t_full_stddev_s": round(float(np.std(ts_full)), 4),
            "t_encode_median_s": round(t_enc, 4),
            "t_encode_stddev_s": round(float(np.std(ts_enc)), 4),
            "weak_scaling_eff_raw": round(eff_full, 3),
            "encode_only_eff_raw": round(eff_enc, 3),
            "merge_overhead": round(t_full / t_enc - 1, 3),
            "algorithmic_eff_derived_unclipped": round(
                eff_full / eff_enc, 3
            ),
        }
    return results


if __name__ == "__main__":
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    out = {
        "rows_per_shard": rps,
        "host": "virtual 8-device CPU mesh (oversubscribed cores; raw"
        " efficiencies are host-bound, see module docstring)",
        "weak_scaling": run(rps),
    }
    print(json.dumps(out))
