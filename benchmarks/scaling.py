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
    """Min-of-reps for two thunks, interleaved so background host noise
    hits both equally (4-core host + virtual devices = heavy contention;
    the min is the least-contended, most hardware-like sample)."""
    for fn in (fn_a, fn_b):
        jax.block_until_ready(fn())  # warm (compile)
    best_a = best_b = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn_a())
        best_a = min(best_a, time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(fn_b())
        best_b = min(best_b, time.time() - t0)
    return best_a, best_b


def run(rows_per_shard=4096, reps=5):
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
        t_full, t_enc = _time_pair(
            lambda: dist.distributed_categorize(d, o, v, a, mesh),
            lambda: enc(d, o, v, a),
            reps,
        )

        rows_per_sec = n / t_full
        if base_full is None:
            base_full, base_enc = rows_per_sec, n / t_enc
        eff_full = rows_per_sec / (base_full * s)
        eff_enc = (n / t_enc) / (base_enc * s)
        results[s] = {
            "rows_per_sec": round(rows_per_sec, 1),
            "weak_scaling_eff": round(eff_full, 3),
            "encode_only_eff": round(eff_enc, 3),
            "merge_overhead": round(t_full / t_enc - 1, 3),
            "algorithmic_eff": round(min(eff_full / eff_enc, 1.0), 3),
        }
    return results


if __name__ == "__main__":
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(json.dumps({"rows_per_shard": rps, "weak_scaling": run(rps)}))
