"""Weak-scaling harness for the distributed dictionary build (BASELINE #5).

Runs the collective categorize at 1/2/4/8 shards with rows-per-shard held
constant and reports rows/s + weak-scaling efficiency.  On this environment
it runs on XLA host-platform virtual devices; on a real pod, point
JAX at the slice and the same code rides ICI.

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


def corpus(n):
    rng = np.random.default_rng(42)
    vocab = [f"key{i:05d}" for i in range(max(n // 16, 4))]
    return [vocab[i] for i in rng.integers(0, len(vocab), n)]


def run(rows_per_shard=4096):
    results = {}
    base = None
    n_avail = len(jax.devices())
    for s in (1, 2, 4, 8):
        if s > n_avail:
            break
        n = rows_per_shard * s
        col = column.from_host_strings(corpus(n))
        mesh = Mesh(np.array(jax.devices()[:s]), ("data",))
        d, o, v, a = dist.shard_column(col, s)
        vals, ng = dist.distributed_categorize(d, o, v, a, mesh)
        vals.block_until_ready()  # warm
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            vals, ng = dist.distributed_categorize(d, o, v, a, mesh)
        vals.block_until_ready()
        dt = (time.time() - t0) / reps
        rows_per_sec = n / dt
        if base is None:
            base = rows_per_sec
        results[s] = {
            "rows_per_sec": round(rows_per_sec, 1),
            "weak_scaling_eff": round(rows_per_sec / (base * s), 3),
        }
    return results


if __name__ == "__main__":
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(json.dumps({"weak_scaling": run(rps)}))
