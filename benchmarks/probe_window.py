"""Hardware check: pallas ragged_gather vs XLA padded_view 2-D gather.

Validates bit-equality on the real corpus, then times both with the
in-situ fori_loop protocol (K=1 vs K=12 on the same resident buffers).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import load_corpus
from custrings_tpu import column as colmod
from custrings_tpu.ops import layout
from custrings_tpu.ops.pallas_window import ragged_gather


def xla_padded(data, offsets, width):
    capacity = data.shape[0]
    starts = offsets[:-1][:, None]
    lens = (offsets[1:] - offsets[:-1])[:, None]
    k = jnp.arange(width, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts + k, capacity - 1)
    return jnp.where(k < lens, data[idx], jnp.uint8(0))


def pallas_padded(data, offsets, width):
    raw = ragged_gather(data, offsets[:-1], width)
    lens = (offsets[1:] - offsets[:-1])[:, None]
    k = jnp.arange(width, dtype=jnp.int32)[None, :]
    return jnp.where(k < lens, raw, jnp.uint8(0))


def timed(name, core, col, width):
    @partial(jax.jit, static_argnums=(3,))
    def loop(data, offsets, validity, K: int):
        def body(i, carry):
            d, acc = carry
            d = jax.lax.optimization_barrier(d)
            out = core(d, offsets, width)
            acc = acc + jnp.sum(out.astype(jnp.int32) % 5)
            return d, acc

        _, acc = jax.lax.fori_loop(0, K, body, (data, jnp.zeros((), jnp.int32)))
        return acc

    args = (col.data, col.offsets, col.validity)
    loop(*args, 1).block_until_ready()
    loop(*args, 12).block_until_ready()
    t0 = time.perf_counter(); loop(*args, 1).block_until_ready(); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); loop(*args, 12).block_until_ready(); tk = time.perf_counter() - t0
    per = (tk - t1) / 11.0
    print(f"{name}: per-iter={per*1e3:.2f}ms (t1={t1*1e3:.1f} t12={tk*1e3:.1f})", flush=True)


if __name__ == "__main__":
    lines = load_corpus(16384)
    col = colmod.from_host_strings(lines)
    jax.block_until_ready(col.data)
    width = layout.max_row_bytes(col)
    print(f"width={width} cap={col.capacity}", flush=True)
    a = jax.device_get(xla_padded(col.data, col.offsets, width))
    b = jax.device_get(pallas_padded(col.data, col.offsets, width))
    print("parity:", (a == b).all(), flush=True)
    timed("xla_padded", xla_padded, col, width)
    timed("pallas_padded", pallas_padded, col, width)
