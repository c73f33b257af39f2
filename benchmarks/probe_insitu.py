"""In-situ fusion experiment: does optimization_barrier'ing a gather's
operand + indices (forcing an unfused, materialized gather) change the
cost of the REAL char_matrix program on the real corpus?

Legs:
  cm_plain   char_matrix internals as written (expected ~74 ms @16k rows)
  cm_bar     same graph with barriers before each gather
  pv_plain   padded_view 2-D byte gather as written
  pv_bar     padded_view with barriered idx
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import load_corpus
from custrings_tpu import column as colmod
from custrings_tpu.ops import layout

B = jax.lax.optimization_barrier


def cm_core(data, offsets, width, bar: bool):
    capacity = data.shape[0]
    j = jnp.arange(capacity, dtype=jnp.int32)
    real = j < offsets[-1]
    starts = ((data & 0xC0) != 0x80) & real
    cs0 = jnp.zeros(capacity + 1, jnp.int32).at[1:].set(
        jnp.cumsum(starts.astype(jnp.int32))
    )
    char_offsets = cs0[offsets]
    idx = jnp.where(starts, cs0[:-1], capacity)
    if bar:
        idx = B(idx)
    char_pos = jnp.zeros(capacity + 1, jnp.int32).at[idx].set(j)[:capacity]
    cpb = layout._codepoints_at_bytes(data)
    if bar:
        cpb, char_pos = B((cpb, char_pos))
    cps = cpb[char_pos]
    nch = char_offsets[1:] - char_offsets[:-1]
    k = jnp.arange(width, dtype=jnp.int32)[None, :]
    g = jnp.clip(char_offsets[:-1][:, None] + k, 0, capacity - 1)
    if bar:
        cps, g = B((cps, g))
    mat = jnp.where(k < nch[:, None], cps[g], 0)
    return mat, nch


def pv_core(data, offsets, width, bar: bool):
    capacity = data.shape[0]
    starts = offsets[:-1][:, None]
    lens = (offsets[1:] - offsets[:-1])[:, None]
    k = jnp.arange(width, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts + k, capacity - 1)
    if bar:
        data, idx = B((data, idx))
    vals = data[idx]
    return jnp.where(k < lens, vals, jnp.uint8(0))


def timed(name, core, col, width, bar):
    @partial(jax.jit, static_argnums=(3,))
    def loop(data, offsets, validity, K: int):
        def body(i, carry):
            d, acc = carry
            d = jax.lax.optimization_barrier(d)
            out = core(d, offsets, width, bar)
            out0 = out[0] if isinstance(out, tuple) else out
            acc = acc + jnp.sum(out0.astype(jnp.int32) % 5)
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
    timed("pv_plain", pv_core, col, width, False)
    timed("pv_bar", pv_core, col, width, True)
    timed("cm_plain", cm_core, col, width, False)
    timed("cm_bar", cm_core, col, width, True)
