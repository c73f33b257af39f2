"""Stage breakdown of the byte-domain delimiter split on the real chip.

Stages (cumulative, resident fori_loop protocol):
  s1_match   row_end + match + pk0 + counts + tok_off
  s2_plan    + broadcasts, dused, keep, k0, tid (all scans)
  s3_data    + output byte compaction scatter
  s4_full    + token-end scatter-max + cummax (the full op)
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
from custrings_tpu.column import StringColumn, cumsum0
from custrings_tpu.config import bucket_bytes
from custrings_tpu.ops import layout, segments
from custrings_tpu.ops.find import _match_mask


def split_stages(col, tcap, bcap, stage):
    import jax.numpy as jnp

    delim = " "
    p = jnp.asarray([ord(" ")], jnp.uint8)
    cap = col.capacity
    j = jnp.arange(cap, dtype=jnp.int32)
    row_end = segments.row_end_positions(col.offsets, cap)
    match = (
        _match_mask(col.data, p)
        & (j + 1 <= row_end)
        & layout.valid_byte_mask(col)
    )
    picked = match
    pk0 = cumsum0(picked)
    delims_per_row = segments.per_row_of_prefix(pk0, col.offsets)
    counts = jnp.where(col.validity, delims_per_row + 1, 0)
    tok_off = cumsum0(counts)
    if stage == 1:
        return tok_off[-1] + pk0[-1]

    def bcast(v):
        return segments.broadcast_rows_to_bytes(v, col.offsets, cap)

    dused = picked
    keep = (
        layout.valid_byte_mask(col)
        & ~dused
        & (bcast(col.validity.astype(jnp.int32)) == 1)
    )
    k0 = cumsum0(keep)
    u0 = cumsum0(dused)
    urank = u0[:cap] - bcast(u0[col.offsets[:-1]])
    tid = bcast(tok_off[:-1]) + urank
    if stage == 2:
        return k0[-1] + tid[0] + urank[-1]
    data = (
        jnp.zeros(bcap + 1, jnp.uint8)
        .at[jnp.where(keep, k0[:cap], bcap)]
        .set(jnp.where(keep, col.data, jnp.uint8(0)))[:bcap]
    )
    if stage == 3:
        return k0[-1] + tid[0] + data[0].astype(jnp.int32)
    e = (
        jnp.zeros(tcap + 1, jnp.int32)
        .at[jnp.where(keep, tid, tcap)]
        .max(jnp.where(keep, k0[:cap] + 1, 0))[:tcap]
    )
    byte_off = jnp.concatenate([jnp.zeros(1, jnp.int32), segments.cummax(e)])
    return byte_off[-1] + data[0].astype(jnp.int32) + tok_off[-1]


def timed(name, col, tcap, bcap, stage):
    @partial(jax.jit, static_argnums=(3,))
    def loop(data, offsets, validity, K: int):
        def body(i, carry):
            d, acc = carry
            d = jax.lax.optimization_barrier(d)
            c = StringColumn(d, offsets, validity)
            acc = acc + split_stages(c, tcap, bcap, stage)
            return d, acc

        _, acc = jax.lax.fori_loop(0, K, body, (data, jnp.zeros((), jnp.int32)))
        return acc

    args = (col.data, col.offsets, col.validity)
    loop(*args, 1).block_until_ready()
    loop(*args, 12).block_until_ready()
    t0 = time.perf_counter(); loop(*args, 1).block_until_ready(); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); loop(*args, 12).block_until_ready(); tk = time.perf_counter() - t0
    per = (tk - t1) / 11.0
    print(f"{name}: per-iter={per*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    lines = load_corpus(16384)
    col = colmod.from_host_strings(lines)
    jax.block_until_ready(col.data)
    tcap = bucket_bytes(col.capacity + col.size)
    bcap = col.capacity
    for st, nm in [(1, "s1_match"), (2, "s2_plan"), (3, "s3_data"), (4, "s4_full")]:
        timed(nm, col, tcap, bcap, st)
