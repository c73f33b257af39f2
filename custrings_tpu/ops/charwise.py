"""Char-level materialization: build columns whose rows are defined as a
sequence of output *characters* (each mapped to a codepoint), handling
UTF-8 width changes vectorized.

This replaces the reference's per-thread char loops in case.cu / translate /
substr-with-step: the TPU formulation enumerates all output characters of the
column at once, encodes them, and lays out bytes with cumsums.

Execution = three compiled programs + two syncs (char total, byte total),
mirroring the reference's two-pass shape.  `body_fn` must be a MODULE-LEVEL
function (jit cache key) returning (counts, validity, cp_fn) when traced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..column import StringColumn, cumsum0, row_ids_from_offsets
from ..config import bucket_bytes
from . import layout


@partial(jax.jit, static_argnums=(1, 2))
def _phase_counts(col, body_fn, static_args, *args):
    counts, validity, _ = body_fn(col, *static_args, *args)
    return jnp.sum(counts.astype(jnp.int32))


def _char_plan(col, body_fn, static_args, ccap, *args):
    counts, validity, cp_fn = body_fn(col, *static_args, *args)
    char_offsets = cumsum0(counts)
    c = jnp.arange(ccap, dtype=jnp.int32)
    crows = row_ids_from_offsets(char_offsets, ccap)
    oc = c - char_offsets[crows]
    cvalid = c < char_offsets[-1]
    cps = cp_fn(crows, oc, cvalid)
    bts, w = layout.encode_codepoints(cps)
    w = jnp.where(cvalid, w, 0)
    cb0 = jnp.zeros(ccap + 1, jnp.int32).at[1:].set(jnp.cumsum(w))
    out_offsets = cb0[jnp.minimum(char_offsets, ccap)]
    return validity, cvalid, bts, w, cb0, out_offsets


@partial(jax.jit, static_argnums=(1, 2, 3))
def _phase_bytes(col, body_fn, static_args, ccap, *args):
    *_, out_offsets = _char_plan(col, body_fn, static_args, ccap, *args)
    return out_offsets[-1]


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _phase_write(col, body_fn, static_args, ccap, bcap, *args):
    validity, cvalid, bts, w, cb0, out_offsets = _char_plan(
        col, body_fn, static_args, ccap, *args
    )
    data = jnp.zeros(bcap + 4, jnp.uint8)
    base = cb0[:-1]
    for t in range(4):
        sel = (t < w) & cvalid
        idx = jnp.where(sel, base + t, bcap + t)  # dump slot when unselected
        data = data.at[idx].set(jnp.where(sel, bts[:, t], jnp.uint8(0)))
    return data[:bcap], out_offsets, validity


def run_charwise(
    body_fn, col: StringColumn, *args, static_args: tuple = ()
) -> StringColumn:
    """Drive a charwise op defined by module-level `body_fn`.

    body_fn(col, *static_args, *args); static_args must be hashable.
    """
    if col.size == 0:
        from ..column import empty_column

        return empty_column(0)
    total_chars = int(_phase_counts(col, body_fn, static_args, *args))
    ccap = bucket_bytes(total_chars)
    total_bytes = int(_phase_bytes(col, body_fn, static_args, ccap, *args))
    bcap = bucket_bytes(total_bytes)
    data, out_offsets, validity = _phase_write(
        col, body_fn, static_args, ccap, bcap, *args
    )
    return StringColumn(data, out_offsets, validity)


def build_charwise(
    col: StringColumn,
    out_char_counts: jax.Array,
    cp_fn,
    validity: jax.Array | None = None,
) -> StringColumn:
    """Legacy eager-closure entry point (still used by ops whose plan is
    computed outside; prefer run_charwise for hot paths)."""
    if validity is None:
        validity = col.validity

    def body(c, counts, val):
        return counts, val, cp_fn

    # cannot jit (cp_fn closure); execute phases eagerly
    total_chars = int(jnp.sum(out_char_counts.astype(jnp.int32)))
    ccap = bucket_bytes(total_chars)
    validity2, cvalid, bts, w, cb0, out_offsets = _char_plan(
        col, lambda c, *a: (out_char_counts, validity, cp_fn), (), ccap
    )
    total_bytes = int(out_offsets[-1])
    bcap = bucket_bytes(total_bytes)
    data = jnp.zeros(bcap + 4, jnp.uint8)
    base = cb0[:-1]
    for t in range(4):
        sel = (t < w) & cvalid
        idx = jnp.where(sel, base + t, bcap + t)
        data = data.at[idx].set(jnp.where(sel, bts[:, t], jnp.uint8(0)))
    return StringColumn(data[:bcap], out_offsets, validity)


def input_codepoint_gather(col: StringColumn):
    """Helper returning fn(global_char_idx) -> codepoint for `col`."""
    if col.size == 0:
        from ..column import empty_column

        return empty_column(0)
    cps = layout.codepoints(col)

    def get(idx):
        return cps[jnp.clip(idx, 0, cps.shape[0] - 1)]

    return get
