"""Char-level materialization: build columns whose rows are defined as a
sequence of output *characters* (each mapped to a codepoint), handling
UTF-8 width changes vectorized.

This replaces the reference's per-thread char loops in case.cu / translate /
substr-with-step: the TPU formulation enumerates all output characters of the
column at once, encodes them, and lays out bytes with cumsums.

Shapes: capacity-level arrays are bounded by input capacity where possible to
avoid syncs; the final byte buffer still goes through the standard bucketed
build (one sync, like the reference's size-pass barrier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..column import StringColumn, cumsum0
from ..config import bucket_bytes
from . import layout


def build_charwise(
    col: StringColumn,
    out_char_counts: jax.Array,
    cp_fn,
    validity: jax.Array | None = None,
) -> StringColumn:
    """Assemble a column from per-row output char counts and a codepoint map.

    cp_fn(rows, oc, valid) -> int32 codepoints, vectorized over the flat
    enumeration of output chars (oc = char index within the row).
    """
    if validity is None:
        validity = col.validity
    char_offsets = cumsum0(out_char_counts)
    total_chars = int(char_offsets[-1])
    ccap = bucket_bytes(total_chars)

    data, out_offsets = _charwise_impl(
        col, out_char_counts, char_offsets, cp_fn, ccap
    )
    return StringColumn(data, out_offsets, validity)


def _charwise_impl(col, counts, char_offsets, cp_fn, ccap):
    # enumerate output chars
    c = jnp.arange(ccap, dtype=jnp.int32)
    crows = layout.row_ids_from_offsets(char_offsets, ccap)
    oc = c - char_offsets[crows]
    cvalid = c < char_offsets[-1]
    cps = cp_fn(crows, oc, cvalid)
    bts, w = layout.encode_codepoints(cps)
    w = jnp.where(cvalid, w, 0)
    # byte offset of each output char
    cb0 = jnp.zeros(ccap + 1, jnp.int32).at[1:].set(jnp.cumsum(w))
    # per-row byte sizes -> row offsets
    row_char_start = char_offsets  # int32[rows+1] into char enumeration
    out_offsets = cb0[jnp.minimum(row_char_start, ccap)]
    total_bytes = int(out_offsets[-1])
    bcap = bucket_bytes(total_bytes)
    # scatter bytes: for each char, write its w bytes at cb0[c]
    data = jnp.zeros(bcap + 4, jnp.uint8)
    base = cb0[:-1]
    for t in range(4):
        sel = (t < w) & cvalid
        idx = jnp.where(sel, base + t, bcap + t)  # dump slot when unselected
        data = data.at[idx].set(jnp.where(sel, bts[:, t], jnp.uint8(0)))
    return data[:bcap], out_offsets


def input_codepoint_gather(col: StringColumn):
    """Helper returning fn(global_char_idx) -> codepoint for `col`."""
    cps = layout.codepoints(col)

    def get(idx):
        return cps[jnp.clip(idx, 0, cps.shape[0] - 1)]

    return get
