"""Pallas TPU kernel: MurmurHash3_32 (seed 31) over string rows.

The jnp fallback (ops/convert.hash_mm3) runs the block loop as XLA HLO over
the padded view in HBM; this kernel tiles rows into VMEM and runs the whole
per-row block loop on-chip — one HBM read of the tile, no intermediate
state traffic.  Reference semantics: custring.inl:164-231.

Used automatically for columns whose padded view fits the tile budget;
interpret mode keeps it testable on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import use_interpret_mode

ROW_TILE = 256


def _hash_kernel(view_ref, lens_ref, out_ref):
    import jax.numpy as jnp

    view = view_ref[:]  # [TILE, W4] uint32 (bytes widened)
    lens = lens_ref[:]  # [TILE]
    T, W = view.shape
    nblocks = W // 4
    blocks = (
        view[:, 0::4]
        | (view[:, 1::4] << 8)
        | (view[:, 2::4] << 16)
        | (view[:, 3::4] << 24)
    )  # [TILE, nblocks]
    c1 = jnp.uint32(0xCC9E2D51)
    c2 = jnp.uint32(0x1B873593)

    def rotl(x, r):
        return (x << r) | (x >> (32 - r))

    lens_u = lens.astype(jnp.uint32)
    row_blocks = lens_u // 4

    def body(i, h1):
        k1 = blocks[:, i]
        k1 = k1 * c1
        k1 = rotl(k1, 15)
        k1 = k1 * c2
        h = h1 ^ k1
        h = rotl(h, 13)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
        return jnp.where(i < row_blocks, h, h1)

    h1 = jax.lax.fori_loop(0, nblocks, body, jnp.full((T,), 31, jnp.uint32))

    # tail bytes
    tail_start = (row_blocks * 4).astype(jnp.int32)
    rem = (lens_u & 3).astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)

    def tail_byte(off):
        sel = col_ids == (tail_start + off)[:, None]
        return jnp.sum(jnp.where(sel, view, 0), axis=1).astype(jnp.uint32)

    k1 = jnp.zeros((T,), jnp.uint32)
    k1 = jnp.where(rem >= 3, k1 ^ (tail_byte(2) << 16), k1)
    k1 = jnp.where(rem >= 2, k1 ^ (tail_byte(1) << 8), k1)
    k1 = jnp.where(rem >= 1, k1 ^ tail_byte(0), k1)
    k1 = k1 * c1
    k1 = rotl(k1, 15)
    k1 = k1 * c2
    h1 = jnp.where(rem > 0, h1 ^ k1, h1)
    h1 = h1 ^ lens_u
    h1 = h1 ^ (h1 >> 16)
    h1 = h1 * jnp.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> 13)
    h1 = h1 * jnp.uint32(0xC2B2AE35)
    h1 = h1 ^ (h1 >> 16)
    out_ref[:] = h1


@partial(jax.jit, static_argnums=(2,))
def hash_rows_pallas(view_u32, lens, interpret: bool):
    """view_u32: uint32[N, W4] byte-widened padded view (W4 % 4 == 0)."""
    from jax.experimental import pallas as pl

    N, W = view_u32.shape
    grid = (-(-N // ROW_TILE),)
    return pl.pallas_call(
        _hash_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, W), lambda i: (i, 0)),
            pl.BlockSpec((ROW_TILE,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE,), lambda i: (i,)),
        interpret=interpret,
    )(view_u32, lens)


def hash_mm3_pallas(col) -> jax.Array:
    from . import layout

    w = layout.max_row_bytes(col)
    w4 = -(-w // 4) * 4
    view = layout.padded_view(col, w4).astype(jnp.uint32)
    lens = col.lengths().astype(jnp.uint32)
    return hash_rows_pallas(view, lens, use_interpret_mode())
