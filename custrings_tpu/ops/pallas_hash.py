"""Pallas TPU kernel: MurmurHash3_32 (seed 31) over string rows.

The jnp fallback (ops/convert.hash_mm3) runs the block loop as XLA HLO over
the padded view in HBM; this kernel tiles rows into VMEM and runs the whole
per-row block loop on-chip.  Reference semantics: custring.inl:164-231.

Mosaic notes: little-endian 32-bit block packing and the tail-byte combine
are precomputed with XLA outside the kernel (strided uint8 slicing doesn't
lower in Mosaic); rank-1 row vectors are carried as [grid, TILE] 2-D tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import use_interpret_mode

ROW_TILE = 256


def _hash_kernel(blocks_ref, lens_ref, tailk1_ref, out_ref):
    from jax.experimental import pallas as pl

    gi = pl.program_id(0)
    T, NB = blocks_ref.shape
    lens = lens_ref[pl.ds(gi, 1), :][0, :]  # [T]
    tail_k1 = tailk1_ref[pl.ds(gi, 1), :][0, :]
    c1 = jnp.uint32(0xCC9E2D51)
    c2 = jnp.uint32(0x1B873593)

    def rotl(x, r):
        return (x << r) | (x >> (32 - r))

    row_blocks = lens // 4
    from jax.experimental.pallas import tpu as pltpu

    def body(i, carry):
        h1, blocks = carry
        # dynamic lane-dim slicing is not allowed in Mosaic: rotate the
        # block matrix instead and always read static column 0
        k1 = blocks[:, 0]
        k1 = k1 * c1
        k1 = rotl(k1, 15)
        k1 = k1 * c2
        h = h1 ^ k1
        h = rotl(h, 13)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
        h1 = jnp.where(i < row_blocks, h, h1)
        return h1, pltpu.roll(blocks, NB - 1, 1)

    h1, _ = jax.lax.fori_loop(
        0, NB, body, (jnp.full((T,), 31, jnp.uint32), blocks_ref[:])
    )
    rem = lens & 3
    k1 = tail_k1 * c1
    k1 = rotl(k1, 15)
    k1 = k1 * c2
    h1 = jnp.where(rem > 0, h1 ^ k1, h1)
    h1 = h1 ^ lens
    h1 = h1 ^ (h1 >> 16)
    h1 = h1 * jnp.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> 13)
    h1 = h1 * jnp.uint32(0xC2B2AE35)
    h1 = h1 ^ (h1 >> 16)
    out_ref[pl.ds(gi, 1), :] = h1[None, :]


@partial(jax.jit, static_argnums=(3,))
def hash_rows_pallas(view_u32, lens, _unused, interpret: bool):
    """view_u32: uint32[N, W4] byte-widened padded view (W4 % 4 == 0)."""
    from jax.experimental import pallas as pl

    N, W = view_u32.shape
    if N == 0:
        return jnp.zeros((0,), jnp.uint32)
    T = ROW_TILE
    pad = (-N) % T
    if pad:
        view_u32 = jnp.pad(view_u32, ((0, pad), (0, 0)))
        lens = jnp.pad(lens, (0, pad))
    NP = N + pad
    # precompute (XLA): little-endian 32-bit blocks + combined tail bytes
    blocks = (
        view_u32[:, 0::4]
        | (view_u32[:, 1::4] << 8)
        | (view_u32[:, 2::4] << 16)
        | (view_u32[:, 3::4] << 24)
    ).astype(jnp.uint32)
    lens_u = lens.astype(jnp.uint32)
    tail_start = ((lens_u // 4) * 4).astype(jnp.int32)
    rem = (lens_u & 3).astype(jnp.int32)

    def tb(off):
        idx = jnp.clip(tail_start + off, 0, W - 1)
        return jnp.take_along_axis(view_u32, idx[:, None], axis=1)[:, 0]

    tail_k1 = jnp.zeros((NP,), jnp.uint32)
    tail_k1 = jnp.where(rem >= 3, tail_k1 ^ (tb(2) << 16), tail_k1)
    tail_k1 = jnp.where(rem >= 2, tail_k1 ^ (tb(1) << 8), tail_k1)
    tail_k1 = jnp.where(rem >= 1, tail_k1 ^ tb(0), tail_k1)

    NB = blocks.shape[1]
    grid = (NP // T,)
    # Mosaic lowering recurses unboundedly under global jax_enable_x64
    # (convert/datetime flip it); these kernels are 32-bit-only, so
    # trace with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
        _hash_kernel,
        out_shape=jax.ShapeDtypeStruct((NP // T, T), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, NB), lambda i: (i, 0)),
            pl.BlockSpec((NP // T, T), lambda i: (0, 0)),
            pl.BlockSpec((NP // T, T), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NP // T, T), lambda i: (0, 0)),
        interpret=interpret,
    )(
        blocks,
        lens_u.reshape(NP // T, T),
        tail_k1.reshape(NP // T, T),
    )
    return out.reshape(NP)[:N]


def hash_mm3_pallas(col) -> jax.Array:
    from . import layout

    w = layout.max_row_bytes(col)
    w4 = -(-w // 4) * 4
    view = layout.padded_view(col, w4).astype(jnp.uint32)
    lens = col.lengths().astype(jnp.uint32)
    return hash_rows_pallas(view, lens, None, use_interpret_mode())
