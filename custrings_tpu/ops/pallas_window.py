"""Pallas TPU kernel: ragged row-window gather (the padded-view builder).

XLA lowers the padded view's 2-D gather (`data[starts[:,None] + iota]`)
to ~34 ms at 16k rows x 256 B on v5e — two orders of magnitude off HBM
speed, and the single biggest primitive cost in the byte layer (it feeds
char_matrix, every regex engine, the Pallas hash, and the DP kernels).

Here each string row is ONE aligned DMA plus an in-register rotate:

  - Mosaic requires 1-D HBM slices to be 1024-byte aligned in both start
    and size, so the kernel DMAs the aligned window
    [align1024(start), +W+1024) into VMEM as int32 words
  - the row's bytes are then extracted with a dynamic word rotate
    (pltpu.roll with a traced shift) plus a 4-way select over the
    sub-word byte shift (static shift amounts only — Mosaic-safe)

Rows are output as int32 words; the wrapper bitcasts back to uint8.
Reference analogue: the per-string pointer walk in custring_view::data()
(cpp/src/custring_view.inl) — this is the batched TPU equivalent.

Constraints honored (see memory notes / pallas_guide): scalar-prefetched
starts (SMEM), unblocked ANY/HBM data ref, (8,128)-divisible int32 VMEM
blocks, non-negative roll shifts, no dynamic lane-dim ref slicing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import use_interpret_mode

ROW_BLK = 8
# 1-D slice starts/sizes must be tiling-aligned in BOTH memory spaces the
# compiler may choose for the unblocked data ref: 1024 bytes (i8 HBM) and
# 1024 int32 words (i32 VMEM).  4096 bytes satisfies both.
ALIGN = 4096


def _window_kernel(starts_ref, data32_ref, out_ref, *scratches_and_sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scratches = scratches_and_sems[:ROW_BLK]
    sems = scratches_and_sems[ROW_BLK]
    gi = pl.program_id(0)
    W4 = out_ref.shape[1]  # row words
    cw = scratches[0].shape[0]  # chunk words
    aw = ALIGN // 4
    dmas = []
    for r in range(ROW_BLK):
        s = starts_ref[gi * ROW_BLK + r]
        a = pl.multiple_of((s // ALIGN) * aw, aw)
        dma = pltpu.make_async_copy(
            data32_ref.at[pl.ds(a, cw)],
            scratches[r],
            sems.at[r],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    rows = []
    for r in range(ROW_BLK):
        s = starts_ref[gi * ROW_BLK + r]
        rem = s % ALIGN
        wshift = rem // 4
        b = rem % 4
        # [1, cw] — dynamic_rotate needs rank >= 2
        w = scratches[r][:].reshape(1, cw)
        # rotate left by wshift words (roll moves toward higher indices)
        wl = pltpu.roll(w, (cw - wshift) % cw, 1)
        wn = pltpu.roll(wl, cw - 1, 1)  # wl shifted left one word

        def srl(x, k):  # logical right shift, staying in int32
            return jax.lax.shift_right_logical(x, jnp.int32(k))

        c1 = srl(wl, 8) | (wn << 24)
        c2 = srl(wl, 16) | (wn << 16)
        c3 = srl(wl, 24) | (wn << 8)
        comb = jnp.where(
            b == 0, wl, jnp.where(b == 1, c1, jnp.where(b == 2, c2, c3))
        )
        rows.append(comb[:, :W4])
    out_ref[:] = jnp.concatenate(rows, axis=0)


#: rows per pallas_call: the scalar-prefetched starts live in SMEM (1 MB
#: on v5e) and 1M-row columns overflowed it (round 3: "prefetched SMEM
#: operand 0" compile failure at u8[4M]).  64K rows = 256 KB of int32
#: starts per call; larger columns issue several calls back to back.
_SMEM_ROWS = 1 << 16


def _bytes_to_words_le(data: jax.Array) -> jax.Array:
    """u8[4M] -> int32[M] little-endian words WITHOUT the [M, 4] reshape.

    `bitcast_convert_type(data.reshape(-1, 4), i32)` materializes a
    u32[M, 4] intermediate whose 4-wide lane dim pads to 128 in the TPU
    tiled layout — a 32x memory blowup that OOMs HBM at 1M-row columns
    (round 3).  Four strided 1-D slices + shift/or stay 1-D throughout.
    """
    d0 = data[0::4].astype(jnp.uint32)
    d1 = data[1::4].astype(jnp.uint32)
    d2 = data[2::4].astype(jnp.uint32)
    d3 = data[3::4].astype(jnp.uint32)
    return (d0 | (d1 << 8) | (d2 << 16) | (d3 << 24)).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2, 3))
def _ragged_gather_p(data, starts, W: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = starts.shape[0]
    # window + alignment slack, rounded to a whole number of align tiles
    chunk = -(-(W + ALIGN) // ALIGN) * ALIGN
    # the (padded) byte buffer as little-endian int32 words
    cap4 = -(-(data.shape[0] + chunk) // ALIGN) * ALIGN
    data = jnp.pad(data, (0, cap4 - data.shape[0]))
    data32 = _bytes_to_words_le(data)
    pad = (-n) % ROW_BLK
    nP = n + pad
    starts = jnp.pad(starts, (0, pad))
    starts = jnp.clip(starts, 0, max(cap4 - chunk, 0)).astype(jnp.int32)

    def call(starts_c):
        nC = starts_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nC // ROW_BLK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((ROW_BLK, W // 4), lambda i, s: (i, 0)),
            scratch_shapes=(
                [pltpu.VMEM((chunk // 4,), jnp.int32) for _ in range(ROW_BLK)]
                + [pltpu.SemaphoreType.DMA((ROW_BLK,))]
            ),
        )
        return pl.pallas_call(
            _window_kernel,
            out_shape=jax.ShapeDtypeStruct((nC, W // 4), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts_c, data32)

    if nP <= _SMEM_ROWS:
        return call(starts)[:n]
    pieces = [
        call(starts[i : i + _SMEM_ROWS])
        for i in range(0, nP, _SMEM_ROWS)
    ]
    return jnp.concatenate(pieces, axis=0)[:n]


def _words_to_bytes(out32: jax.Array, W: int) -> jax.Array:
    """int32[n, W//4] LE words -> uint8[n, W], no [n, W//4, 4] tensor.

    `bitcast_convert_type(out32, u8).reshape(n, W)` goes through a
    u8[n, W//4, 4] intermediate whose 4-lane minor dim tiles to 128 lanes
    (32x blowup, 16 GB at 1M rows) — same failure family as
    `_bytes_to_words_le`.  The lane-repeat + per-lane shift keeps every
    tensor at [n, W]; the repeat is a broadcast XLA fuses into the shift.
    """
    reps = jnp.repeat(out32, 4, axis=1)  # [n, W]
    sh = (jnp.arange(W, dtype=jnp.int32) % 4) * 8
    return (
        jax.lax.shift_right_logical(reps, sh[None, :]) & 0xFF
    ).astype(jnp.uint8)


def ragged_gather_words(
    data: jax.Array, starts: jax.Array, width: int
) -> jax.Array:
    """int32[rows, ceil(width/4)] little-endian words of
    data[starts[r] : starts[r]+width] per row (width <= gathered window).

    The words-native variant of `ragged_gather` for consumers that repack
    bytes into words anyway (sort keys, hashes): no byte-matrix roundtrip,
    so none of the [n, *, 4] layout blowups.  No masking — callers mask
    word tails past each row's length themselves."""
    if starts.shape[0] == 0:
        return jnp.zeros((0, -(-width // 4)), jnp.int32)
    W = max(-(-width // 512) * 512, 512)
    starts = starts.astype(jnp.int32)
    with jax.enable_x64(False):
        out32 = _ragged_gather_p(data, starts, W, use_interpret_mode())
    return out32[:, : -(-width // 4)]


def ragged_gather(data: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """uint8[rows, width]: data[starts[r] : starts[r]+width] per row.

    No masking: callers mask positions past each row's length themselves
    (out-of-row bytes are whatever follows in the buffer, zeros past the
    end).  Width is rounded up to a 1024 multiple internally; the
    requested width is returned."""
    if starts.shape[0] == 0:
        return jnp.zeros((0, width), jnp.uint8)  # grid=(0,) crashes Mosaic
    # out block lane dim is W//4 int32 words: keep it a 128 multiple
    W = max(-(-width // 512) * 512, 512)  # out lane dim: 128-word multiple
    # Mosaic lowering of this kernel recurses without bound when traced
    # under jax_enable_x64 (which convert/datetime ops flip on globally);
    # the kernel is pure uint8/int32, so trace it with x64 off.
    starts = starts.astype(jnp.int32)
    with jax.enable_x64(False):
        out32 = _ragged_gather_p(data, starts, W, use_interpret_mode())
    return _words_to_bytes(out32, W)[:, :width]
