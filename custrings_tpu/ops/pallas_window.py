"""Pallas TPU kernel: ragged row-window gather (the padded-view builder).

XLA lowers the padded view's 2-D gather (`data[starts[:,None] + iota]`)
to ~34 ms at 16k rows x 256 B on v5e — two orders of magnitude off HBM
speed, and the single biggest primitive cost in the byte layer (it feeds
char_matrix, every regex engine, the Pallas hash, and the DP kernels).

Here each string row is ONE aligned DMA plus an in-register rotate:

  - Mosaic requires 1-D HBM slices to be aligned in both start and size,
    so the kernel DMAs the aligned byte window [align(start), +chunk)
    into VMEM **as raw uint8** and widens it to int32 lanes in-register
  - the row's bytes are then extracted with a BYTE-granular dynamic
    rotate (pltpu.roll with a traced shift on the widened lanes)

Round 3 redesign: the kernel previously took a pre-packed int32-word
buffer and rolled words + a 4-way subword select.  Producing that buffer
(u8[cap] -> i32[cap/4]) has no good XLA form: `reshape(-1, 4)` + bitcast
materializes a [cap/4, 4] tensor whose 4-wide lane dim tiles to 128
(32x HBM blowup -> compile OOM at 1M rows), and strided slices lower to
gathers (~120M elem/s, seconds at 200 MB).  Reading the raw bytes kills
the conversion entirely, at every scale.

Two output variants:
  - bytes: int32[rows, W] one byte per lane (consumers want int32
    codepoints/compare lanes anyway; `ragged_gather` narrows to uint8)
  - words: int32[rows, W/4] BIG-endian packed words for sort keys /
    hashes, packed in-kernel with two exact f32 matmuls per 512-byte
    segment (byte values < 2^8 and pair sums < 2^16 are exact in f32)

Rows are grouped ROW_BLK per grid step; `starts` is scalar-prefetched
(SMEM), so columns beyond _SMEM_ROWS issue several pallas calls.
Reference analogue: the per-string pointer walk in custring_view::data()
(cpp/src/custring_view.inl) — this is the batched TPU equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import use_interpret_mode

ROW_BLK = 8
#: 1-D slice starts/sizes must be tiling-aligned in every memory space the
#: compiler may choose for the unblocked data ref; 4096 bytes covers both
#: the u8 HBM and any widened VMEM staging.
ALIGN = 4096

#: rows per pallas_call: the scalar-prefetched starts live in SMEM (1 MB
#: on v5e) and 1M-row columns overflowed it (round 3: "prefetched SMEM
#: operand 0" compile failure at u8[4M]).  64K rows = 256 KB of int32
#: starts per call; larger columns issue several calls back to back.
_SMEM_ROWS = 1 << 16

_SEG = 512  # byte-segment per packing matmul (out lane dim 128)


def _pack_mats():
    """(P_hi, P_lo) f32[_SEG, _SEG//4]: big-endian 16-bit halves.

    word k of a segment = (b[4k]*256 + b[4k+1]) << 16 | (b[4k+2]*256
    + b[4k+3]); each half is a sum of two byte terms < 2^16, exact in f32.
    """
    hi = np.zeros((_SEG, _SEG // 4), np.float32)
    lo = np.zeros((_SEG, _SEG // 4), np.float32)
    for k in range(_SEG // 4):
        hi[4 * k + 0, k] = 256.0
        hi[4 * k + 1, k] = 1.0
        lo[4 * k + 2, k] = 256.0
        lo[4 * k + 3, k] = 1.0
    return hi, lo


def _window_kernel_factory(W: int, chunk: int, words: bool):
    def kernel(*refs):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if words:
            starts_ref, data_ref, phi_ref, plo_ref, out_ref = refs[:5]
            scr = refs[5:]
        else:
            starts_ref, data_ref, out_ref = refs[:3]
            scr = refs[3:]
        u8scr = scr[:ROW_BLK]
        sems = scr[ROW_BLK]
        gi = pl.program_id(0)
        dmas = []
        for r in range(ROW_BLK):
            s = starts_ref[gi * ROW_BLK + r]
            a = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
            dma = pltpu.make_async_copy(
                data_ref.at[pl.ds(a, chunk)], u8scr[r], sems.at[r]
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        rows = []
        for r in range(ROW_BLK):
            s = starts_ref[gi * ROW_BLK + r]
            rem = s % ALIGN
            b = u8scr[r][:].reshape(1, chunk).astype(jnp.int32)
            rolled = pltpu.roll(b, (chunk - rem) % chunk, 1)
            rows.append(rolled[:, :W])
        bmat = jnp.concatenate(rows, axis=0)  # [ROW_BLK, W] byte lanes
        if not words:
            out_ref[:] = bmat
            return
        segs = []
        bf = bmat.astype(jnp.float32)
        for g in range(W // _SEG):
            seg = bf[:, g * _SEG : (g + 1) * _SEG]
            hi = jnp.dot(
                seg, phi_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            lo = jnp.dot(
                seg, plo_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            segs.append((hi << 16) | lo)
        out_ref[:] = segs[0] if len(segs) == 1 else jnp.concatenate(
            segs, axis=1
        )

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4))
def _ragged_window_p(data, starts, W: int, words: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = starts.shape[0]
    # window + alignment slack, rounded to a whole number of align tiles
    chunk = -(-(W + ALIGN) // ALIGN) * ALIGN
    cap_pad = -(-(data.shape[0] + chunk) // ALIGN) * ALIGN
    data = jnp.pad(data, (0, cap_pad - data.shape[0]))
    pad = (-n) % ROW_BLK
    nP = n + pad
    starts = jnp.pad(starts, (0, pad))
    starts = jnp.clip(starts, 0, max(cap_pad - chunk, 0)).astype(jnp.int32)
    kernel = _window_kernel_factory(W, chunk, words)
    outW = W // 4 if words else W
    extra = ()
    extra_specs = []
    if words:
        phi, plo = _pack_mats()
        extra = (jnp.asarray(phi), jnp.asarray(plo))
        extra_specs = [
            pl.BlockSpec((_SEG, _SEG // 4), lambda i, s: (0, 0)),
            pl.BlockSpec((_SEG, _SEG // 4), lambda i, s: (0, 0)),
        ]

    def call(starts_c):
        nC = starts_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nC // ROW_BLK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + extra_specs,
            out_specs=pl.BlockSpec((ROW_BLK, outW), lambda i, s: (i, 0)),
            scratch_shapes=(
                [pltpu.VMEM((chunk,), jnp.uint8) for _ in range(ROW_BLK)]
                + [pltpu.SemaphoreType.DMA((ROW_BLK,))]
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nC, outW), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts_c, data, *extra)

    if nP <= _SMEM_ROWS:
        return call(starts)[:n]
    pieces = [
        call(starts[i : i + _SMEM_ROWS])
        for i in range(0, nP, _SMEM_ROWS)
    ]
    return jnp.concatenate(pieces, axis=0)[:n]


def ragged_gather_i32(
    data: jax.Array, starts: jax.Array, width: int
) -> jax.Array:
    """int32[rows, width], one byte per lane — the native output.

    No masking: callers mask positions past each row's length themselves
    (out-of-row bytes are whatever follows in the buffer, zeros past the
    end).  Width is rounded up to a 512 multiple internally; the
    requested width is returned."""
    if starts.shape[0] == 0:
        return jnp.zeros((0, width), jnp.int32)  # grid=(0,) crashes Mosaic
    W = max(-(-width // 512) * 512, 512)  # out lane dim: 128 multiple
    # Mosaic lowering of this kernel recurses without bound when traced
    # under jax_enable_x64 (which convert/datetime ops flip on globally);
    # the kernel is pure uint8/int32, so trace it with x64 off.
    starts = starts.astype(jnp.int32)
    with jax.enable_x64(False):
        out = _ragged_window_p(data, starts, W, False, use_interpret_mode())
    return out[:, :width]


def ragged_gather(data: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """uint8[rows, width]: data[starts[r] : starts[r]+width] per row."""
    return ragged_gather_i32(data, starts, width).astype(jnp.uint8)


def ragged_gather_words(
    data: jax.Array, starts: jax.Array, width: int
) -> jax.Array:
    """int32[rows, ceil(width/4)] BIG-endian words of
    data[starts[r] : starts[r]+width] per row.

    The words-native variant for consumers that pack bytes into compare
    words anyway (sort keys, category lookups): the packing happens
    in-kernel on the MXU, so no [n, *, 4] repack tensor ever exists.
    No masking — callers mask word tails past each row's length (e.g.
    `ops.array._mask_word_tails`)."""
    if starts.shape[0] == 0:
        return jnp.zeros((0, -(-width // 4)), jnp.int32)
    W = max(-(-width // 512) * 512, 512)
    starts = starts.astype(jnp.int32)
    with jax.enable_x64(False):
        out = _ragged_window_p(data, starts, W, True, use_interpret_mode())
    return out[:, : -(-width // 4)]
