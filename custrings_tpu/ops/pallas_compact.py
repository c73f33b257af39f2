"""Pallas TPU kernel: stable stream compaction of a byte buffer.

out[k0[j]] = data[j] for every kept byte j, where k0 = exclusive prefix
count of the keep mask.  XLA lowers this as a capacity-sized scatter
(~25 ms at 3.7M bytes on v5e — the dominant remaining cost in split and
the other materializing writers).  This kernel instead:

  1. grids over OUTPUT tiles of TB bytes;
  2. DMAs the aligned INPUT window that feeds the tile (window bounds
     come from a tile-count-sized searchsorted done in XLA and
     scalar-prefetched) plus the per-byte k0 values;
  3. moves every kept byte left by (slot - target) with log2(WIN)
     static roll + select steps — correct for compaction because kept
     bytes' final positions strictly increase, so the binary
     decomposition never collides (numpy fuzz, 5000 trials);
  4. packs the tile back to int32 words and writes one block row.

Layout: bytes live as FOUR int32 lane planes (plane t holds bytes
4i + t).  Sub-word shifts (1, 2) become static plane permutations with a
one-word roll; word shifts (>= 4) roll every plane by s/4.  This avoids
byte interleaves/strided lane access, which Mosaic cannot lower.  k0
arrives pre-separated into the same four planes (XLA strided slices are
free), so each plane's window DMA is element-aligned.

A window covers its tile only when the dropped bytes inside fit the
slack (WIN - TB).  The caller computes per-tile overflow in XLA and
falls back to the scatter path via lax.cond — typical delimiter
densities never overflow, and the cond decides at runtime (no sync).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from .pallas_scan import cumsum_i32 as _pscan_cumsum

from ..config import use_interpret_mode

TB = 2048  # output tile bytes
WIN = 4096  # input window bytes (slack = WIN - TB for dropped bytes)
ALIGN = 4096  # 1-D slice alignment (see pallas_window.py)
_INF = 1 << 30  # plain int: a jnp scalar would be a captured constant in the kernel


def _plane_shift(parts, s: int, cw: int, fill):
    """parts[t][0, i] holds element 4i+t of a WIN-byte sequence; return
    planes of the sequence shifted left by s (element j takes j+s), with
    `fill` in vacated slots.  s is a power of two: sub-word shifts are
    static plane permutations, word shifts are per-plane rolls."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.int32, parts[0].shape, 1)

    def roll_words(x, w):
        if w == 0:
            return x
        y = pltpu.roll(x, cw - w, 1)
        return jnp.where(lane + w < cw, y, fill)

    if s % 4 == 0:
        w = s // 4
        return [roll_words(p, w) for p in parts]
    if s == 1:
        return [
            parts[1],
            parts[2],
            parts[3],
            roll_words(parts[0], 1),
        ]
    if s == 2:
        return [
            parts[2],
            parts[3],
            roll_words(parts[0], 1),
            roll_words(parts[1], 1),
        ]
    raise ValueError(s)


def _compact_kernel(srclo_ref, data32_ref, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k0p_refs = refs[:4]
    out_ref = refs[4]
    vbuf = refs[5]
    kbufs = refs[6:10]
    sems = refs[10]

    gi = pl.program_id(0)
    aw = ALIGN // 4
    cw = WIN // 4
    s0 = srclo_ref[gi]
    a = pl.multiple_of((s0 // ALIGN) * aw, aw)  # window start, words
    dmas = [
        pltpu.make_async_copy(data32_ref.at[pl.ds(a, cw)], vbuf, sems.at[0])
    ]
    for t in range(4):
        # plane t window: elements a..a+cw of k0[t::4] (+1 word slack for
        # the keep test at the window's last byte)
        dmas.append(
            pltpu.make_async_copy(
                k0p_refs[t].at[pl.ds(a, cw + aw)], kbufs[t], sems.at[1 + t]
            )
        )
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    def srl(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    w = vbuf[:].reshape(1, cw)
    v = [w & 0xFF, srl(w, 8) & 0xFF, srl(w, 16) & 0xFF, srl(w, 24) & 0xFF]
    k0f = [kbufs[t][:].reshape(1, cw + aw) for t in range(4)]
    k0 = [k0f[t][:, :cw] for t in range(4)]
    # keep[4i+t] = k0[4i+t+1] > k0[4i+t]; plane 3's successor is plane 0
    # at word i+1: rotate-left-by-one then prefix-slice (offset lane
    # slices may not lower in Mosaic; prefix slices + rolls do)
    p0next = pltpu.roll(k0f[0], cw + aw - 1, 1)[:, :cw]
    k0n = [k0[1], k0[2], k0[3], p0next]
    rem = s0 % ALIGN  # byte offset of the true window start
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
    r = []
    for t in range(4):
        bidx = lane * 4 + t
        keep_t = k0n[t] > k0[t]
        live = keep_t & (bidx >= rem)
        tgt = k0[t] - TB * gi
        rt = jnp.where(live, bidx - tgt, _INF)
        r.append(jnp.where(rt < 0, _INF, rt))

    bits = max(WIN - 1, 1).bit_length()
    for b in range(bits):
        sbit = 1 << b
        rin = _plane_shift(r, sbit, cw, _INF)
        vin = _plane_shift(v, sbit, cw, jnp.int32(0))
        for t in range(4):
            take = (rin[t] != _INF) & ((rin[t] & sbit) != 0)
            stay = (r[t] != _INF) & ((r[t] & sbit) == 0)
            r[t] = jnp.where(take, rin[t] & ~sbit, jnp.where(stay, r[t], _INF))
            v[t] = jnp.where(take, vin[t], jnp.where(stay, v[t], 0))

    packed = (
        jnp.where(r[0] == 0, v[0], 0)
        | (jnp.where(r[1] == 0, v[1], 0) << 8)
        | (jnp.where(r[2] == 0, v[2], 0) << 16)
        | (jnp.where(r[3] == 0, v[3], 0) << 24)
    )
    out_ref[pl.ds(gi, 1), :] = packed[:, : TB // 4]


@partial(jax.jit, static_argnums=(3,))
def _compact_p(data, k0, srclo, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = srclo.shape[0]
    capP = -(-(data.shape[0] + WIN + 2 * ALIGN) // ALIGN) * ALIGN
    data = jnp.pad(data, (0, capP - data.shape[0]))
    data32 = jax.lax.bitcast_convert_type(data.reshape(-1, 4), jnp.int32)
    k0p = jnp.pad(k0, (0, capP + ALIGN - k0.shape[0])).astype(jnp.int32)
    planes = [k0p[t::4][: capP // 4 + ALIGN // 4] for t in range(4)]
    srclo = jnp.clip(srclo, 0, max(capP - WIN - ALIGN, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec((ntiles, TB // 4), lambda i, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIN // 4,), jnp.int32),
        ]
        + [pltpu.VMEM((WIN // 4 + ALIGN // 4,), jnp.int32) for _ in range(4)]
        + [pltpu.SemaphoreType.DMA((5,))],
    )
    # Mosaic lowering recurses unboundedly under global jax_enable_x64
    # (convert/datetime flip it); these kernels are 32-bit-only, so
    # trace with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
        _compact_kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles, TB // 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(srclo, data32, *planes)
    return out


def use_pallas_compact() -> bool:
    """Default ON for real TPU backends; CUSTRINGS_PALLAS_COMPACT=0 forces
    the scatter path (also the automatic fallback if the kernel ever fails
    to compile), =1 forces the kernel even off-TPU (interpret mode)."""
    import os

    flag = os.environ.get("CUSTRINGS_PALLAS_COMPACT")
    if flag == "0":
        return False
    if flag != "1" and use_interpret_mode():
        return False
    return True


def compact_bytes(data: jax.Array, keep: jax.Array, out_cap: int) -> jax.Array:
    """uint8[out_cap]: data[j] for kept j, stably compacted.

    Falls back to the XLA scatter when any tile's input window would
    overflow WIN (lax.cond — runtime choice, no host sync) or when
    out_cap is not tile-aligned."""
    cap = data.shape[0]
    k = keep.astype(jnp.int32)
    k0 = jnp.concatenate([jnp.zeros(1, jnp.int32), _pscan_cumsum(k)])

    def scatter_path(_):
        return (
            jnp.zeros(out_cap + 1, jnp.uint8)
            .at[jnp.where(keep, k0[:cap], out_cap)]
            .set(jnp.where(keep, data, jnp.uint8(0)))[:out_cap]
        )

    if out_cap % TB != 0 or cap < 8:
        return scatter_path(None)

    ntiles = out_cap // TB
    targets = jnp.arange(ntiles, dtype=jnp.int32) * TB
    # first input byte feeding output position TB*t
    srclo = jnp.searchsorted(k0[1:], targets + 1, side="left").astype(
        jnp.int32
    )
    srclo = jnp.minimum(srclo, max(cap - 1, 0))
    srchi = jnp.concatenate(
        [srclo[1:], jnp.full(1, cap, jnp.int32)]
    )
    span = srchi - (srclo // ALIGN) * ALIGN
    overflow = jnp.any(span > WIN)

    def kernel_path(_):
        tiles = _compact_p(data, k0, srclo, use_interpret_mode())
        flat = jax.lax.bitcast_convert_type(tiles, jnp.uint8).reshape(-1)
        return flat[:out_cap]

    return jax.lax.cond(overflow, scatter_path, kernel_path, None)
