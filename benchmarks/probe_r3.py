"""Round-3 probe: per-phase cost of split's byte movement + candidates.

Resident fori_loop protocol (see probe_prims.py): each body depends on the
carried scalar so XLA cannot hoist it; per-iter = (t12 - t1) / 11.

Phases measured on the real chip, tweets corpus at 16k rows:
  copy16/64    plain int32 copy+add (roofline yardstick)
  cumsum4m     one capacity-sized cumsum
  bcast        one broadcast_rows_to_bytes
  mask         split front half: match+picked+pk0+counts (scans only)
  keep         through the keep mask + k0
  pcompact     Pallas compact_bytes (the output writer)
  scompact     XLA scatter compaction (fallback path)
  tokend_sc    the token-end scatter-max (the known ~25 ms)
  tokend_roll  candidate: log2(cap)-round roll+select compaction of the
               token-end values in plain XLA (monotone-shift compaction)
  full         current _delim_full_bd
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from custrings_tpu import column as colmod
from custrings_tpu.column import StringColumn, cumsum0
from custrings_tpu.config import bucket_bytes
from custrings_tpu.ops import layout, segments, split
from custrings_tpu.ops.find import _match_mask
from custrings_tpu.ops.modify import _greedy_select, _has_border

N_ROWS = int(os.environ.get("PROBE_ROWS", "16384"))


def load_col():
    path = "/root/reference/data/tweets.csv"
    lines = open(path, encoding="utf-8").read().splitlines()[1:]
    out = []
    while len(out) < N_ROWS:
        for s in lines:
            b = s.encode("utf-8")[:256]
            out.append(b.decode("utf-8", "ignore"))
            if len(out) >= N_ROWS:
                break
    return colmod.from_host_strings(out)


def timed(name, fn, args, iters=12):
    """fn(s, *args) -> array (or tuple); s is the carried perturbation."""

    def body(a, K):
        def step(i, carry):
            s, aa = carry
            aa = jax.lax.optimization_barrier(aa)
            out = fn(s, *aa)
            if not isinstance(out, tuple):
                out = (out,)
            red = sum(jnp.sum(o.astype(jnp.int32)) % 3 for o in out)
            return red.astype(jnp.int32), aa

        s, _ = jax.lax.fori_loop(0, K, step, (jnp.int32(0), a))
        return s

    j1 = jax.jit(lambda *a: body(a, 1))
    jk = jax.jit(lambda *a: body(a, iters))
    j1(*args).block_until_ready()
    jk(*args).block_until_ready()
    t0 = time.perf_counter(); j1(*args).block_until_ready(); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jk(*args).block_until_ready(); tk = time.perf_counter() - t0
    per = (tk - t1) / (iters - 1)
    print(f"{name}: per-iter={per*1e3:.3f}ms (t1={t1*1e3:.1f} t{iters}={tk*1e3:.1f})", flush=True)
    return per


def split_front(s, data, offsets, validity):
    """match + picked + pk0 + counts + tok_off (all scans/elementwise)."""
    col = StringColumn(data ^ (s & 0).astype(jnp.uint8), offsets, validity)
    cap = col.capacity
    j = jnp.arange(cap, dtype=jnp.int32)
    p = jnp.asarray([32], jnp.uint8)
    row_end = segments.row_end_positions(col.offsets, cap)
    match = _match_mask(col.data, p) & (j + 1 <= row_end) & layout.valid_byte_mask(col)
    picked = match
    pk0 = cumsum0(picked)
    delims_per_row = segments.per_row_of_prefix(pk0, col.offsets)
    counts = jnp.where(col.validity, delims_per_row + 1, 0)
    tok_off = cumsum0(counts)
    return pk0, tok_off


def split_keep(s, data, offsets, validity):
    """through the keep mask + k0 (adds valid-byte mask + validity bcast)."""
    col = StringColumn(data ^ (s & 0).astype(jnp.uint8), offsets, validity)
    cap = col.capacity
    j = jnp.arange(cap, dtype=jnp.int32)
    p = jnp.asarray([32], jnp.uint8)
    row_end = segments.row_end_positions(col.offsets, cap)
    match = _match_mask(col.data, p) & (j + 1 <= row_end) & layout.valid_byte_mask(col)
    dused = match
    keep = (
        layout.valid_byte_mask(col)
        & ~dused
        & (segments.broadcast_rows_to_bytes(col.validity.astype(jnp.int32), col.offsets, cap) == 1)
    )
    k0 = cumsum0(keep)
    return keep, k0


def tokend_scatter(s, keep, k0, tid, tcap):
    cap = keep.shape[0]
    e = (
        jnp.zeros(tcap + 1, jnp.int32)
        .at[jnp.where(keep, tid + (s & 0), tcap)]
        .max(jnp.where(keep, k0[:cap] + 1, 0))[:tcap]
    )
    return segments.cummax(e)


def roll_compact_i32(vals, r, nbits):
    """Monotone-shift compaction: move vals[j] left by r[j] (r nondecreasing
    among live elements, binary decomposition collision-free)."""
    INF = jnp.int32(1 << 30)
    v, rr = vals, r
    for b in range(nbits):
        bit = 1 << b
        vin = jnp.roll(v, -bit)
        rin = jnp.roll(rr, -bit)
        take = (rin < INF) & ((rin & bit) != 0)
        stay = (rr < INF) & ((rr & bit) == 0)
        v = jnp.where(take, vin, jnp.where(stay, v, 0))
        rr = jnp.where(take, rin - bit, jnp.where(stay, rr, INF))
    return v


def tokend_roll(s, dused, k0, tcap):
    """Candidate: compact k0-at-dused positions to the front via rolls."""
    cap = dused.shape[0]
    u0 = cumsum0(dused)
    j = jnp.arange(cap, dtype=jnp.int32)
    INF = jnp.int32(1 << 30)
    r = jnp.where(dused, j - u0[:cap] + (s & 0), INF)
    vals = jnp.where(dused, k0[:cap], 0)
    nbits = max(cap - 1, 1).bit_length()
    out = roll_compact_i32(vals, r, nbits)
    return out[:tcap]


def main():
    print("devices:", jax.devices(), flush=True)
    col = load_col()
    jax.block_until_ready(col.data)
    cap, n = col.capacity, col.size
    print(f"rows={n} cap={cap} ({cap/1e6:.2f} MB)", flush=True)

    # roofline yardsticks
    for mb in (16, 64):
        ne = mb * 1024 * 1024 // 4
        x = jnp.arange(ne, dtype=jnp.int32)
        per = timed(f"copy{mb}", lambda s, a: a + s, (x,))
        print(f"  -> {2*mb/1e3/per:.1f} GB/s (r+w)", flush=True)

    x4 = jnp.ones(cap, jnp.int32)
    timed("cumsum_cap", lambda s, a: jnp.cumsum(a + s), (x4,))
    rv = jnp.arange(n, dtype=jnp.int32)
    timed(
        "bcast",
        lambda s, v, o: segments.broadcast_rows_to_bytes(v + s, o, cap),
        (rv, col.offsets),
    )

    args = (col.data, col.offsets, col.validity)
    timed("mask_front", split_front, args)
    timed("keep_k0", split_keep, args)

    # real keep/k0/tid for writer-phase probes
    keep, k0 = jax.jit(split_keep)(jnp.int32(0), *args)
    dused = jax.jit(
        lambda s, d, o, v: _match_mask(d, jnp.asarray([32], jnp.uint8))
        & (jnp.arange(cap, dtype=jnp.int32) + 1 <= segments.row_end_positions(o, cap))
        & layout.valid_byte_mask(StringColumn(d, o, v))
    )(jnp.int32(0), *args)
    tcap = bucket_bytes(cap + n)
    pk0 = cumsum0(dused)
    counts = jnp.where(col.validity, segments.per_row_of_prefix(pk0, col.offsets) + 1, 0)
    tok_off = cumsum0(counts)
    urank = pk0[:cap] - segments.broadcast_rows_to_bytes(pk0[col.offsets[:-1]], col.offsets, cap)
    tid = segments.broadcast_rows_to_bytes(tok_off[:-1], col.offsets, cap) + urank
    jax.block_until_ready((keep, k0, tid))
    ntok = int(tok_off[-1])
    print(f"tokens={ntok} tcap={tcap}", flush=True)

    from custrings_tpu.ops.pallas_compact import compact_bytes

    bcap = cap
    timed(
        "pcompact",
        lambda s, d, kp: compact_bytes(d ^ (s & 0).astype(jnp.uint8), kp, bcap),
        (col.data, keep),
    )
    timed(
        "scompact",
        lambda s, d, kp: jnp.zeros(bcap + 1, jnp.uint8)
        .at[jnp.where(kp, cumsum0(kp)[:cap] + (s & 0), bcap)]
        .set(jnp.where(kp, d, jnp.uint8(0)))[:bcap],
        (col.data, keep),
    )
    timed(
        "tokend_sc",
        lambda s, kp, kk, tt: tokend_scatter(s, kp, kk, tt, tcap),
        (keep, k0, tid),
        iters=6,
    )
    timed(
        "tokend_roll",
        lambda s, du, kk: tokend_roll(s, du, kk, tcap),
        (dused, k0),
        iters=6,
    )

    timed(
        "full_delim",
        lambda s, d, o, v: split._delim_full_bd(
            StringColumn(d ^ (s & 0).astype(jnp.uint8), o, v), tcap, bcap, " ", -1, False
        ),
        args,
        iters=6,
    )


if __name__ == "__main__":
    main()
