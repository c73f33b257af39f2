"""Monotone routing in plain XLA: stream compaction / expansion via
log2(N) roll+select rounds.

Round-3 measurement (benchmarks/probe_r3.py, real v5e, 4M elements):

  XLA scatter compaction        24.4 ms
  Pallas compact kernel         25.0 ms   (no win on hardware)
  roll+select routing            1.3 ms   (~19x; near memory speed)

Why it works: moving element j left by r[j] where r is NONDECREASING over
live elements (true for any stable compaction: r = #dropped before j, and
for any expansion: r = #inserted before j) decomposes over the bits of r
without collisions.  Proof sketch for round b (LSB-first): a collision
needs a stayer u (bit clear) and a taker w from j+2^b (bit set) at one
lane; remaining distances are ≡0 mod 2^b, so r_w ≡ r_u + 2^b (mod 2^(b+1))
and target order forces r_w ≤ r_u − 2^b < r_u — contradicting
monotonicity.  Wrap-around from jnp.roll is safe because a wrapped element
at position p has remaining distance ≤ p < 2^b, so its bit-b is clear.
(Fuzz-verified in tests/test_shift_compact.py.)

Every capacity-sized byte mover in the package routes through here: the
split writer, charwise byte layout, literal replace, the char-position
map.  Reference analogue: the two-pass size→scan→write pattern
(cpp/src/strings/split.cu:199-220) — same algorithm, but the write pass
is a routing network instead of a scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from .pallas_scan import cumsum_i32 as _pscan_cumsum
import numpy as np

_INF = np.int32(1 << 30)  # np: a module-level jnp constant would init the backend at import


def _nbits(n: int) -> int:
    return max(n - 1, 1).bit_length()


def _zero(a):
    return jnp.zeros((), a.dtype)


def compact_arrays(keep: jax.Array, arrays, max_dist: int | None = None):
    """Stably move kept elements to the front of each array.

    keep: bool[N]; arrays: list of 1-D arrays of length N sharing the mask.
    Returns (compacted list, k0) where k0 = int32[N+1] exclusive prefix
    count of keep; positions >= k0[-1] of each output are zero-filled.
    max_dist bounds the move distance (= max #dropped before any kept
    element) when the caller knows one — fewer rounds.

    Above ROUTE_MIN lanes the log2(N) full-capacity roll rounds become
    the dominant super-linear cost (28 x 2 GB passes at 268M lanes) and
    the work routes to the LINEAR streaming kernel instead
    (ops/pallas_route.py)."""
    N = keep.shape[0]
    from ..config import use_interpret_mode
    from . import pallas_route

    if N >= pallas_route.ROUTE_MIN and not use_interpret_mode():
        return pallas_route.compact_stream(keep, arrays)
    k0 = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), _pscan_cumsum(keep.astype(jnp.int32))]
    )
    j = jnp.arange(N, dtype=jnp.int32)
    r = jnp.where(keep, j - k0[:N], _INF)
    vals = [jnp.where(keep, a, _zero(a)) for a in arrays]
    for b in range(_nbits(max_dist + 1 if max_dist is not None else N)):
        bit = 1 << b
        rin = jnp.roll(r, -bit)
        take = (rin < _INF) & ((rin & bit) != 0)
        stay = (r < _INF) & ((r & bit) == 0)
        r = jnp.where(take, rin - bit, jnp.where(stay, r, _INF))
        vals = [
            jnp.where(
                take, jnp.roll(a, -bit), jnp.where(stay, a, _zero(a))
            )
            for a in vals
        ]
    return vals, k0


def compact_bytes_x(data: jax.Array, keep: jax.Array) -> jax.Array:
    """uint8[N]: data[j] for kept j, stably compacted (zeros after)."""
    (out,), _ = compact_arrays(keep, [data])
    return out


def expand_to(live, dist, arrays, out_cap: int):
    """expand_arrays with an explicit output capacity (the streaming
    kernel takes out_cap natively; the XLA roll network pads to it)."""
    from ..config import use_interpret_mode
    from . import pallas_route

    N = live.shape[0]
    if (
        max(N, out_cap) >= pallas_route.ROUTE_MIN
        and not use_interpret_mode()
    ):
        from . import segments

        dmono = segments.cummax(jnp.where(live, dist.astype(jnp.int32), 0))
        return pallas_route.expand_stream(
            live, dmono, arrays, out_cap=out_cap
        )
    if out_cap > N:
        pad = out_cap - N
        live = jnp.pad(live, (0, pad))
        dist = jnp.pad(dist, (0, pad))
        arrays = [jnp.pad(a, (0, pad)) for a in arrays]
    moved, placed = expand_arrays(live, dist, arrays)
    return [m[:out_cap] for m in moved], placed[:out_cap]


def expand_arrays(live: jax.Array, dist: jax.Array, arrays):
    """Move live element j RIGHT to position j + dist[j].

    dist must be >= 0 and nondecreasing over live elements, with
    j + dist[j] < N (the caller sizes the arrays to the output domain and
    pads the tail with dead lanes).  Returns (moved list, placed mask);
    unplaced lanes are zero-filled.

    Above ROUTE_MIN lanes the work routes to the linear streaming kernel
    (see compact_arrays); the kernel needs dist nondecreasing on ALL
    lanes, so dead lanes are forward-filled with a running max first.
    """
    N = live.shape[0]
    from ..config import use_interpret_mode
    from . import pallas_route
    from . import segments

    if N >= pallas_route.ROUTE_MIN and not use_interpret_mode():
        dmono = segments.cummax(
            jnp.where(live, dist.astype(jnp.int32), 0)
        )
        return pallas_route.expand_stream(live, dmono, arrays)
    r = jnp.where(live, dist.astype(jnp.int32), _INF)
    vals = [jnp.where(live, a, _zero(a)) for a in arrays]
    # MSB-first: the mirror of the LSB-first left-routing proof.  At round
    # b the remainders are r mod 2^(b+1); a collision needs a taker w from
    # p-2^b with rem_w in [2^b, 2^(b+1)) joining a stayer u with
    # rem_u < 2^b, and either order of (orig_w, orig_u) contradicts the
    # monotonicity of dist (rem_w <= rem_u or rem_w >= 2^(b+1)).
    # LSB-first right-routing DOES collide: dists (1, 2) at lanes (0, 1).
    for b in reversed(range(_nbits(N))):
        bit = 1 << b
        rin = jnp.roll(r, bit)
        take = (rin < _INF) & ((rin & bit) != 0)
        stay = (r < _INF) & ((r & bit) == 0)
        r = jnp.where(take, rin - bit, jnp.where(stay, r, _INF))
        vals = [
            jnp.where(take, jnp.roll(a, bit), jnp.where(stay, a, _zero(a)))
            for a in vals
        ]
    return vals, r == 0
