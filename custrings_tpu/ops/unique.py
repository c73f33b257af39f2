"""Sort-unique / dictionary-encode core.

TPU-native re-design of NVCategoryImpl_init (cpp/src/category/
NVCategory.cu:220-304): sort_by_key -> adjacent-neq flags -> inclusive scan
(dense ranks) -> inverse-permutation scatter -> unique keys.  The pointer
comparator sort becomes a lexicographic jax.lax.sort over packed big-endian
uint32 key words (ops/array.py); everything else is the same algorithm in
array form.  Null sorts first and forms its own key (NVCategory.cu:250-255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from .pallas_scan import cumsum_i32 as _pscan_cumsum

from ..column import StringColumn
from . import array, layout


@partial(jax.jit, static_argnums=(1, 2))
def _encode_sorted(col: StringColumn, width: int, full_width: int):
    n = col.size
    ord_ = array._order_impl(col, width, array.SORT_NAME, True, True)
    words = array._key_words(col, width)  # [n, W] (possibly truncated)
    sw = words[ord_]  # sorted key words
    slen = col.lengths()[ord_]
    sval = col.validity[ord_]
    neq = jnp.zeros(n, jnp.bool_)
    ambiguous = jnp.zeros((), jnp.bool_)
    if n > 1:
        row_neq = (
            jnp.any(sw[1:] != sw[:-1], axis=1)
            | (slen[1:] != slen[:-1])
            | (sval[1:] != sval[:-1])
        )
        # two nulls are equal regardless of (zero-length) payload
        both_null = (~sval[1:]) & (~sval[:-1])
        neq = neq.at[1:].set(row_neq & ~both_null)
        if width < full_width:
            # Truncated-word tie between rows extending past the width: the
            # sort resolved it by LENGTH.  That order is correct iff the
            # rows agree on the compared region past the prefix (equal up
            # to min(len): duplicates, or prefix-extensions — shorter
            # sorts first, which IS lexicographic).  Compare the tails
            # exactly on device; only genuinely differing tails escalate.
            # (Round-2 perf fix: duplicates of >width rows — the common
            # dictionary-encode case — no longer force a full-width sort.)
            words_eq = ~jnp.any(sw[1:] != sw[:-1], axis=1)
            overflow = (slen[1:] > width) | (slen[:-1] > width)
            tied = words_eq & overflow & ~both_null
            tail_w = full_width - width
            starts_s = col.offsets[:-1][ord_]
            cap = col.data.shape[0]
            if layout._use_pallas_window():
                # words-native tail compare: one ragged window DMA past
                # the prefix; bytes live in BOTH rows compared via a
                # joint big-endian tail mask (capacity-sized XLA gathers
                # run at ~120M elem/s — seconds at 1M rows)
                from .array import _mask_word_tails
                from .pallas_window import ragged_gather_words

                tw = -(-tail_w // 4) * 4
                tails = jax.lax.bitcast_convert_type(
                    ragged_gather_words(col.data, starts_s + width, tw),
                    jnp.uint32,
                )
                rem = jnp.maximum(slen - width, 0)
                # per-row mask of live tail bytes; a pair compares only
                # bytes live in BOTH rows
                ones = jnp.full_like(tails, jnp.uint32(0xFFFFFFFF))
                m = _mask_word_tails(ones, rem)
                mj = m[1:] & m[:-1]
                diff = jnp.any(
                    (tails[1:] & mj) != (tails[:-1] & mj), axis=1
                )
            else:
                # compare tails in 64-byte blocks (a single [n, tail_w]
                # index matrix is ~2 GB at 1M rows x 500-byte tails)
                BLK = min(64, tail_w)
                k = jnp.arange(BLK, dtype=jnp.int32)[None, :]

                def tail(i0, base):  # bytes [base, base+BLK) per row
                    idx = jnp.minimum(
                        starts_s[i0][:, None] + base + k, cap - 1
                    )
                    live = (base + k) < slen[i0][:, None]
                    return jnp.where(live, col.data[idx], jnp.uint8(0)), live

                def block(c, diff):
                    base = width + c * BLK
                    a, la = tail(slice(0, n - 1), base)
                    b, lb = tail(slice(1, n), base)
                    return diff | jnp.any((a != b) & la & lb, axis=1)

                diff = jax.lax.fori_loop(
                    0, -(-tail_w // BLK), block,
                    jnp.zeros(n - 1, jnp.bool_),
                )
            ambiguous = jnp.any(tied & diff)
    ranks = _pscan_cumsum(neq.astype(jnp.int32))
    values = jnp.zeros(n, jnp.int32).at[ord_].set(ranks)
    # first-occurrence (in sorted order) positions -> key gather indexes
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), neq[1:]]) if n else neq
    return ord_, ranks, values, first, ambiguous


def dictionary_encode(col: StringColumn):
    """Return (keys: StringColumn sorted unique, values: int32[rows]).

    values[i] = rank of col[i] in the sorted unique keyset, the exact
    contract of nvcategory (python/tests/test_category.py:31-40).

    Perf: the variadic lax.sort degrades with operand count, so keys start
    as a 64-byte prefix; an exact ambiguity check (truncated tie but full
    rows differ) escalates the width until the ordering is provably the
    full lexicographic one.
    """
    n = col.size
    if n == 0:
        from ..column import empty_column

        return empty_column(0), jnp.zeros(0, jnp.int32)
    full_width = -(-layout.max_row_bytes(col) // 4) * 4
    width = min(full_width, 64)
    import numpy as np

    while True:
        ord_, ranks, values, first, ambiguous = _encode_sorted(
            col, width, full_width
        )
        # one host round trip for the escalation check + compaction inputs
        amb_np, first_np, ord_np = jax.device_get((ambiguous, first, ord_))
        if width >= full_width or not bool(amb_np):
            break
        width = min(width * 4, full_width)

    key_idx = ord_np[np.nonzero(first_np)[0]]
    # unique row indices: gathered bytes bounded by the source capacity
    from ..column import BOUND_SYNC_THRESHOLD
    from .array import _gather_impl

    if col.capacity <= BOUND_SYNC_THRESHOLD:
        keys = _gather_impl(
            col, jnp.asarray(key_idx, jnp.int32), col.capacity
        )
    else:
        keys = array.gather(col, key_idx.astype(jnp.int32))
    return keys, values


def unique_strings(col: StringColumn) -> StringColumn:
    keys, _ = dictionary_encode(col)
    return keys


def searchsorted_keys(keys: StringColumn, queries: StringColumn) -> jax.Array:
    """For each query row, the index of the equal key or -1.

    Used by value(str), add/remove/set_keys remapping (NVCategory.cu:766).
    Nulls match the null key if present.
    """
    kw_width = max(
        layout.max_row_bytes(keys), layout.max_row_bytes(queries)
    )
    kw_width = -(-kw_width // 4) * 4
    kw = array._key_words(keys, kw_width)  # [K, W]
    qw = array._key_words(queries, kw_width)  # [Q, W]
    klen, qlen = keys.lengths(), queries.lengths()
    kval, qval = keys.validity, queries.validity
    # lexicographic searchsorted via vectorized binary search
    K = keys.size

    def less(qi, ki):
        # is key ki < query qi ?
        # null < non-null
        kn, qn = ~kval[ki], ~qval[qi]
        a, b = kw[ki], qw[qi]
        neq = a != b
        first = jnp.argmax(neq)  # first differing word
        words_less = jnp.where(
            jnp.any(neq), a[first] < b[first], klen[ki] < qlen[qi]
        )
        return jnp.where(kn | qn, kn & ~qn, words_less)

    def eq(qi, ki):
        kn, qn = ~kval[ki], ~qval[qi]
        same = jnp.all(kw[ki] == qw[qi]) & (klen[ki] == qlen[qi])
        return jnp.where(kn | qn, kn & qn, same)

    def find_one(qi):
        def body(state):
            lo, hi = state
            mid = (lo + hi) // 2
            l = less(qi, mid)
            return (jnp.where(l, mid + 1, lo), jnp.where(l, hi, mid))

        def cond(state):
            lo, hi = state
            return lo < hi

        lo, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(K))
        )
        hit = jnp.where((lo < K) & eq(qi, jnp.minimum(lo, K - 1)), lo, -1)
        return hit

    return jax.vmap(find_one)(jnp.arange(queries.size, dtype=jnp.int32))


def first_not_less(keys: StringColumn, query: StringColumn) -> jax.Array:
    """Scalar: first position p with NOT (keys[p] < query[0]), K if none.

    Vectorized over the whole keyset (exact for ANY key order — it is the
    device replacement for the host linear walk in get_value_bounds;
    reference: NVCategory.cu get_value_bounds:795).  Ordering is
    custr::compare's: null first, then bytewise lexicographic."""
    kw_width = max(layout.max_row_bytes(keys), layout.max_row_bytes(query))
    kw_width = -(-max(kw_width, 4) // 4) * 4
    kw = array._key_words(keys, kw_width)  # [K, W]
    qw = array._key_words(query, kw_width)[0]  # [W]
    klen, qlen = keys.lengths(), query.lengths()[0]
    kval, qval = keys.validity, query.validity[0]
    neq = kw != qw[None, :]
    first = jnp.argmax(neq, axis=1)
    fk = jnp.take_along_axis(kw, first[:, None], axis=1)[:, 0]
    fq = qw[first]
    words_less = jnp.where(jnp.any(neq, axis=1), fk < fq, klen < qlen)
    less = jnp.where(~kval | ~qval, ~kval & qval, words_less)
    # first False in `less` (NOT the count: exact parity with the linear
    # walk even on unsorted keysets from merge_category)
    return jnp.where(
        jnp.any(~less), jnp.argmax(~less).astype(jnp.int32), keys.size
    )
