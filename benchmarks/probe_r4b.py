"""Round-4 probes: spans-engine routing head-to-head + categorize breakdown.

1. Both exact-span engines (min-plus nfa_spans vs ordered executor) on
   BOTH benchmark pattern classes at 16k and 1M rows — the measured
   crossover that VERDICT r3 weak #5 asked for before re-routing the
   engine choice.
2. The categorize (dictionary encode) cost decomposition at 1M rows:
   single-key stable sort pass, per-pass permutation gather, the [n, W]
   row gather, and the full _order_impl / _encode_sorted — to find the
   super-linear term behind the flat 562 ms.

Protocol: resident-style K-loop with jax.lax.optimization_barrier on the
loop-carried operands (the relay memoizes repeated executions AND XLA
hoists loop-invariant computation; the barrier defeats both), timing
(t_K - t_1) / (K - 1).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def kloop(name, body, operands, K=4):
    """body(ops_tuple) -> scalar; operands: tuple of device arrays."""

    @partial(jax.jit, static_argnums=(1,))
    def loop(ops, KK: int):
        def step(i, carry):
            ops_b, acc = carry
            ops_b = jax.lax.optimization_barrier(ops_b)
            acc = acc + body(ops_b)
            return ops_b, acc

        _, acc = jax.lax.fori_loop(
            0, KK, step, (ops, jnp.zeros((), jnp.int32))
        )
        return acc

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(loop(operands, 1))
        c1 = time.perf_counter() - t0
        jax.block_until_ready(loop(operands, K))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(operands, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(operands, K))
        tk = time.perf_counter() - t0
        per = (tk - t1) / (K - 1)
        print(
            f"{name}: per-iter={per * 1e3:.2f}ms (t1={t1 * 1e3:.0f}"
            f" tK={tk * 1e3:.0f} compile1={c1:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"[:300], flush=True)


def spans_probe(rows):
    from bench import load_corpus
    from custrings_tpu import column as colmod
    from custrings_tpu.ops import layout
    from custrings_tpu.regex import ops as rx

    lines = load_corpus(rows)
    col = colmod.from_host_strings(lines)
    cm_width = layout.max_row_bytes(col)
    chars, nch = layout.char_matrix(col, cm_width)
    n = col.size
    for patname, pat in (("safe", r"(\w+)@(\w+)"), ("ambig", r"the|that")):
        dp = rx.get_program(pat)
        zeros = jnp.zeros((n,), jnp.int32)
        nends = jnp.full((n,), -1, jnp.int32)

        def body_minplus(ops):
            ch, le, z = ops
            m, b, e = dp.nfa_spans(ch, le, z)
            return jnp.sum(b) + jnp.sum(e) + jnp.sum(m.astype(jnp.int32))

        def body_ordered(ops):
            ch, le, z = ops
            m, b, e = dp.ordered_spans(ch, le, z, nends, 0)
            return jnp.sum(b) + jnp.sum(e) + jnp.sum(m.astype(jnp.int32))

        if dp.prog.longest_safe:
            kloop(f"minplus_{patname}_{rows}", body_minplus,
                  (chars, nch, zeros))
        kloop(f"ordered_{patname}_{rows}", body_ordered,
              (chars, nch, zeros))


def categorize_probe(rows):
    from bench import load_corpus
    from benchmarks.resident import _settled_category_width
    from custrings_tpu import column as colmod
    from custrings_tpu.column import StringColumn
    from custrings_tpu.ops import array, unique as unique_mod

    lines = load_corpus(rows)
    col = colmod.from_host_strings(lines)
    width, full, ucap = _settled_category_width(col)
    print(f"settled width={width} full={full}", flush=True)
    n = col.size
    words = array._key_words(col, width)
    W = int(words.shape[1])
    print(f"key words W={W} (keys = W + 2)", flush=True)
    rows_i = jnp.arange(n, dtype=jnp.int32)
    key0 = words[:, 0]
    perm0 = jax.random.permutation(jax.random.key(1), n).astype(jnp.int32)

    def body_sort1(ops):
        (g,) = ops
        _, idx = jax.lax.sort((g, rows_i), num_keys=1, is_stable=True)
        return jnp.sum(idx[:8])

    kloop(f"sort1key_{rows}", body_sort1, (key0,))

    def body_sort3(ops):
        (g,) = ops
        _, _, _, idx = jax.lax.sort(
            (g, g ^ jnp.uint32(7), g + jnp.uint32(3), rows_i),
            num_keys=3, is_stable=True,
        )
        return jnp.sum(idx[:8])

    kloop(f"sort3key_{rows}", body_sort3, (key0,))

    def body_rowgather(ops):
        w, perm = ops
        return jnp.sum(w[perm][:8, :]).astype(jnp.int32)

    kloop(f"rowgather_nW_{rows}", body_rowgather, (words, perm0))

    def body_elemgather(ops):
        w, perm = ops
        return jnp.sum(w[:, 0][perm][:8]).astype(jnp.int32)

    kloop(f"elemgather_n_{rows}", body_elemgather, (words, perm0))

    def body_order(ops):
        d, o, v = ops
        c = StringColumn(d, o, v)
        return jnp.sum(
            array._order_impl(c, width, array.SORT_NAME, True, True)[:8]
        )

    kloop(f"order_impl_{rows}", body_order,
          (col.data, col.offsets, col.validity))

    def body_encode(ops):
        d, o, v = ops
        c = StringColumn(d, o, v)
        out = unique_mod._encode_sorted(c, width, full)
        return jnp.sum(out[2][:8])

    kloop(f"encode_sorted_{rows}", body_encode,
          (col.data, col.offsets, col.validity))

    def body_hashed(ops):
        d, o, v = ops
        c = StringColumn(d, o, v)
        vg, rf, u, kw, _ = unique_mod._hash_group_phase(c, width, full)
        vals, _, _, _ = unique_mod._rep_rank_phase(
            c, kw, vg, rf, u, ucap, width, full
        )
        return jnp.sum(vals[:8])

    kloop(f"encode_hashed_{rows}", body_hashed,
          (col.data, col.offsets, col.validity))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("spans", "all"):
        spans_probe(1 << 14)
        spans_probe(1 << 20)
    if which in ("cat", "all"):
        categorize_probe(1 << 20)
