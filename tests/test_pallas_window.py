"""Pallas ragged-window kernel: interpret-mode parity on CPU.

The kernel is the default padded-view/char-matrix builder on real TPU
hardware (tests/tpu has the on-chip leg); here CUSTRINGS_PALLAS_WINDOW=1
forces the same code through the Pallas interpreter so semantics are
covered in the regular CPU suite.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from custrings_tpu import column as colmod
from custrings_tpu.ops import layout
from custrings_tpu.ops.pallas_window import ragged_gather

STRINGS = [
    "hello world",
    "",
    "a",
    "tschüß éé",  # two-byte sequences
    "日本語のテキスト",  # three-byte sequences
    "x" * 300,
    "mixed ascii & 中文 tail",
    None,
    "🎉 four-byte emoji 🎉",
]


def test_ragged_gather_matches_windows():
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.integers(0, 256, 3000, dtype=np.uint8))
    starts = jnp.asarray(np.sort(rng.integers(0, 3000, 64)).astype(np.int32))
    out = np.asarray(ragged_gather(data, starts, 100))
    dp = np.concatenate([np.asarray(data), np.zeros(8192, np.uint8)])
    ref = np.stack([dp[s : s + 100] for s in np.asarray(starts)])
    assert (out == ref).all()


def test_ragged_gather_row_chunking(monkeypatch):
    """Columns past the SMEM starts budget split into several pallas
    calls (round 3: 1M-row starts overflowed the 1 MB SMEM).  Shrink the
    threshold so the chunked path runs at interpret-mode-friendly size."""
    from custrings_tpu.ops import pallas_window as pw

    monkeypatch.setattr(pw, "_SMEM_ROWS", 16)
    rng = np.random.default_rng(8)
    data = jnp.asarray(rng.integers(0, 256, 5000, dtype=np.uint8))
    # 50 rows -> padded to 56 -> chunks of 16 + a 8-row tail
    starts = jnp.asarray(np.sort(rng.integers(0, 5000, 50)).astype(np.int32))
    out = np.asarray(ragged_gather(data, starts, 64))
    dp = np.concatenate([np.asarray(data), np.zeros(8192, np.uint8)])
    ref = np.stack([dp[s : s + 64] for s in np.asarray(starts)])
    assert (out == ref).all()


def test_padded_view_pallas_parity(monkeypatch):
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "1")
    col = colmod.from_host_strings(STRINGS)
    w = layout.max_row_bytes(col)
    a = np.asarray(layout._padded_view(col.data, col.offsets, w))
    b = np.asarray(layout._padded_view_pallas(col.data, col.offsets, w))
    assert (a == b).all()


def test_char_matrix_hybrid_parity(monkeypatch):
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "1")
    col = colmod.from_host_strings(STRINGS)
    w = layout.max_row_bytes(col)
    # force the general path on a twin column for reference
    ref_col = colmod.from_host_strings(STRINGS)
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "0")
    mat_ref, nch_ref = layout.char_matrix(ref_col, w)
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "1")
    na = layout.row_nonascii_ids(col)
    assert na is not None and len(na) >= 3
    mat, nch = layout._char_matrix_hybrid(
        col.data, col.offsets, col.lengths(), jnp.asarray(na, jnp.int32), w
    )
    assert (np.asarray(nch) == np.asarray(nch_ref)).all()
    m, mr = np.asarray(mat), np.asarray(mat_ref)
    nc = np.asarray(nch)
    for r in range(len(STRINGS)):
        assert (m[r, : nc[r]] == mr[r, : nc[r]]).all(), r


def test_mostly_ascii_column_uses_hybrid(monkeypatch):
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "1")
    strs = ["plain %d" % i for i in range(64)] + ["ünïcode"]
    col = colmod.from_host_strings(strs)
    mat, nch = layout.char_matrix(col)
    assert int(nch[-1]) == 7
    import custrings_tpu.nvstrings as nvs

    s = nvs.to_host_strings if hasattr(nvs, "to_host_strings") else None
    # decode row -1 back from codepoints
    got = "".join(chr(c) for c in np.asarray(mat[-1])[: int(nch[-1])])
    assert got == "ünïcode"


def test_utf8_byte_at_matches_encoder():
    """The cummax-fill writer's per-byte encoder vs encode_codepoints."""
    rng = np.random.default_rng(3)
    import numpy as _np

    cps = _np.concatenate(
        [
            rng.integers(1, 0x80, 100),
            rng.integers(0x80, 0x800, 100),
            rng.integers(0x800, 0x10000, 100),
            rng.integers(0x10000, 0x110000, 100),
        ]
    ).astype(_np.int32)
    from custrings_tpu.ops.charwise import _utf8_byte_at
    from custrings_tpu.ops.layout import encode_codepoints

    j = jnp.asarray(cps)
    bts, w = encode_codepoints(j)
    for t in range(4):
        got = np.asarray(_utf8_byte_at(j, jnp.full(j.shape, t, jnp.int32)))
        mask = np.asarray(w) > t
        assert (got[mask] == np.asarray(bts[:, t])[mask]).all()


def test_compact_bytes_parity(monkeypatch):
    """Stream-compaction kernel vs numpy, interpret mode, several drop
    densities (incl. the overflow fallback)."""
    from custrings_tpu.ops.pallas_compact import TB, compact_bytes

    rng = np.random.default_rng(11)
    for cap, density in [(8192, 0.15), (4096, 0.95), (6144, 0.0)]:
        data = rng.integers(0, 256, cap, dtype=np.uint8)
        keep = rng.random(cap) > density
        out_cap = TB * max(-(-int(keep.sum()) // TB), 1)
        out = np.asarray(
            compact_bytes(jnp.asarray(data), jnp.asarray(keep), out_cap)
        )
        exp = data[keep]
        assert (out[: exp.size] == exp).all()
        assert (out[exp.size :] == 0).all()


def test_split_with_pallas_compact(monkeypatch):
    monkeypatch.setenv("CUSTRINGS_PALLAS_WINDOW", "1")
    from custrings_tpu.ops import split as sp

    strs = ["a b  c", "", None, "xx yy", " lead", "trail ", "no-delims"] * 40
    col = colmod.from_host_strings(strs)
    tc = sp.split_record(col, " ")
    from custrings_tpu import column as cm

    toks = cm.to_host_strings(tc.tokens)
    exp = [t for s in strs if s is not None for t in s.split(" ")]
    assert toks == exp
