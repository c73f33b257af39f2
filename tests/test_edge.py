"""Degenerate-input sweep: empty column and all-null column through the
public API (the reference's C paths handle count==0 by early-return, e.g.
cpp/src/NVStrings.cu size checks; we mirror that at the driver level)."""

import pytest

import custrings_tpu.nvcategory as nvc
import custrings_tpu.nvstrings as nvs
import custrings_tpu.nvtext as nvt

CALLS = [
    ("lower", lambda s: s.lower()),
    ("title", lambda s: s.title()),
    ("len", lambda s: s.len()),
    ("pad", lambda s: s.pad(5)),
    ("zfill", lambda s: s.zfill(5)),
    ("repeat", lambda s: s.repeat(2)),
    ("wrap", lambda s: s.wrap(3)),
    ("replace", lambda s: s.replace("a", "b", regex=False)),
    ("replace_re", lambda s: s.replace(r"a+", "b")),
    ("fillna", lambda s: s.fillna("x")),
    ("insert", lambda s: s.insert(0, "z")),
    ("slice_replace", lambda s: s.slice_replace(0, 1, "z")),
    ("translate", lambda s: s.translate([(97, 98)])),
    ("contains", lambda s: s.contains(r"a\w")),
    ("findall_record", lambda s: s.findall_record(r"\w+")),
    ("extract", lambda s: s.extract(r"(\w)(\w)")),
    ("extract_record", lambda s: s.extract_record(r"(\w)")),
    ("split_record", lambda s: s.split_record(" ")),
    ("rsplit_record", lambda s: s.rsplit_record(" ")),
    ("partition", lambda s: s.partition(" ")),
    ("strip", lambda s: s.strip()),
    ("slice", lambda s: s.slice(1, 3)),
    ("cat_none", lambda s: s.cat(sep=":", na_rep="_")),
    ("join", lambda s: s.join("-")),
    ("hash", lambda s: s.hash()),
    ("stoi", lambda s: s.stoi()),
    ("url_encode", lambda s: s.url_encode()),
    ("url_decode", lambda s: s.url_decode()),
    ("sort", lambda s: s.sort(2)),
    ("order", lambda s: s.order(2)),
    ("gather_empty", lambda s: s.gather([])),
    ("category_keys", lambda s: nvc.from_strings(s).keys()),
    ("tokenize", lambda s: nvt.tokenize(s)),
    ("token_count", lambda s: nvt.token_count(s)),
    ("unique_tokens", lambda s: nvt.unique_tokens(s)),
    ("ngrams", lambda s: nvt.ngrams(s, 2, "_")),
    ("edit_distance", lambda s: nvt.edit_distance(s, "ab")),
    ("porter", lambda s: nvt.porter_stemmer_measure(s)),
]


@pytest.mark.parametrize("label,fn", CALLS, ids=[c[0] for c in CALLS])
@pytest.mark.parametrize("inputs", [[], [None, None]], ids=["empty", "allnull"])
def test_degenerate_inputs(inputs, label, fn):
    s = nvs.to_device(inputs)
    r = fn(s)  # must not raise
    if hasattr(r, "to_host"):
        r.to_host()


def test_cat_no_others_reference_vectors():
    # reference python/tests/test_combine.py:7-23
    strs = nvs.to_device(["abc", "def", None, "", "jkl", "mno", "accént"])
    assert strs.cat().to_host() == ["abcdefjklmnoaccént"]
    assert strs.cat(sep=":").to_host() == ["abc:def::jkl:mno:accént"]
    assert strs.cat(sep=":", na_rep="_").to_host() == [
        "abc:def:_::jkl:mno:accént"
    ]


def test_empty_results_shapes():
    s = nvs.to_device([])
    assert s.lower().to_host() == []
    assert list(s.hash()) == []
    assert s.split_record(" ") == []
    assert list(nvt.token_count(s)) == []
