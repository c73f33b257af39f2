"""Public nvtext API — mirrors the reference python/nvtext.py (11 module
functions)."""

from __future__ import annotations

import jax
import numpy as np

from . import column as _col
from .nvstrings import nvstrings
from .text import distance as _dist
from .text import ngram as _ngram
from .text import token as _tok


def _c(strs):
    if isinstance(strs, nvstrings):
        return strs._col
    if isinstance(strs, str):
        # a bare string is a single-row column (reference accepts scalar
        # repls in replace_tokens), not an iterable of chars
        strs = [strs]
    return _col.from_host_strings(strs)


def tokenize(strs, delimiter=None):
    if isinstance(delimiter, nvstrings):
        return nvstrings(_tok.tokenize_strings(_c(strs), delimiter._col))
    return nvstrings(_tok.tokenize(_c(strs), delimiter))


def unique_tokens(strs, delimiter=" "):
    return nvstrings(_tok.unique_tokens(_c(strs), delimiter))


def token_count(strs, delimiter=" ", devptr=0):
    out = np.asarray(jax.device_get(_tok.token_count(_c(strs), delimiter)))
    if isinstance(devptr, np.ndarray):
        devptr[: len(out)] = out
        return devptr
    return out.tolist()


def contains_strings(strs, tgts, devptr=0):
    out = np.asarray(
        jax.device_get(_tok.contains_strings(_c(strs), _c(tgts)))
    )
    if isinstance(devptr, np.ndarray):
        devptr[: out.size] = out.ravel()
        return devptr
    return out.tolist()


def strings_counts(strs, tgts, devptr=0):
    out = np.asarray(
        jax.device_get(_tok.strings_counts(_c(strs), _c(tgts)))
    )
    if isinstance(devptr, np.ndarray):
        devptr[: out.size] = out.ravel()
        return devptr
    return out.tolist()


def tokens_counts(strs, tgts, delimiter=" ", devptr=0):
    out = np.asarray(
        jax.device_get(_tok.tokens_counts(_c(strs), _c(tgts), delimiter))
    )
    if isinstance(devptr, np.ndarray):
        devptr[: out.size] = out.ravel()
        return devptr
    return out.tolist()


def replace_tokens(strs, tgts, repls, delimiter=None):
    return nvstrings(
        _tok.replace_tokens(_c(strs), _c(tgts), _c(repls), delimiter)
    )


def normalize_spaces(strs):
    return nvstrings(_tok.normalize_spaces(_c(strs)))


def edit_distance(strs, tgt, algo=0, devptr=0):
    if isinstance(tgt, str):
        out = _dist.edit_distance_scalar(_c(strs), tgt)
    else:
        out = _dist.edit_distance_pairwise(_c(strs), _c(tgt))
    out = np.asarray(jax.device_get(out))
    if isinstance(devptr, np.ndarray):
        devptr[: len(out)] = out
        return devptr
    return out.tolist()


def ngrams(tokens, N=2, sep="_"):
    return nvstrings(_ngram.create_ngrams(_c(tokens), N, sep))


def scatter_count(strs, counts):
    if isinstance(counts, (list, tuple)):
        # None counts mean 0 (reference test_text.py::test_scatter_count)
        counts = [0 if c is None else c for c in counts]
    return nvstrings(_tok.scatter_count(_c(strs), counts))


def porter_stemmer_measure(strs, vowels="aeiou", y_char="y", devptr=0):
    out = np.asarray(
        jax.device_get(
            _dist.porter_stemmer_measure(_c(strs), vowels, y_char)
        )
    )
    if isinstance(devptr, np.ndarray):
        devptr[: len(out)] = out
        return devptr
    return out.tolist()
