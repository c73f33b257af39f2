"""Unicode classification and case tables as device constant arrays.

The reference ships two 65,536-entry host arrays generated from the Unicode
database and copies them to the GPU once (cpp/src/unicode/is_flags.h:17-41,
unicode_flags.h, charcases.h; upload at cpp/src/strings/NVStringsImpl.cu:69-91).
We regenerate equivalent tables from Python's own unicodedata (same underlying
Unicode properties), cache them as .npy next to this module, and expose them as
jnp constants.  Only the BMP (code points < 65536) is covered, matching the
reference's documented 16-bit limitation (docs/source/unicode.md).

Flag bits (is_flags.h:20-41):
    1 = decimal, 2 = numeric, 4 = digit, 8 = alpha, 16 = space,
    32 = upper, 64 = lower.  isalnum == (flags & 15) != 0.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

TABLE_SIZE = 65536

FLAG_DECIMAL = 1
FLAG_NUMERIC = 2
FLAG_DIGIT = 4
FLAG_ALPHA = 8
FLAG_SPACE = 16
FLAG_UPPER = 32
FLAG_LOWER = 64
FLAG_ALPHANUM = 15

_CACHE = os.path.join(os.path.dirname(__file__), "_tables.npz")


def _generate() -> tuple[np.ndarray, np.ndarray]:
    flags = np.zeros(TABLE_SIZE, dtype=np.uint8)
    cases = np.arange(TABLE_SIZE, dtype=np.uint16)
    for cp in range(TABLE_SIZE):
        ch = chr(cp)
        f = 0
        if ch.isdecimal():
            f |= FLAG_DECIMAL
        if ch.isnumeric():
            f |= FLAG_NUMERIC
        if ch.isdigit():
            f |= FLAG_DIGIT
        if ch.isalpha():
            f |= FLAG_ALPHA
        if ch.isspace():
            f |= FLAG_SPACE
        if ch.isupper():
            f |= FLAG_UPPER
        if ch.islower():
            f |= FLAG_LOWER
        flags[cp] = f
        # Opposite-case table: 16-bit 1:1 mappings like the reference's
        # charcases[] — multi-codepoint casings take the FIRST codepoint
        # of the full casing (charcases.h: 0xDF ß->'S', 0x149 ŉ->'ʼ',
        # 0x390 ΐ->'Ι', ...), exactly as the reference table does.
        if f & FLAG_UPPER:
            low = ch.lower()
            if low != ch and ord(low[0]) < TABLE_SIZE:
                cases[cp] = ord(low[0])
        elif f & FLAG_LOWER:
            up = ch.upper()
            if up != ch and ord(up[0]) < TABLE_SIZE:
                cases[cp] = ord(up[0])
    return flags, cases


@lru_cache(maxsize=1)
def host_tables() -> tuple[np.ndarray, np.ndarray]:
    if os.path.exists(_CACHE):
        z = np.load(_CACHE)
        # cache-format check: multi-codepoint casings must follow the
        # reference first-codepoint rule (charcases.h: ß -> 'S')
        if int(z["cases"][0xDF]) == ord("S"):
            return z["flags"], z["cases"]
    flags, cases = _generate()
    try:
        np.savez(_CACHE, flags=flags, cases=cases)
    except OSError:
        pass
    return flags, cases


@lru_cache(maxsize=1)
def device_tables():
    import jax
    import jax.numpy as jnp

    flags, cases = host_tables()
    # first call may happen inside a jit trace; force concrete arrays
    with jax.ensure_compile_time_eval():
        return jnp.asarray(flags), jnp.asarray(cases.astype(np.int32))
