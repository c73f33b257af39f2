"""Column statistics (NVStrings::compute_statistics, NVStrings.cu:631,
StringsStatistics.h:20-40): totals, avg/max/min lengths, memory, unique
count, whitespace/digit/alpha/upper/lower char counts, char histogram."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..column import StringColumn
from ..ops import layout
from ..unicode.tables import (
    FLAG_ALPHA,
    FLAG_DIGIT,
    FLAG_LOWER,
    FLAG_SPACE,
    FLAG_UPPER,
    device_tables,
)


def compute_statistics(col: StringColumn) -> dict:
    lens = np.asarray(jax.device_get(col.lengths()))
    valid = np.asarray(jax.device_get(col.validity))
    nch = np.asarray(jax.device_get(layout.char_counts(col)))
    cm = layout.char_map(col)
    cps = layout.codepoints(col)
    total_chars = int(jax.device_get(cm.cs0[-1]))
    flags, _ = device_tables()
    cp_np = np.asarray(jax.device_get(cps))[:total_chars]
    fl = np.asarray(jax.device_get(flags))
    safe = np.clip(cp_np, 0, len(fl) - 1)
    f = fl[safe].astype(int)
    from ..ops.unique import unique_strings

    vl = lens[valid]
    uniques = unique_strings(col).size
    hist_vals, hist_counts = np.unique(cp_np, return_counts=True)
    return {
        "total_strings": int(col.size),
        "null_strings": int((~valid).sum()),
        "empty_strings": int(((lens == 0) & valid).sum()),
        "unique_strings": int(uniques),
        "total_bytes": int(lens[valid].sum()) if valid.any() else 0,
        "total_chars": int(nch[valid].sum()) if valid.any() else 0,
        "avg_bytes": float(vl.mean()) if len(vl) else 0.0,
        "max_bytes": int(vl.max()) if len(vl) else 0,
        "min_bytes": int(vl.min()) if len(vl) else 0,
        "pct95_bytes": float(np.percentile(vl, 95)) if len(vl) else 0.0,
        "device_memory": int(
            col.data.nbytes + col.offsets.nbytes + col.validity.nbytes
        ),
        "whitespace_count": int(((f & FLAG_SPACE) > 0).sum()),
        "digits_count": int(((f & FLAG_DIGIT) > 0).sum()),
        "alpha_count": int(((f & FLAG_ALPHA) > 0).sum()),
        "uppercase_count": int(((f & FLAG_UPPER) > 0).sum()),
        "lowercase_count": int(((f & FLAG_LOWER) > 0).sum()),
        "char_histogram": {
            int(v): int(c) for v, c in zip(hist_vals, hist_counts)
        },
    }
