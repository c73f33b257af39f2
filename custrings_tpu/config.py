"""Global configuration for the TPU-native string engine.

The reference library (cuStrings) has no runtime config system — only
build-time CMake flags (see /root/reference SURVEY §5.6).  For the TPU engine a
small config object is genuinely useful: XLA compiles one program per distinct
shape, so we bucket dynamic byte-counts into a geometric series of capacities
to keep the jit cache small, and we expose tile-size knobs for Pallas kernels.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # Bytes buffers are padded up to a bucket capacity so that materializing
    # ops (split/replace/case/...) hit the XLA compile cache instead of
    # recompiling for every distinct output byte-count.  `bucket_bits` is the
    # number of significand bits kept: capacity = ceil(n / 2^k) * 2^k with
    # 2^k = 2^(floor(log2 n) - bucket_bits).  3 bits -> <= 12.5% padding.
    bucket_bits: int = 3
    # Minimum capacity of any byte buffer (keeps tiny test columns aligned).
    min_bucket: int = 128
    # Row-tile size for Pallas kernels operating on padded [rows, maxlen]
    # views (regex NFA, edit distance).
    row_tile: int = 8
    # Default maximum instruction count accepted by the regex compiler
    # (reference caps stack tiers at 1000 insts, cpp/src/regex/regex.cuh:80-88).
    max_regex_insts: int = 1000
    # Whether Pallas kernels run in interpret mode (set automatically on CPU).
    pallas_interpret: bool | None = None


CONFIG = Config()


def bucket_bytes(n: int, cfg: Config = CONFIG) -> int:
    """Round byte-count n up to a bucketed capacity (geometric series)."""
    n = int(n)
    if n <= cfg.min_bucket:
        return cfg.min_bucket
    step = 1 << max((n - 1).bit_length() - cfg.bucket_bits, 0)
    return -(-n // step) * step


def use_interpret_mode() -> bool:
    """True when Pallas kernels must run interpreted (no TPU present)."""
    if CONFIG.pallas_interpret is not None:
        return CONFIG.pallas_interpret
    import jax

    return jax.default_backend() != "tpu"


def _env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "false", "False", "")
