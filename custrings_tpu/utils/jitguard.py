"""Guard against a jax-0.9 executable-cache corruption on CPU.

Symptom: after several static variants of one large jitted program have
been compiled in a process, re-executing an EARLIER variant raises
`INVALID_ARGUMENT: Execution supplied N buffers but compiled program
expected M buffers` — the cached executable handle no longer matches its
lifted-constant argument list.  `jax.clear_caches()` resolves it, so the
guard retries once after clearing (costing one recompile on the rare
hit).  Deterministic repro: tests/test_split.py's split/rsplit × maxsplit
interleave; distinct per-variant function objects did NOT avoid it, so
the confusion is below the pjit cache.
"""

from __future__ import annotations


def call_resilient(fn, *args):
    try:
        return fn(*args)
    except ValueError as e:
        if "buffers but compiled program expected" not in str(e):
            raise
        import jax

        jax.clear_caches()
        return fn(*args)
