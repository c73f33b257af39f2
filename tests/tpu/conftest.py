"""Real-hardware test leg (VERDICT r1 weak item 7).

Runs in its OWN pytest process with the container's default backend (the
axon TPU tunnel) — do not mix with the main suite, which forces the cpu
platform process-wide.  Every test here is small (a few hundred rows, one
or two compiles) because each distinct shape pays a remote compile.

Skips cleanly when no TPU is reachable.
"""

import sys

import pytest

# Pallas kernel tracing nests deep inside pytest's own frames; the default
# 1000-frame limit RecursionErrors mid-trace (standalone runs are fine).
sys.setrecursionlimit(10000)

# pytest imports the PARENT tests/conftest.py first, and that forces
# jax_platforms=cpu process-wide — which silently skipped this whole leg.
# The backend is not initialized yet at conftest-import time, so resetting
# the platform here restores the container default (the TPU tunnel).
# ADVICE r2: the reset is process-wide, so only apply it when this leg is
# the ONLY thing being collected (its own pytest process, as ci/run_tests.sh
# invokes it) or when explicitly forced via CUSTRINGS_TPU_LEG=1.  A mixed
# command line like `pytest tests tests/tpu` keeps the CPU forcing.
import os
import sys

_positional = [a for a in sys.argv[1:] if not a.startswith("-")]
_own_process = os.environ.get("CUSTRINGS_TPU_LEG") == "1" or (
    bool(_positional)
    and all("tests/tpu" in a.replace(os.sep, "/") for a in _positional)
)
if _own_process:
    import jax

    jax.config.update("jax_platforms", None)


def _backend():
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "none"


def pytest_collection_modifyitems(config, items):
    if _backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU backend reachable")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def tpu():
    import jax

    return jax.devices()[0]
