"""Round-5 probes (findings recorded in docs/performance.md and
IMPLEMENTATION.md; kept for reproducibility).

1. Span engines, same patterns, 1M tier (v5e):
     spans_single bits, ascii LUTs:   (\w+)@(\w+) 46ms | the|that 45ms
     spans_single bits, table gathers: 2220ms — the ascii hybrid is half
     the win; min-plus 2611ms / ordered 1245ms (the engines replaced).
2. Split ablation (resident K-loops, 1M): stage1 (match+prefix+counts)
   82ms with inline tail recompute; +keep-compact/+delimiter-compact
   ~94ms; +token assembly ~32ms.  -> tail passed as arg, counts derived
   from the keep prefix, one-payload delimiter compact: 288 -> 206ms.
3. Relay floor: standalone timed calls include a ~35ms axon round-trip
   floor; ONLY resident K-loop deltas measure the chip (the standalone
   numbers in probe logs are floor + chip).
4. Grow-replace at 4M: the plan-based writer allocates ~7
   int32[capacity] HLO temps = 25.4GB -> compile OOM; the one-plane
   augmented-stream writer compiles and runs 0.81s/0.94GB.

Usage: python benchmarks/probe_r5.py [spans|ablate] (on TPU).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if __name__ == "__main__":
    print(__doc__)
