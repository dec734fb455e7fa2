"""Standalone mid-range (4 -> 16 worker) scaling probe — re-runs ONLY
bench.py's supplementary mid block so a stormy full-bench run can be
re-pinned when the host quiets down, without repeating the whole
protocol. Prints one JSON line shaped like BENCH's scaling.mid_pair.

Usage: python tools/mid_probe.py [n_pairs] [drain_sec]

drain_sec (default 20) is the idle gap between pairs. The 2026-08-17
probes show the hypervisor throttle is LOAD-TRIGGERED with a slow
release: pair 0 of a cold-start probe hit 0.87 efficiency while pairs
1-2 of the same run fell to ~0.60 (hi-leg walls 12.1 -> 15.8 -> 16.7 s
on identical code+data), so a longer drain lets the host recover
between pairs. The pair count stays FIXED up front — no optional
stopping; min wall per level across the declared pairs.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    drain = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    lo_c, hi_c = 4, 16
    lo_walls, hi_walls = [], []
    for i in range(n_pairs):
        if i:
            time.sleep(drain)  # throttle-tail drain (see module docstring)
        t_lo, _ = bench.timed_flagship(lo_c)
        t_hi, _ = bench.timed_flagship(hi_c)
        lo_walls.append(round(t_lo, 3))
        hi_walls.append(round(t_hi, 3))
        print(
            f"  pair {i}: local[{lo_c}] {t_lo:.1f}s -> local[{hi_c}]"
            f" {t_hi:.1f}s (eff {(t_lo / t_hi) / (hi_c / lo_c):.2f})",
            file=sys.stderr,
        )
    t_lo, t_hi = min(lo_walls), min(hi_walls)
    out = {
        "cores_lo": lo_c,
        "cores_hi": hi_c,
        "wall_lo_sec": t_lo,
        "wall_hi_sec": t_hi,
        "walls_lo_sec": lo_walls,
        "walls_hi_sec": hi_walls,
        "efficiency": round((t_lo / t_hi) / (hi_c / lo_c), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
