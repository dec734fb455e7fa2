"""Standalone mid-range (4 -> 16 worker) scaling probe — re-runs ONLY
bench.py's supplementary mid block so a stormy full-bench run can be
re-pinned when the host quiets down, without repeating the whole
protocol. Prints one JSON line shaped like BENCH's scaling.mid_pair.

Usage: python tools/mid_probe.py [n_pairs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    lo_c, hi_c = 4, 16
    lo_walls, hi_walls = [], []
    for i in range(n_pairs):
        if i:
            time.sleep(20)  # throttle-tail drain (see bench.py)
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
