#!/usr/bin/env python3
"""Rank per-key scaling ratios between two Bench full-record files.

    python3 tools/rank_envelope.py <small.json> <big.json> [factor]

Prints every key's big/small wall ratio (descending), plus shuffle-byte
ratios when both records carry them (r15: BenchBytes telemetry). The
optional `factor` (default 10) annotates which keys exceed linear
scaling — wall growing faster than the data did — the join_spatial_grid
class the sf1 envelope caught in r14.
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    bs, bb = small.get("shuffle_bytes", {}), big.get("shuffle_bytes", {})
    rows = []
    for k, v in qb.items():
        v0 = qs.get(k)
        if v0 is None or v0 <= 0 or v <= 0:
            continue
        byr = None
        # a big-run byte count of exactly 0 against a >1 MiB small run
        # is the plan-change signal this tool exists to surface — keep
        # it as ratio 0.0, not missing data (r15 ADVICE)
        if bs.get(k, 0) > (1 << 20) and bb.get(k, 0) >= 0 and k in bb:
            byr = bb[k] / bs[k]
        rows.append((v / v0, k, v0, v, byr))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > factor]
    print(f"{'ratio':>7} {'key':<28} {'small_s':>8} {'big_s':>8} {'byte_ratio':>10}")
    for r, k, v0, v, byr in rows:
        mark = " <= SUPER-LINEAR" if r > factor else ""
        print(f"{r:7.2f} {k:<28} {v0:8.3f} {v:8.3f} "
              f"{('%10.2f' % byr) if byr is not None else '         -'}{mark}")
    print(f"\ntotal small={sum(v for v in qs.values() if v > 0):.1f}s "
          f"big={sum(v for v in qb.values() if v > 0):.1f}s "
          f"ratio={sum(v for v in qb.values() if v > 0) / max(1e-9, sum(v for v in qs.values() if v > 0)):.2f} "
          f"| {len(over)} key(s) above {factor}x")


if __name__ == "__main__":
    main()
