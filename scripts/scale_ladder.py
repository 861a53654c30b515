#!/usr/bin/env python3
"""Per-query scaling exponents from two Bench runs at different SFs.

Usage: scale_ladder.py bench_small.json bench_big.json ratio
  ratio = big_sf / small_sf (e.g. 10 for sf0.01 -> sf0.1)

exponent = log(t_big / t_small) / log(ratio): ~0 = fixed overhead
dominates, ~1 = linear, >1.2 = superlinear shape worth a look (with the
caveat that sub-second timings are mostly constant overhead, so the
exponent only means something when the big-SF time is well above ~1 s).
"""
import json
import math
import sys


def main() -> None:
    small_f, big_f, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    small = json.load(open(small_f))["queries"]
    big = json.load(open(big_f))["queries"]
    rows = []
    for q in sorted(set(small) & set(big)):
        ts, tb = small[q], big[q]
        if ts <= 0 or tb <= 0:
            continue
        exp = math.log(tb / ts) / math.log(ratio)
        rows.append((exp, q, ts, tb))
    rows.sort(reverse=True)
    print(f"{'query':<28} {'t_small':>8} {'t_big':>8} {'exp':>6}")
    for exp, q, ts, tb in rows:
        flag = " <== superlinear" if exp > 1.2 and tb > 1.0 else ""
        print(f"{q:<28} {ts:>8.3f} {tb:>8.3f} {exp:>6.2f}{flag}")
    meaningful = [r for r in rows if r[3] > 1.0]
    bad = [r for r in meaningful if r[0] > 1.2]
    print(f"\n{len(rows)} queries; {len(meaningful)} with t_big > 1 s; "
          f"{len(bad)} superlinear (exp > 1.2 at t_big > 1 s)")


if __name__ == "__main__":
    main()
