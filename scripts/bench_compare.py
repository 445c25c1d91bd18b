#!/usr/bin/env python
"""Per-query bench regression guard: compare two BENCH_r{N}.json files
and alarm on any query that slowed more than the threshold (default
1.3×). Run after each round:

    python scripts/bench_compare.py              # newest two BENCH_r*.json
    python scripts/bench_compare.py A.json B.json [--threshold 1.3]

Exit code 1 when a regression is flagged, so CI/driver wrappers can
fail loudly.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    return d.get("parsed", d)


def main(argv: list[str]) -> int:
    threshold = 1.3
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]

    if len(argv) >= 2:
        old_path, new_path = argv[0], argv[1]
    else:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        benches = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        if len(benches) < 2:
            print(f"need two BENCH_r*.json files to compare, found {len(benches)} — nothing to do")
            return 0
        old_path, new_path = benches[-2], benches[-1]

    old, new = load(old_path), load(new_path)
    # prefer the full-inventory sweep when both rounds carry it (bench.py
    # "full" key, round 4+): rotated-out headline queries regress there
    oq, nq = old.get("queries", {}), new.get("queries", {})
    if old.get("full") and new.get("full"):
        oq = {**old["full"].get("queries", {}), **oq}
        nq = {**new["full"].get("queries", {}), **nq}
        print("(comparing full-inventory sweeps; headline min-of-2 wins on overlap)")
    print(f"comparing {os.path.basename(old_path)} -> {os.path.basename(new_path)} (threshold {threshold}x)")
    print(f"total (raw, un-normalized): {old.get('value'):.2f}s -> {new.get('value'):.2f}s")
    # machine-speed normalization (bench.py calib_matmul_sec, round 4+):
    # this VM's throughput swings ±40% run-to-run, so raw cross-round
    # ratios are rescaled by the calibration ratio when both carry one
    oc, nc = old.get("calib_matmul_sec"), new.get("calib_matmul_sec")
    if oc and nc:
        speed = nc / oc
        print(f"machine-speed calibration: {oc:.3f}s -> {nc:.3f}s (x{speed:.2f}); ratios normalized by it")
        nq = {k: v / speed for k, v in nq.items()}
        # normalized totals over the COMMON query set, so the headline
        # number printed here can't contradict the per-query verdicts
        common = set(oq) & set(nq)
        o_tot = sum(oq[k] for k in common)
        n_tot = sum(nq[k] for k in common)
        print(
            f"total (normalized, {len(common)} common queries): "
            f"{o_tot:.2f}s -> {n_tot:.2f}s ({n_tot / o_tot:.2f}x)"
            if o_tot > 0
            else "total (normalized): n/a"
        )

    regressions = []
    for name in sorted(nq):
        if name not in oq:
            print(f"  NEW     {name}: {nq[name]:.2f}s")
            continue
        ratio = nq[name] / oq[name] if oq[name] > 0 else float("inf")
        flag = "REGRESS" if ratio > threshold else ("faster " if ratio < 1 / threshold else "       ")
        if ratio > threshold or ratio < 1 / threshold:
            print(f"  {flag} {name}: {oq[name]:.2f}s -> {nq[name]:.2f}s ({ratio:.2f}x)")
        if ratio > threshold:
            regressions.append((name, ratio))
    for name in sorted(set(oq) - set(nq)):
        print(f"  GONE    {name} (was {oq[name]:.2f}s)")

    if regressions:
        print(f"\n{len(regressions)} regression(s) > {threshold}x: " + ", ".join(n for n, _ in regressions))
        return 1
    print("\nno per-query regressions above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
