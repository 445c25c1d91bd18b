"""Gate-window rotation helper: given the driver CORRECTNESS_r*.json
files (newest FIRST), print (a) the names that got a hard-signal row
this round (append them to ``_DRIVER_CHECKED`` in
libmr_spark/queries.py), and (b) the EXACT next 50-slot ``_NEWEST``
window, ready to paste: this round's failures first, then every
exported name with no driver row in any provided file (new queries, in
export order), then backfill with the names whose newest driver row is
OLDEST — continuous re-proof on current data.

Usage:
    python scripts/update_rotation.py CORRECTNESS_r07.json CORRECTNESS_r06.json [...]

The driver checks exactly the first 50 ``queries()`` entries per round;
this script is how each round's builder advances the rotation so every
name eventually gets a driver row on current data.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

WINDOW = 50


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    latest_round: dict[str, int] = {}
    for path in sys.argv[1:]:
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            data = json.load(f)
        for name in data:
            latest_round[name] = max(latest_round.get(name, 0), rnd)

    exported = list(entrymod.queries())
    newest_file = sys.argv[1]
    with open(newest_file) as f:
        newest = json.load(f)
    checked_this_round = sorted(
        n
        for n, row in newest.items()
        if row.get("hash_match") or row.get("err") == "no_oracle"
    )
    failed_this_round = [n for n in newest if n not in checked_this_round]
    never_rowed = [n for n in exported if n not in latest_round]

    print(
        f"# {newest_file}: {len(checked_this_round)} green/rows-only, "
        f"{len(failed_this_round)} failed"
    )
    print("\n# Append to _DRIVER_CHECKED (this round's hard-signal rows):")
    for n in checked_this_round:
        print(f'    "{n}",')

    # rows-only queries (no oracle_sql entry) can never go hash-green —
    # one in the window burns a slot as guaranteed non-green (VERDICT
    # r11 #7: knn_lsh/knn_ivf cost round 11 two slots), so the window
    # is built from oracle-expressible names only
    oracled = set(entrymod.oracle_sql())

    # next window: failures -> never-gated (export order) -> oldest re-proof
    window: list[str] = []
    window += sorted(n for n in failed_this_round if n in oracled)
    window += [n for n in never_rowed if n not in window and n in oracled]
    backfill = sorted(
        (n for n in exported if n in latest_round and n not in window and n in oracled),
        key=lambda n: (latest_round[n], exported.index(n)),
    )
    window += backfill[: max(0, WINDOW - len(window))]

    print(f"\n# Next _NEWEST window ({len(window[:WINDOW])} names — paste into queries.py):")
    print("_NEWEST = [")
    if failed_this_round:
        print("    # FAILED this round — fix before re-gating")
        for n in sorted(failed_this_round):
            print(f'    "{n}",')
    if never_rowed:
        print("    # never driver-gated, export order")
        for n in never_rowed:
            if n in window[:WINDOW]:
                print(f'    "{n}",')
    print("    # oldest re-proof (newest driver row first listed round)")
    for n in window[:WINDOW]:
        if n in latest_round and n not in failed_this_round:
            print(f'    "{n}",  # r{latest_round[n]}')
    print("]")
    if len(window) > WINDOW:
        print(f"# ({len(window) - WINDOW} candidates beyond the 50-slot window)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
