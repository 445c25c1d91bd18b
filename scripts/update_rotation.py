"""Gate-window rotation helper: given a driver CORRECTNESS_r*.json,
print (a) the names that got a hard-signal row this round (append them
to ``_DRIVER_CHECKED`` in libmr_spark/queries.py), and (b) the exported
names that STILL have no row in any provided round file (candidates for
the next round's ``_NEWEST`` priority window).

Usage:
    python scripts/update_rotation.py CORRECTNESS_r03.json [CORRECTNESS_r02.json ...]

The driver checks exactly the first 50 ``queries()`` entries per round;
this script is how each round's builder advances the rotation so every
name eventually gets a driver row on current data.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    seen_green: set[str] = set()
    seen_any: set[str] = set()
    for path in sys.argv[1:]:
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            seen_any.add(name)
            if row.get("hash_match") or row.get("err") == "no_oracle":
                seen_green.add(name)

    exported = list(entrymod.queries())
    newest_file = sys.argv[1]
    with open(newest_file) as f:
        newest = json.load(f)
    checked_this_round = sorted(
        n for n, row in newest.items() if row.get("hash_match") or row.get("err") == "no_oracle"
    )
    failed_this_round = sorted(
        n for n, row in newest.items() if n not in checked_this_round
    )
    never_rowed = [n for n in exported if n not in seen_any]

    print(f"# {newest_file}: {len(checked_this_round)} green/rows-only, {len(failed_this_round)} failed")
    print("\n# Append to _DRIVER_CHECKED:")
    for n in checked_this_round:
        print(f'    "{n}",')
    if failed_this_round:
        print("\n# FAILED this round — fix and keep in _NEWEST:")
        for n in failed_this_round:
            print(f"    {n}")
    print(f"\n# Never had a driver row ({len(never_rowed)}) — next _NEWEST candidates, export order:")
    for n in never_rowed:
        print(f"    {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
