"""Rotate __spark_entry__._PRIORITY for the next driver round.

The driver checks roughly the first 50 entries of queries() each round.
This script reads the newest CORRECTNESS_r*.json and prints a new
_PRIORITY body ordered:

1. queries that FAILED a check last round (fix + re-verify first),
2. queries with no correctness row yet (never checked, any round),
3. everything else (regression-stable greens), oldest-green first.

Usage: python scripts/rotate_priority.py   # prints the list to paste
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry

    names = list(entry.queries())
    checked: dict[str, bool] = {}  # name -> all three checks green
    last_round: dict[str, int] = {}  # name -> round of latest check
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        rows = json.load(open(path))
        for name, r in rows.items():
            ok = bool(
                r.get("rows_match") and r.get("schema_match")
                and (r.get("hash_match") in (True, None))
                and not r.get("err")
            )
            # later rounds override earlier verdicts
            checked[name] = ok
            last_round[name] = rnd

    failed = [n for n in names if checked.get(n) is False]
    never = [n for n in names if n not in checked]
    # stalest greens first, so every query's latest driver row stays
    # fresh as the ~50-query window slides over rounds
    green = sorted(
        (n for n in names if checked.get(n)),
        key=lambda n: (last_round[n], n),
    )

    print(f"# failed last check: {len(failed)}, never checked: {len(never)}, "
          f"green: {len(green)}  (window ~50)")
    print("_PRIORITY: list[str] = [")
    for section, items in (("failed", failed), ("never checked", never),
                           ("stable greens", green)):
        if items:
            print(f"    # {section}")
            for n in items:
                print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
