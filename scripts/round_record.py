#!/usr/bin/env python
"""Canonical round-record counts, generated from the JSONs — never by
hand (r12 verdict ask #5: the closing commit miscounted the driver
window's rows-only greens, and a prior commit claimed SURVEY rows that
never landed; both would have been caught by diffing claims against
the recorded state).

Prints, for pasting into STATUS.md / closing commit messages:

- registry size, t2 (oracle-backed) vs rows-only-by-design split;
- the latest CORRECTNESS_r{N}.json window: hash-ok / rows-only-green /
  ERROR rows, with every error named;
- the union of driver coverage across ALL CORRECTNESS_r*.json rounds,
  and the never-driver-checked tail (entries with no green row in any
  round);
- the current DRIVER_WINDOW's composition vs the registry.

Usage: python scripts/round_record.py   (run from anywhere)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_round(path: str) -> dict[str, dict]:
    with open(path) as fh:
        return json.load(fh)


def row_green(rec: dict) -> bool:
    """A driver row is green iff (hash rows) all three matches hold, or
    (rows-only rows — the driver marks them err='no_oracle') the row
    count was actually recorded. An error row has spark_rows=None."""
    if rec.get("hash_match") is not None:
        return not rec.get("err") and bool(
            rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
        )
    if rec.get("err") in (None, "no_oracle"):
        return rec.get("spark_rows") is not None
    return False


def main() -> int:
    from sparkflow_spark.queries import DRIVER_WINDOW, load_all

    reg = load_all()
    t2 = sorted(n for n, q in reg.items() if q.oracle is not None)
    rows_only = sorted(n for n, q in reg.items() if q.oracle is None)
    print(f"registry: {len(reg)} entries = {len(t2)} oracle-backed (t2) "
          f"+ {len(rows_only)} rows-only-by-design")

    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not paths:
        print("no CORRECTNESS_r*.json records found")
        return 1

    green_union: set[str] = set()
    for p in paths:
        for name, rec in load_round(p).items():
            if row_green(rec):
                green_union.add(name)

    latest = paths[-1]
    latest_n = int(re.search(r"_r(\d+)", latest).group(1))
    win = load_round(latest)
    hash_ok = sorted(
        n for n, r in win.items() if r.get("hash_match") is not None and row_green(r)
    )
    ro_ok = sorted(
        n for n, r in win.items() if r.get("hash_match") is None and row_green(r)
    )
    errors = sorted(n for n, r in win.items() if not row_green(r))
    print(f"\nlatest driver window (CORRECTNESS_r{latest_n:02d}.json, "
          f"{len(win)} rows): {len(hash_ok)} hash-ok + {len(ro_ok)} "
          f"rows-only green + {len(errors)} NOT green")
    for n in errors:
        err = str(win[n].get("err") or win[n])
        first = next((ln for ln in err.splitlines() if ln.strip()), err)
        print(f"  NOT GREEN: {n}: {first}")

    unknown = sorted(n for n in green_union if n not in reg)
    never = sorted(n for n in reg if n not in green_union)
    print(f"\ndriver-green union r01–r{latest_n:02d}: {len(green_union & set(reg))} "
          f"of {len(reg)} current entries"
          + (f" (+{len(unknown)} renamed/retired: {unknown})" if unknown else ""))
    print(f"never-driver-checked tail ({len(never)}): {never}")

    missing_from_window = [n for n in DRIVER_WINDOW if n not in reg]
    print(f"\nDRIVER_WINDOW: {len(DRIVER_WINDOW)} names"
          + (f" — NOT REGISTERED: {missing_from_window}" if missing_from_window else
             ", all registered"))
    not_yet_in_window = [n for n in never if n not in DRIVER_WINDOW]
    if not_yet_in_window:
        print(f"never-checked entries NOT in the current window "
              f"({len(not_yet_in_window)}): {not_yet_in_window}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
