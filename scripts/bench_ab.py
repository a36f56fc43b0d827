#!/usr/bin/env python
"""THE recorded bench-freeze procedure (r10 verdict ask #8).

Rounds 8-10 each burned a cycle attributing an elevated first bench
reading to box state before an ad-hoc A/B control settled it. This
script IS that control, pre-registered: alternate FRESH-PROCESS
bench.py runs between the previous round's checkout (a git worktree at
the given ref) and HEAD, on one quiet box, and report per-pass v1/v2
steady totals plus the two per-query heavies (st_tumbling_hour_counts,
d_ngram_jaccard_pairs). The alternation cancels slow box drift; fresh
processes cancel JVM/page-cache carryover between configs. The
BASELINE.md round freeze section records THIS table as the primary
(not corrective) evidence, generated BEFORE the round's heavy sweeps
land on the box.

Usage: python scripts/bench_ab.py <base_ref> [passes_per_side=2]
Writes one JSON line per run and a markdown table to stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WT = "/tmp/sparkflow_ab_base"


def run_bench(cwd: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"},
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def pick(d: dict) -> dict:
    qs = d.get("queries_steady") or d.get("queries") or {}
    return {
        "v1_steady": d.get("steady_total"),
        "v2_steady": d.get("v2_steady_total"),
        "st_tumbling": qs.get("st_tumbling_hour_counts"),
        "d_ngram": qs.get("d_ngram_jaccard_pairs"),
    }


def main() -> int:
    base_ref = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if not os.path.isdir(WT):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WT, base_ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    rows = []
    for i in range(passes):
        # alternate STARTING SIDE between pairs (round-11 protocol note:
        # the order effect follows run order, not checkout — alternating
        # the leader cancels it in the medians)
        order = (("base", WT), ("head", REPO)) if i % 2 == 0 else (
            ("head", REPO),
            ("base", WT),
        )
        for side, cwd in order:
            r = pick(run_bench(cwd))
            r["side"], r["pass"] = side, i
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n| side | v1 steady (s) | v2 steady (s) | st_tumbling | d_ngram |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['side']} p{r['pass']} | {r['v1_steady']:.2f} | "
            f"{r['v2_steady']:.2f} | {r['st_tumbling']:.2f} | {r['d_ngram']:.2f} |"
        )
    for side in ("base", "head"):
        vs = [r for r in rows if r["side"] == side]
        print(
            f"| {side} median | "
            f"{statistics.median(x['v1_steady'] for x in vs):.2f} | "
            f"{statistics.median(x['v2_steady'] for x in vs):.2f} | "
            f"{statistics.median(x['st_tumbling'] for x in vs):.2f} | "
            f"{statistics.median(x['d_ngram'] for x in vs):.2f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
