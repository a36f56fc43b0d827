"""One-shot registry-wide physical-plan audit (builder tool for the
exemption ledger in tests/test_plan_audit.py).

Runs ``plans.plan_report`` over every registry entry at sf0.001 and
prints the entries that trip each scale rule, so exemptions are written
from observed plans rather than guesses.
"""

import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

from sparkflow_spark.plans import plan_report  # noqa: E402
from sparkflow_spark.queries import load_all  # noqa: E402
from sparkflow_spark.session import build_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = build_session()
    reg = load_all()
    out = {}
    for name, entry in reg.items():
        if only and name not in only:
            continue
        try:
            df = entry.fn(spark, sf_dir)
            r = plan_report(df)
            codes = []
            if r.has_cartesian:
                codes.append("cartesian")
            if r.n_unbounded_nested_loops:
                codes.append(f"bnlj:{r.n_unbounded_nested_loops}")
            hot = [c for c in r.single_partition_consumers if c in ("Sort", "Window", "WindowGroupLimit")]
            if hot:
                codes.append("sp_sort:" + "/".join(hot))
            if r.n_hash_aggregates > 0 and r.n_exchanges > 0 and not r.has_partial_agg:
                codes.append("no_partial_agg")
            out[name] = codes
            if codes:
                print(f"VIOLATION {name}: {codes}", flush=True)
        except Exception as e:
            out[name] = [f"ERROR:{type(e).__name__}:{e}"]
            print(f"ERROR {name}: {e}", flush=True)
            traceback.print_exc()
    clean = sum(1 for v in out.values() if not v)
    print(f"\n{clean}/{len(out)} clean")
    with open("/tmp/plan_audit.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
