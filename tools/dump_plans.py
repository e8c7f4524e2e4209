"""Dump formatted physical plans for named catalog queries.

The audit trees in PLANS.md were captured with this tool; re-run it to
verify them against the current code:

    python tools/dump_plans.py q5_nation_revenue mp_vote_similarity
    python tools/dump_plans.py --all          # every registered query

Plans compile without running an action for ordinary queries; AQE
re-plans sizes at runtime, but the shapes asserted in PLANS.md
(broadcast vs shuffle joins, pushed filters, exchange counts) are
visible statically. NB iterative and streaming queries (near_dup_*
clusters, events_stream_*) execute while BUILDING their result frame —
dumping those costs their runtime at $SPARK_GRAFT_SF_DIR scale.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as E
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", shuffle_partitions=8)
    qs = E.queries()
    names = sys.argv[1:]
    if names == ["--all"]:
        names = list(qs)
    if not names:
        print(__doc__)
        return 2
    for name in names:
        if name not in qs:
            print(f"## {name} — UNKNOWN QUERY")
            continue
        print(f"## {name}\n")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            # The operator tree only (details section is schema noise here).
            tree = buf.getvalue().split("\n\n")[0]
            print("```")
            print(tree)
            print("```\n")
        except Exception as e:  # streaming queries execute on build; report
            print(f"(plan unavailable: {type(e).__name__}: {str(e)[:200]})\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
