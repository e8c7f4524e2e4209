"""Dump FULL ``explain("formatted")`` output (operator tree + details
section, so PushedFilters/ReadSchema/join build sides are visible) for
named catalog queries into per-query files.

    python tools/dump_plan_full.py OUTDIR SUFFIX query [query ...]

writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query. Used for the
optimization-round before/after plan artifacts under ``plans/r11/``.

NB iterative queries (pagerank family, k-core, streaming) EXECUTE while
building their result frame — dumping those costs their runtime at
$SPARK_GRAFT_SF_DIR scale (default sf0.001 keeps that cheap).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(app_name="dump_plan_full", shuffle_partitions=8)
    qs = E.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN QUERY", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(path, "w") as fh:
                fh.write(f"# {name} — explain(formatted) at {sf_dir}\n\n")
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:
            with open(path, "w") as fh:
                fh.write(
                    f"# {name} — plan unavailable: "
                    f"{type(e).__name__}: {str(e)[:500]}\n"
                )
            print(f"{name}: plan unavailable ({type(e).__name__})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
