"""Round-6 eighth-wave scaling: final-wave queries at sf0.1 vs the 10x
replica, best-of-two on a warm session.

Usage: python tools/measure_r06g.py [sf_dir] [scale10_dir] [out_file]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "link_prediction_suppliers",
    "manifest_null_prune",
    "orders_table_fingerprint",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    s10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pspcz_scale10"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r06g_measure.txt"
    from pspcz_analyzer_spark.plans import query_fns
    from pspcz_analyzer_spark.session import get_spark

    fns = query_fns()
    spark = get_spark()
    with open(out, "a") as fh:
        for tag, d in (("1x", sf), ("10x", s10)):
            for name in QUERIES:
                vals = []
                for _ in range(2):
                    t0 = time.time()
                    n = fns[name](spark, d).count()
                    vals.append(round(time.time() - t0, 2))
                    spark.catalog.clearCache()
                fh.write(f"{name} {tag} best={min(vals)} rows={n}\n")
                fh.flush()
    spark.stop()
if __name__ == "__main__":
    main()
