"""Reproduce the round-9 SECOND-DECADE measurement (SCALING.md round-9).

One decade cannot distinguish O(n) from O(n log n) or from a term that
only bites at the next order of magnitude (the r9 sweep caught two such:
SemDeDup's fixed cell count, the Gram-trick PCA's sample bound), so this
tool builds 10x and 100x replicas of an sf dir and runs a query wave at
all three scales through bench.py's own methodology.

Usage:
  python tools/measure_r09_decade.py [wave] [src_sf_dir]

waves: worst (the 11 worst-first-decade-ratio headline queries),
       dedup (the LLM-pipeline dedup family),
       streaming (windows/funnel/retention family)

Builds (skipped when the dirs already hold all tables):
  /tmp/pspcz_scale10   = build_scale10(src, stride 10M)
  /tmp/pspcz_scale100  = build_scale10(scale10, stride 1e9)  # key spans
                         of the 10x output exceed 10M — a second
                         application at the default stride would collide

Timing: bench.py per scale via SPARK_GRAFT_SF_DIR + SPARK_GRAFT_BENCH_ONLY
(best-of-2 at 1x/10x, single pass at 100x — biases 100x UP, the
conservative direction for a superlinearity check). Prints one JSON line
per scale and a final ratio table. Interpretation notes (driver-collect
output-bound queries, n log n sort envelopes, the fit-cap crossing) live
in SCALING.md round-9.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WAVES = {
    "worst": (
        "q18_large_orders,mp_vote_similarity,q21_waiting_supplier,"
        "steno_parse_votes,doc_quality_scores,asof_latest_order_before_event,"
        "amendments_merged,events_sessionized,loyalty_rebellion_rates,"
        "asof_cascade,q1_pricing_summary"
    ),
    "dedup": (
        "exact_dedup_survivors,near_dup_jaccard_capped,"
        "minhash_lsh_exact_recall,corpus_decontaminate,corpus_pack_sequences,"
        "semantic_dedup_kmeans,doc_gopher_flags,events_hll_distinct_users"
    ),
    "streaming": (
        "events_tumbling_1h,events_funnel,events_retention_cohorts,"
        "events_trailing_24h,events_range_join_windows,"
        "events_transition_matrix,events_hourly_resample,events_decayed_value"
    ),
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _ensure(src: str, out: str, stride: int) -> None:
    if all(
        os.path.exists(os.path.join(out, f"{t}.parquet")) for t in TABLES
    ):
        return
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_scale10.py"),
         src, out, str(stride)],
        check=True,
    )


def _bench(sf_dir: str, only: str, runs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=only,
        SPARK_GRAFT_BENCH_RUNS=str(runs),
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        check=True, env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(REPO, "bench_detail.json")) as fh:
        return json.load(fh)["queries"]


def main() -> int:
    wave = sys.argv[1] if len(sys.argv) > 1 else "worst"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = WAVES[wave]
    s10, s100 = "/tmp/pspcz_scale10", "/tmp/pspcz_scale100"
    _ensure(src, s10, 10_000_000)
    _ensure(s10, s100, 1_000_000_000)
    out = {}
    for label, d, runs in (("1x", src, 2), ("10x", s10, 2), ("100x", s100, 1)):
        out[label] = _bench(d, only, runs)
        print(json.dumps({"scale": label, "queries": out[label]}), flush=True)
    print(f"{'query':34s} {'1x':>8s} {'10x':>8s} {'100x':>9s} {'r1':>5s} {'r2':>5s}")
    for q in sorted(out["100x"], key=lambda q: -out["100x"][q]):
        a, b, c = out["1x"].get(q), out["10x"].get(q), out["100x"][q]
        if not a or not b or a < 0 or b < 0 or c < 0:
            continue
        print(f"{q:34s} {a:8.2f} {b:8.2f} {c:9.2f} {b / a:5.1f} {c / b:5.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
