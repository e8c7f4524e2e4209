"""Tests for join-shaped operators: latest-per-key, top-n, fuzzy match,
as-of join (strict/non-strict boundary behavior), sessionization."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from pspcz_analyzer_spark.operators.joins import (
    asof_join,
    fuzzy_best_match,
    latest_per_key,
    topn_per_key,
)
from pspcz_analyzer_spark.operators.sessionize import session_bounds, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestLatestPerKey:
    def test_picks_latest_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (1, 20, "c"), (2, 5, "d")],
            "k long, ord long, payload string",
        )
        rows = {
            r["k"]: r["payload"]
            for r in latest_per_key(
                df, ["k"], [F.col("ord").desc(), F.col("payload").desc()]
            ).collect()
        }
        assert rows == {1: "c", 2: "d"}

    def test_one_row_per_key(self, spark):
        df = spark.createDataFrame(
            [(i % 3, i) for i in range(30)], "k long, ord long"
        )
        out = latest_per_key(df, ["k"], [F.col("ord").desc()])
        assert out.count() == 3


class TestTopNPerKey:
    def test_rank_column(self, spark):
        df = spark.createDataFrame(
            [(1, v) for v in (30, 10, 20, 40)], "k long, v long"
        )
        rows = topn_per_key(df, ["k"], [F.col("v").desc()], n=2).collect()
        assert [(r["v"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
            (40, 1),
            (30, 2),
        ]


class TestFuzzyBestMatch:
    def test_best_and_threshold(self, spark):
        left = spark.createDataFrame([("Novak",), ("Dvorzak",)], "name string")
        right = spark.createDataFrame(
            [("Novak",), ("Dvorak",), ("Svoboda",)], "cand string"
        )
        out = {
            r["name"]: (r["cand"], r["distance"])
            for r in fuzzy_best_match(left, right, "name", "cand").collect()
        }
        assert out["Novak"] == ("Novak", 0)
        assert out["Dvorzak"] == ("Dvorak", 1)

    def test_max_distance_filters(self, spark):
        left = spark.createDataFrame([("xyzzy",)], "name string")
        right = spark.createDataFrame([("aaaaa",)], "cand string")
        assert (
            fuzzy_best_match(left, right, "name", "cand", max_distance=2).count() == 0
        )

    def test_ratio_scorer_matches_difflib_reference(self, spark):
        """Exact parity with the reference resolver loop
        (submitter_resolver.py:36-46): inflected Czech names vs a surname
        list, SequenceMatcher.ratio, >= 0.7 threshold."""
        import difflib

        inflected = ["Bartosem", "Novakovi", "Svobodou", "Zelenskym"]
        surnames = ["Bartos", "Novak", "Svoboda", "Fiala", "Pekarova"]
        left = spark.createDataFrame([(n,) for n in inflected], "name string")
        right = spark.createDataFrame([(s,) for s in surnames], "cand string")
        got = {
            r["name"]: (r["cand"], r["ratio"])
            for r in fuzzy_best_match(
                left, right, "name", "cand", scorer="ratio", min_ratio=0.7
            ).collect()
        }
        for n in inflected:
            best, best_r = None, 0.0
            for s in surnames:
                r = difflib.SequenceMatcher(None, n, s).ratio()
                if r > best_r:
                    best_r, best = r, s
            if best_r >= 0.7:
                assert got[n][0] == best
                assert got[n][1] == pytest.approx(best_r)
            else:
                assert n not in got
        assert "Zelenskym" not in got  # below threshold -> dropped

    def test_ratio_tiebreak_deterministic(self, spark):
        left = spark.createDataFrame([("ab",)], "name string")
        right = spark.createDataFrame([("az",), ("ay",)], "cand string")
        rows = fuzzy_best_match(
            left, right, "name", "cand", scorer="ratio"
        ).collect()
        assert len(rows) == 1 and rows[0]["cand"] == "ay"  # asc tiebreak

    def test_unknown_scorer_raises(self, spark):
        df = spark.createDataFrame([("a",)], "name string")
        with pytest.raises(ValueError, match="unknown scorer"):
            fuzzy_best_match(df, df, "name", "name", scorer="jaro")


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"), "e1"), (1, _ts("2024-01-01T12:00:00"), "e2"),
             (2, _ts("2024-01-01T09:00:00"), "e3")],
            "uid long, t timestamp, ev string",
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01T09:30:00"), 100), (1, _ts("2024-01-01T11:00:00"), 200),
             (3, _ts("2024-01-01T08:00:00"), 300)],
            "uid long, rt timestamp, val long",
        )
        return left, right

    def test_backward_match(self, spark):
        left, right = self._frames(spark)
        out = {
            r["ev"]: r["asof_val"]
            for r in asof_join(
                left, right, ["uid"], "t", "rt", ["val"], strict=True
            ).collect()
        }
        assert out == {"e1": 100, "e2": 200, "e3": None}

    def test_strict_excludes_same_instant(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"), "e")], "uid long, t timestamp, ev string"
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"), 7)], "uid long, rt timestamp, val long"
        )
        strict = asof_join(left, right, ["uid"], "t", "rt", ["val"], strict=True).collect()
        loose = asof_join(left, right, ["uid"], "t", "rt", ["val"], strict=False).collect()
        assert strict[0]["asof_val"] is None
        assert loose[0]["asof_val"] == 7

    def test_left_rows_preserved(self, spark):
        left, right = self._frames(spark)
        assert asof_join(left, right, ["uid"], "t", "rt", ["val"]).count() == left.count()

    def test_forward_match(self, spark):
        left, right = self._frames(spark)
        out = {
            r["ev"]: r["asof_val"]
            for r in asof_join(
                left, right, ["uid"], "t", "rt", ["val"],
                strict=True, direction="forward",
            ).collect()
        }
        # e1@10:00 -> next right 11:00 (200); e2@12:00 -> none after;
        # e3 (uid 2) -> no right rows for the key.
        assert out == {"e1": 200, "e2": None, "e3": None}

    def test_forward_strict_excludes_same_instant(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"), "e")], "uid long, t timestamp, ev string"
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"), 7)], "uid long, rt timestamp, val long"
        )
        strict = asof_join(
            left, right, ["uid"], "t", "rt", ["val"],
            strict=True, direction="forward",
        ).collect()
        loose = asof_join(
            left, right, ["uid"], "t", "rt", ["val"],
            strict=False, direction="forward",
        ).collect()
        assert strict[0]["asof_val"] is None
        assert loose[0]["asof_val"] == 7


class TestSessionize:
    def _events(self, spark):
        rows = [
            (1, _ts("2024-01-01T10:00:00"), 1),
            (1, _ts("2024-01-01T10:29:59"), 2),  # 29:59 gap -> same session
            (1, _ts("2024-01-01T10:59:59"), 3),  # exactly 30:00 gap -> same
            (1, _ts("2024-01-01T11:30:00"), 4),  # 30:01 gap -> NEW session
            (2, _ts("2024-01-01T10:00:00"), 5),
        ]
        return spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")

    def test_gap_boundary(self, spark):
        out = {
            r["event_id"]: r["session_seq"]
            for r in sessionize(self._events(spark), order_tiebreak="event_id").collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}

    def test_session_bounds(self, spark):
        sess = sessionize(self._events(spark), order_tiebreak="event_id")
        bounds = {
            (r["user_id"], r["session_seq"]): r["n_events"]
            for r in session_bounds(sess).collect()
        }
        assert bounds == {(1, 1): 3, (1, 2): 1, (2, 1): 1}


class TestCascadeJoin:
    def test_first_matching_level_wins(self, spark):
        from pspcz_analyzer_spark.operators.joins import cascade_join

        left = spark.createDataFrame(
            [(1,), (2,), (3,), (4,)], "id long"
        )
        l1 = spark.createDataFrame([(1, 100)], "id long, v long")
        l2 = spark.createDataFrame([(1, 200), (2, 201)], "id long, v long")
        l3 = spark.createDataFrame(
            [(1, 300), (2, 301), (3, 302)], "id long, v long"
        )
        out = {
            r["id"]: (r["match_level"], r["v"])
            for r in cascade_join(left, [l1, l2, l3], "id", ["v"]).collect()
        }
        assert out == {
            1: (1, 100),  # level 1 beats later levels
            2: (2, 201),
            3: (3, 302),
            4: (None, None),  # no level matched
        }

    def test_left_columns_pass_through(self, spark):
        from pspcz_analyzer_spark.operators.joins import cascade_join

        left = spark.createDataFrame([(1, "x")], "id long, tag string")
        lvl = spark.createDataFrame([(1, 9)], "id long, v long")
        row = cascade_join(left, [lvl], "id", ["v"]).collect()[0]
        assert (row["tag"], row["match_level"], row["v"]) == ("x", 1, 9)


class TestMergeAmendmentSources:
    def test_exact_variant_none(self, spark):
        from pspcz_analyzer_spark.operators.amendments import (
            merge_amendment_sources,
        )

        votes = spark.createDataFrame(
            [(10, 0, "A"), (10, 1, "B1"), (10, 2, ""), (10, 3, "Z")],
            "doc_id long, seq int, letter string",
        )
        letters = spark.createDataFrame(
            [(10, "A", "Novak", 2), (10, "B", "Svoboda", 0)],
            "doc_id long, letter string, submitters string, n_subs int",
        )
        out = {
            r["seq"]: (r["match_kind"], r["submitters"], r["n_subs"])
            for r in merge_amendment_sources(
                votes, letters, payload_cols=("submitters", "n_subs")
            ).collect()
        }
        assert out[0] == ("exact", "Novak", 2)
        assert out[1] == ("variant", "Svoboda", 0)  # B1 -> B fallback
        assert out[2] == ("none", None, None)  # whole-bill vote, no letter
        assert out[3] == ("none", None, None)  # unknown letter

    def test_exact_preferred_over_variant(self, spark):
        from pspcz_analyzer_spark.operators.amendments import (
            merge_amendment_sources,
        )

        votes = spark.createDataFrame(
            [(1, 0, "A1")], "doc_id long, seq int, letter string"
        )
        letters = spark.createDataFrame(
            [(1, "A1", "exact-row", 1), (1, "A", "base-row", 0)],
            "doc_id long, letter string, submitters string, n_subs int",
        )
        row = merge_amendment_sources(
            votes, letters, payload_cols=("submitters", "n_subs")
        ).collect()[0]
        assert (row["match_kind"], row["submitters"]) == ("exact", "exact-row")


class TestRangeJoin:
    """Bucketized point-in-interval join vs brute force: any points, any
    intervals, any bucket width (narrower AND wider than the intervals) —
    identical pair sets, each pair exactly once."""

    def test_matches_brute_force_across_bucket_widths(self, spark):
        import random

        from pspcz_analyzer_spark.operators.joins import range_join

        rng = random.Random(5)
        points = [(i, rng.randint(0, 1000)) for i in range(60)]
        intervals = []
        for w in range(25):
            lo = rng.randint(0, 950)
            intervals.append((w, lo, lo + rng.randint(0, 120)))
        want = {
            (pid, wid)
            for pid, p in points
            for wid, lo, hi in intervals
            if lo <= p <= hi
        }
        pdf = spark.createDataFrame(points, "pid long, p long")
        idf = spark.createDataFrame(intervals, "wid long, lo long, hi long")
        for bucket in (7, 64, 500, 5000):
            rows = range_join(pdf, idf, "p", "lo", "hi", bucket).collect()
            got = [(r["pid"], r["wid"]) for r in rows]
            assert len(got) == len(set(got)), f"duplicate pairs at B={bucket}"
            assert set(got) == want, f"pair set mismatch at B={bucket}"

    def test_zero_length_and_boundary_intervals(self, spark):
        from pspcz_analyzer_spark.operators.joins import range_join

        pdf = spark.createDataFrame(
            [(1, 10), (2, 11), (3, 20)], "pid long, p long"
        )
        idf = spark.createDataFrame(
            [(1, 10, 10), (2, 11, 20)], "wid long, lo long, hi long"
        )
        got = {
            (r["pid"], r["wid"])
            for r in range_join(pdf, idf, "p", "lo", "hi", 8).collect()
        }
        assert got == {(1, 1), (2, 2), (3, 2)}

    def test_degenerate_intervals_match_nothing(self, spark):
        """lo > hi or a null bound matches nothing under BETWEEN; the
        bucketizer must drop them instead of exploding a descending
        F.sequence into wrong joins (ADVICE r04)."""
        from pspcz_analyzer_spark.operators.joins import range_join

        pdf = spark.createDataFrame([(1, 10), (2, 50)], "pid long, p long")
        idf = spark.createDataFrame(
            [(1, 60, 5), (2, None, 70), (3, 40, None), (4, 0, 100)],
            "wid long, lo long, hi long",
        )
        got = {
            (r["pid"], r["wid"])
            for r in range_join(pdf, idf, "p", "lo", "hi", 8).collect()
        }
        assert got == {(1, 4), (2, 4)}

    def test_outlier_interval_fails_loud_not_huge(self, spark):
        """An interval spanning more than max_cells buckets must fail the
        job with a clear message, not silently materialize a huge per-row
        array (the explode-factor contract made executable)."""
        import pytest
        from py4j.protocol import Py4JJavaError

        from pspcz_analyzer_spark.operators.joins import range_join

        pdf = spark.createDataFrame([(1, 10)], "pid long, p long")
        idf = spark.createDataFrame([(1, 0, 10_000_000)], "wid long, lo long, hi long")
        with pytest.raises(Exception, match="range_join|USER_RAISED"):
            range_join(pdf, idf, "p", "lo", "hi", 8, max_cells=1000).collect()
        # Same interval passes with an adequate bucket width.
        assert (
            range_join(pdf, idf, "p", "lo", "hi", 1_000_000, max_cells=1000).count()
            == 1
        )



class TestSnapshotDiff:
    """CDC classification incl. the null-safe cases: NULL->value and
    value->NULL are updates, NULL->NULL is unchanged, and unchanged keys
    never appear."""

    def test_classification_and_null_safety(self, spark):
        from pspcz_analyzer_spark.operators.joins import snapshot_diff

        old = spark.createDataFrame(
            [
                (1, 10.0, "A"),   # unchanged
                (2, 20.0, "B"),   # price update
                (3, None, "C"),   # NULL -> value update
                (4, 40.0, None),  # value stays, NULL status stays: unchanged
                (5, 50.0, "E"),   # deleted in new
                (7, None, None),  # both NULL -> both NULL: unchanged
            ],
            "k long, price double, status string",
        )
        new = spark.createDataFrame(
            [
                (1, 10.0, "A"),
                (2, 25.0, "B"),
                (3, 30.0, "C"),
                (4, 40.0, None),
                (6, 60.0, "F"),   # inserted
                (7, None, None),
            ],
            "k long, price double, status string",
        )
        rows = {
            r["k"]: (r["change_type"], r["changed_cols"])
            for r in snapshot_diff(old, new, ["k"], ["price", "status"]).collect()
        }
        assert rows == {
            2: ("update", "price"),
            3: ("update", "price"),
            5: ("delete", ""),
            6: ("insert", ""),
        }

    def test_multi_column_change_list(self, spark):
        from pspcz_analyzer_spark.operators.joins import snapshot_diff

        old = spark.createDataFrame([(1, 1.0, "x")], "k long, a double, b string")
        new = spark.createDataFrame([(1, 2.0, "y")], "k long, a double, b string")
        [r] = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        assert r["change_type"] == "update" and r["changed_cols"] == "a,b"
        assert r["old_a"] == 1.0 and r["new_b"] == "y"

    def test_empty_compare_cols_rejected(self, spark):
        import pytest

        from pspcz_analyzer_spark.operators.joins import snapshot_diff

        old = spark.createDataFrame([(1, 1.0)], "k long, a double")
        with pytest.raises(ValueError, match="compare_cols"):
            snapshot_diff(old, old, ["k"], [])


class TestBloomSemiJoin:
    """bloom_semi_join equals the exact semi-join for any (m_bits, k) and
    actually prunes at the prefilter stage."""

    def _data(self, spark):
        import random

        rng = random.Random(7)
        fact = spark.createDataFrame(
            [(i, rng.randint(0, 499), rng.random()) for i in range(2000)],
            "row_id long, key long, v double",
        )
        dim = spark.createDataFrame(
            [(k,) for k in rng.sample(range(500), 40)], "dkey long"
        )
        return fact, dim

    def test_equals_exact_semi_join(self, spark):
        from pspcz_analyzer_spark.operators.joins import bloom_semi_join

        fact, dim = self._data(spark)
        exact = sorted(
            r["row_id"]
            for r in fact.join(
                dim.select(F.col("dkey").alias("key")), "key", "left_semi"
            ).collect()
        )
        for m_bits, k in [(1 << 10, 3), (1 << 13, 5), (64, 2)]:
            got = sorted(
                r["row_id"]
                for r in bloom_semi_join(
                    fact, dim, "key", "dkey", m_bits=m_bits, k=k
                ).collect()
            )
            assert got == exact, (m_bits, k)

    def test_tiny_bitmap_still_exact(self, spark):
        # m_bits=64 saturates (everything passes the prefilter); the
        # confirm join alone must still produce the exact answer.
        from pspcz_analyzer_spark.operators.joins import bloom_semi_join

        fact, dim = self._data(spark)
        n_exact = fact.join(
            dim.select(F.col("dkey").alias("key")), "key", "left_semi"
        ).count()
        assert bloom_semi_join(fact, dim, "key", "dkey", m_bits=64, k=2).count() == n_exact

    def test_prefilter_has_no_false_negatives_and_prunes(self, spark):
        from pspcz_analyzer_spark.operators.joins import (
            _bloom_positions,
            bloom_semi_join,
        )

        fact, dim = self._data(spark)
        m_bits, k = 1 << 13, 5
        # Rebuild the bitmap exactly as the operator does, then measure the
        # PREFILTER's survivor set (no confirm join).
        words = (
            dim.select(F.explode(_bloom_positions(F.col("dkey"), m_bits, k)).alias("p"))
            .distinct()
            .groupBy((F.col("p") / 64).cast("int").alias("w"))
            .agg(
                F.bit_or(
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
                    )
                ).alias("bits")
            )
            .collect()
        )
        arr = [0] * (m_bits // 64)
        for r in words:
            arr[r["w"]] = r["bits"]
        bitmap = F.lit(arr)
        survivors = fact.filter(
            F.forall(
                _bloom_positions(F.col("key"), m_bits, k),
                lambda p: (
                    F.element_at(bitmap, (p / 64).cast("int") + 1).bitwiseAND(
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                        )
                    )
                )
                != 0,
            )
        ).select("row_id")
        exact_ids = {
            r["row_id"]
            for r in fact.join(
                dim.select(F.col("dkey").alias("key")), "key", "left_semi"
            ).collect()
        }
        surv_ids = {r["row_id"] for r in survivors.collect()}
        assert exact_ids <= surv_ids  # no false negatives, ever
        # 40/500 keys are members (~8% of rows); at m=8192,k=5 the false-
        # positive rate is well under 1%, so the prefilter must reject the
        # bulk of the non-members.
        assert len(surv_ids) < fact.count() * 0.2

    def test_empty_dim(self, spark):
        from pspcz_analyzer_spark.operators.joins import bloom_semi_join

        fact, dim = self._data(spark)
        assert (
            bloom_semi_join(fact, dim.filter(F.lit(False)), "key", "dkey").count() == 0
        )


class TestSortedNeighborhood:
    def test_matches_global_window_brute_force(self, spark):
        import random

        from pspcz_analyzer_spark.operators.pairs import sorted_neighborhood_pairs

        rng = random.Random(99)
        # Skewed first letters (many 'a's) + ties on the key: the bucketed
        # rank must still equal the global (key, id) rank.
        keys = [
            rng.choice("aaab") + "".join(rng.choice("xyz") for _ in range(3))
            for _ in range(60)
        ]
        rows = [(i, k) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "rid long, name string")
        w = 4
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df, key_col="name", id_col="rid", window=w
            ).collect()
        }
        order = sorted(rows, key=lambda t: (t[1], t[0]))
        want = {
            (order[i][0], order[j][0])
            for i in range(len(order))
            for j in range(i + 1, min(i + w + 1, len(order)))
        }
        assert got == want

    def test_pairs_cross_bucket_boundaries(self, spark):
        from pspcz_analyzer_spark.operators.pairs import sorted_neighborhood_pairs

        # 'az' and 'ba' are adjacent in the global order but land in
        # different first-char buckets — the rank-block join must still
        # emit the pair.
        rows = [(1, "ax"), (2, "az"), (3, "ba"), (4, "bz")]
        df = spark.createDataFrame(rows, "rid long, name string")
        got = {
            (r["id_a"], r["id_b"], r["rank_a"], r["rank_b"])
            for r in sorted_neighborhood_pairs(
                df, key_col="name", id_col="rid", window=1
            ).collect()
        }
        assert got == {(1, 2, 1, 2), (2, 3, 2, 3), (3, 4, 3, 4)}
