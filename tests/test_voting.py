"""Known-answer tests for the voting analytics operators.

Asserted values reproduce the reference's unit expectations:
60.0% rebellion for the designed rebel
(/root/reference/tests/unit/services/test_loyalty.py:21-28), 50.0%
attendance for the all-categories MP
(/root/reference/tests/unit/services/test_attendance.py:14-26).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.operators import voting as V
from tests.conftest import rows_by


class TestLoyalty:
    def test_rebel_detected(self, mp_votes, void_votes, mp_info):
        out = rows_by(V.loyalty(mp_votes, void_votes, mp_info), "id_poslanec")
        assert out[3]["rebellion_pct"] == 60.0
        assert out[3]["rebellions"] == 3
        assert out[3]["active_votes"] == 5

    def test_loyal_mps_zero(self, mp_votes, void_votes, mp_info):
        out = rows_by(V.loyalty(mp_votes, void_votes, mp_info), "id_poslanec")
        for mp in (1, 2, 4, 6):
            assert out[mp]["rebellion_pct"] == 0.0

    def test_pct_in_range(self, mp_votes, void_votes, mp_info):
        for r in V.loyalty(mp_votes, void_votes, mp_info).collect():
            assert 0.0 <= r["rebellion_pct"] <= 100.0

    def test_party_filter_case_insensitive(self, mp_votes, void_votes, mp_info):
        out = V.loyalty(mp_votes, void_votes, mp_info, party_filter="ods").collect()
        assert out and all(r["party"] == "ODS" for r in out)

    def test_top_limits(self, mp_votes, void_votes, mp_info):
        assert len(V.loyalty(mp_votes, void_votes, mp_info, top=2).collect()) == 2

    def test_sorted_desc_with_id_tiebreak(self, mp_votes, void_votes, mp_info):
        rows = V.loyalty(mp_votes, void_votes, mp_info).collect()
        keys = [(-r["rebellion_pct"], r["id_poslanec"]) for r in rows]
        assert keys == sorted(keys)

    def test_void_exclusion(self, spark, mp_votes, mp_info):
        # Voiding votes 1-3 removes all of MP 3's rebellions.
        void = spark.createDataFrame([(1,), (2,), (3,)], "id_hlasovani long")
        out = rows_by(V.loyalty(mp_votes, void, mp_info), "id_poslanec")
        assert out[3]["rebellion_pct"] == 0.0
        assert out[3]["active_votes"] == 2

    def test_empty_votes(self, spark, void_votes, mp_info):
        empty = spark.createDataFrame(
            [], "id_poslanec long, id_hlasovani long, vysledek string"
        )
        assert V.loyalty(empty, void_votes, mp_info).collect() == []

    def test_stan_sole_member_never_rebels(self, mp_votes, void_votes, mp_info):
        # MP 5's only active YES defines STAN's majority — cannot rebel.
        out = rows_by(V.loyalty(mp_votes, void_votes, mp_info), "id_poslanec")
        assert out[5]["rebellion_pct"] == 0.0


class TestPartyMajority:
    def test_tie_dropped(self, spark):
        votes = spark.createDataFrame(
            [(1, 1, "A"), (2, 1, "B")], "id_poslanec long, id_hlasovani long, vysledek string"
        ).withColumn("party", F.lit("X"))
        assert V.party_majority(votes).collect() == []

    def test_majority_direction(self, spark):
        votes = spark.createDataFrame(
            [(1, 1, "A"), (2, 1, "A"), (3, 1, "B")],
            "id_poslanec long, id_hlasovani long, vysledek string",
        ).withColumn("party", F.lit("X"))
        rows = V.party_majority(votes).collect()
        assert len(rows) == 1 and rows[0]["party_direction"] == "A"


class TestAttendance:
    def test_all_categories_mp(self, mp_votes, void_votes, mp_info):
        out = rows_by(V.attendance(mp_votes, void_votes, mp_info), "id_poslanec")
        mp5 = out[5]
        assert mp5["active"] == 2  # A + C
        assert mp5["yes_votes"] == 1
        assert mp5["abstained"] == 1
        assert mp5["passive"] == 1
        assert mp5["absent"] == 1
        assert mp5["excused"] == 1
        # active / (total - excused) * 100 = 2 / (5 - 1) * 100
        assert mp5["attendance_pct"] == 50.0

    def test_full_attendance(self, mp_votes, void_votes, mp_info):
        out = rows_by(V.attendance(mp_votes, void_votes, mp_info), "id_poslanec")
        assert out[1]["attendance_pct"] == 100.0

    def test_sort_modes(self, mp_votes, void_votes, mp_info):
        worst = V.attendance(mp_votes, void_votes, mp_info, sort="worst").collect()
        assert worst[0]["id_poslanec"] == 5
        best = V.attendance(mp_votes, void_votes, mp_info, sort="best").collect()
        assert best[0]["attendance_pct"] == 100.0
        most_abst = V.attendance(
            mp_votes, void_votes, mp_info, sort="most_abstained"
        ).collect()
        assert most_abst[0]["id_poslanec"] == 5

    def test_unknown_sort_falls_back(self, mp_votes, void_votes, mp_info):
        rows = V.attendance(mp_votes, void_votes, mp_info, sort="nonsense").collect()
        assert rows[0]["id_poslanec"] == 5  # worst-first default


class TestBreakdownAndCohesion:
    def test_party_breakdown_vote1(self, mp_votes, mp_info):
        one = mp_votes.filter(F.col("id_hlasovani") == 1)
        out = rows_by(V.party_breakdown(one, mp_info), "party")
        assert out["ANO"]["yes"] == 2 and out["ANO"]["no"] == 0
        assert out["ODS"]["yes"] == 2 and out["ODS"]["no"] == 1
        assert out["STAN"]["yes"] == 1 and out["STAN"]["total"] == 1

    def test_cohesion_values(self, mp_votes, void_votes, mp_info):
        out = rows_by(V.coalition_cohesion(mp_votes, void_votes, mp_info), "party")
        assert out["ANO"]["cohesion"] == 1.0
        # ODS: 15 active votes, 3 rebellions -> 12/15
        assert out["ODS"]["cohesion"] == 0.8
        assert out["ODS"]["amendment_cohesion"] is None  # no amendment ids given

    def test_amendment_cohesion_subset(self, spark, mp_votes, void_votes, mp_info):
        amend = spark.createDataFrame([(1,), (2,), (3,)], "id_hlasovani long")
        out = rows_by(
            V.coalition_cohesion(mp_votes, void_votes, mp_info, amendment_vote_ids=amend),
            "party",
        )
        # ODS on votes 1-3: 9 active, 3 rebellions -> 6/9
        assert out["ODS"]["amendment_cohesion"] == 0.666667

    def test_pair_agreement(self, mp_votes, void_votes, mp_info):
        rows = V.party_pair_agreement(mp_votes, void_votes, mp_info).collect()
        got = {(r["party"], r["party_b"]): r for r in rows}
        # All parties' majorities are YES on every vote -> full agreement.
        assert got[("ANO", "ODS")]["agreement_rate"] == 1.0
        assert got[("ANO", "ODS")]["shared_groups"] == 5
        # STAN has a majority only on vote 1 (its sole active vote).
        assert got[("ANO", "STAN")]["shared_groups"] == 1
