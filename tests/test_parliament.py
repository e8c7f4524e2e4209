"""End-to-end parliamentary-schema test: UNL fixtures (windows-1250, real
column layouts) -> typed tables via the schema registry -> derived dims,
with designed expectations for the alias remap, latest-membership pick,
and missing-club behavior."""

from __future__ import annotations

import pytest

from pspcz_analyzer_spark.operators.parliament import (
    build_mp_info,
    build_tisk_bridge,
)
from pspcz_analyzer_spark.sources.unl import read_unl

ORGAN_ID = 172  # period 9 chamber organ


def _unl(tmp_path, name: str, lines: list[str]) -> str:
    p = tmp_path / name
    p.write_bytes(("\n".join(lines) + "\n").encode("windows-1250"))
    return str(p)


@pytest.fixture()
def tables(spark, tmp_path):
    # poslanec: 3 seats in the period, 1 seat in another period.
    poslanec = read_unl(
        spark,
        _unl(tmp_path, "poslanec.unl", [
            f"1|101|1|10|{ORGAN_ID}||||||||||",
            f"2|102|1|10|{ORGAN_ID}||||||||||",
            f"3|103|1|10|{ORGAN_ID}||||||||||",
            "4|104|1|10|165||||||||||",
        ]),
        table="poslanec",
    )
    osoby = read_unl(
        spark,
        _unl(tmp_path, "osoby.unl", [
            "101||Novák|Jan||1970-01-01|M||",
            "102||Dvořáková|Marie||1980-01-01|Ž||",
            "103||Černý|Petr||1975-01-01|M||",
        ]),
        table="osoby",
    )
    # organy: two party clubs + one committee (type 2, must be ignored).
    organy = read_unl(
        spark,
        _unl(tmp_path, "organy.unl", [
            "900|1|1|ANO2011|Klub ANO|Club ANO|||1|",
            "901|1|1|ODS|Klub ODS|Club ODS|||1|",
            "902|1|2|VYBOR|Výbor|Committee|||1|",
        ]),
        table="organy",
    )
    # zarazeni: person 101 switched clubs (latest od_o wins => ODS);
    # person 102 in ANO2011 (alias => ANO); person 103 also sits on a
    # committee, which must not count as a party.
    zarazeni = read_unl(
        spark,
        _unl(tmp_path, "zarazeni.unl", [
            "101|900||2021-10-01|2022-06-30|||",
            "101|901||2022-07-01||||",
            "102|900||2021-10-01||||",
            "103|902||2021-10-01||||",
        ]),
        table="zarazeni",
    )
    schuze = read_unl(
        spark,
        _unl(tmp_path, "schuze.unl", [
            f"5001|{ORGAN_ID}|1|2021-11-08|||",
            f"5002|{ORGAN_ID}|2|2021-12-01|||",
            "5003|165|7|2013-01-01|||",
        ]),
        table="schuze",
    )
    bod_schuze = read_unl(
        spark,
        _unl(tmp_path, "bod_schuze.unl", [
            "71|5001|300|1|4|||||||||9|",
            "72|5002|301|1|2|||||||||9|",
            "73|5003|300|1|1|||||||||9|",
            "74|5001||1|9|||||||||9|",  # agenda item without a print
        ]),
        table="bod_schuze",
    )
    tisky = read_unl(
        spark,
        _unl(tmp_path, "tisky.unl", [
            "300|1|1|410|1|1|1|" + str(ORGAN_ID) + "|1||Novela zákona|||||1||||||||",
            "301|1|1|411|1|1|1|" + str(ORGAN_ID) + "|1||Státní rozpočet|||||1||||||||",
        ]),
        table="tisky",
    )
    return dict(
        poslanec=poslanec, osoby=osoby, organy=organy, zarazeni=zarazeni,
        schuze=schuze, bod_schuze=bod_schuze, tisky=tisky,
    )


class TestMpInfo:
    def test_dim_values(self, tables):
        info = {
            r["id_poslanec"]: r.asDict()
            for r in build_mp_info(
                tables["poslanec"], tables["osoby"], tables["organy"],
                tables["zarazeni"], ORGAN_ID,
            ).collect()
        }
        assert set(info) == {1, 2, 3}  # other-period seat excluded
        assert info[1]["prijmeni"] == "Novák"
        assert info[1]["party"] == "ODS"  # latest membership wins
        assert info[2]["party"] == "ANO"  # ANO2011 alias applied
        assert info[3]["party"] is None  # committee seat is not a party

    def test_czech_text_survives_pipeline(self, tables):
        info = build_mp_info(
            tables["poslanec"], tables["osoby"], tables["organy"],
            tables["zarazeni"], ORGAN_ID,
        ).collect()
        assert any(r["prijmeni"] == "Dvořáková" for r in info)


class TestTiskBridge:
    def test_bridge_rows(self, tables):
        bridge = {
            (r["schuze"], r["bod"]): (r["ct"], r["nazev_tisku"])
            for r in build_tisk_bridge(
                tables["schuze"], tables["bod_schuze"], tables["tisky"], ORGAN_ID
            ).collect()
        }
        assert bridge == {
            (1, 4): (410, "Novela zákona"),
            (2, 2): (411, "Státní rozpočet"),
        }  # other-period session and print-less item excluded
