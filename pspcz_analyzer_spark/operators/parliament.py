"""Parliamentary derived dimensions over the real psp.cz schema.

The reference materializes two small lookup structures per electoral
period; here both are DataFrame plans over the UNL-ingested tables
(schemas.py), so they run identically on one period or on all periods
partitioned by ``period``:

* mp_info — MP seat with resolved name and current party
  (/root/reference/pspcz_analyzer/services/mp_builder.py:8-48): seats of
  the period ⋈ persons ⋈ latest party-club membership (W1 window; the
  reference's interval-ignoring "latest by od_o" choice is kept
  deliberately — documented bug-compatible simplification, SURVEY §7.2);
* tisk bridge — (schuze, bod) -> print metadata
  (/root/reference/pspcz_analyzer/services/tisk/lookup_builder.py:11-135):
  the dict lookup as a broadcastable dimension table.

Period scoping: psp.cz identifies a period by its chamber organ id
(organ ids 165-174 for periods 1-10 — reference config.py:55-68), passed
in explicitly here to keep the operator table-driven.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pspcz_analyzer_spark.operators.joins import latest_per_key

# Official abbreviation -> common name (mp_builder.py:42-48).
PARTY_ALIASES = {"ANO2011": "ANO", "Nezařaz": "Nezařazení"}

PARTY_CLUB_TYPE = 1  # id_typ_organu of parliamentary party clubs (enums.py:30)


def build_mp_info(
    poslanec: DataFrame,
    osoby: DataFrame,
    organy: DataFrame,
    zarazeni: DataFrame,
    period_organ_id: int,
) -> DataFrame:
    """id_poslanec -> (id_osoba, jmeno, prijmeni, party) for one period."""
    seats = poslanec.filter(F.col("id_obdobi") == period_organ_id).select(
        "id_poslanec", "id_osoba"
    )
    named = seats.join(
        F.broadcast(osoby.select("id_osoba", "jmeno", "prijmeni")), "id_osoba", "left"
    )
    clubs = organy.filter(F.col("id_typ_organu") == PARTY_CLUB_TYPE).select(
        F.col("id_organ"), F.col("zkratka")
    )
    club_memberships = zarazeni.join(
        F.broadcast(clubs), zarazeni.id_of == clubs.id_organ, "inner"
    ).select("id_osoba", "zkratka", "od_o")
    # Latest club per person; id_organ-free tiebreak on zkratka keeps the
    # pick deterministic when od_o ties (Spark windows, unlike the
    # reference's stable sort, would otherwise be partition-order dependent).
    latest = latest_per_key(
        club_memberships,
        ["id_osoba"],
        [F.col("od_o").desc(), F.col("zkratka").asc()],
    )
    alias_map = F.create_map(
        *[F.lit(x) for kv in PARTY_ALIASES.items() for x in kv]
    )
    party = F.coalesce(alias_map[F.col("zkratka")], F.col("zkratka"))
    return named.join(
        latest.select("id_osoba", party.alias("party")), "id_osoba", "left"
    ).select("id_poslanec", "id_osoba", "jmeno", "prijmeni", "party")


def build_tisk_bridge(
    schuze: DataFrame,
    bod_schuze: DataFrame,
    tisky: DataFrame,
    period_organ_id: int,
) -> DataFrame:
    """(schuze, bod) -> (ct, nazev_tisku): the reference's tisk_lookup dict
    as a joinable (and broadcastable) bridge dimension."""
    sessions = schuze.filter(F.col("id_org") == period_organ_id).select(
        "id_schuze", F.col("schuze").alias("schuze_num")
    )
    items = bod_schuze.filter(F.col("id_tisk").isNotNull()).select(
        "id_schuze", "id_tisk", "bod"
    )
    prints = tisky.select("id_tisk", "ct", "nazev_tisku")
    return (
        sessions.join(items, "id_schuze")
        .join(F.broadcast(prints), "id_tisk")
        .select(
            F.col("schuze_num").alias("schuze"), "bod", "ct", "nazev_tisku"
        )
    )
