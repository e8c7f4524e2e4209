"""Shared Spark session + known-answer fixtures.

The fixture design mirrors the reference's synthetic known-answer corpus
(/root/reference/tests/fixtures/sample_data.py:9-135): 6 MPs (2 ANO, 3 ODS,
1 STAN) x 5 votes with designed patterns — MP 3 rebels on votes 1-3 (60%
rebellion), MP 5 exercises every attendance category (50% attendance).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from pspcz_analyzer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def mp_votes(spark):
    records = []
    for vid in range(1, 6):  # MP 1, 2 (ANO): always YES
        records += [(1, vid, "A"), (2, vid, "A")]
    for vid in range(1, 4):  # MP 3 (ODS): rebels NO on votes 1-3
        records.append((3, vid, "B"))
    for vid in range(4, 6):  # ...loyal YES on 4-5
        records.append((3, vid, "A"))
    for vid in range(1, 6):  # MP 4, 6 (ODS): always YES => ODS majority YES
        records += [(4, vid, "A"), (6, vid, "A")]
    # MP 5 (STAN): one row per attendance category
    records += [(5, 1, "A"), (5, 2, "@"), (5, 3, "M"), (5, 4, "F"), (5, 5, "C")]
    return spark.createDataFrame(
        records, "id_poslanec long, id_hlasovani long, vysledek string"
    )


@pytest.fixture(scope="session")
def mp_info(spark):
    rows = [
        (1, 101, "Jan", "Novak", "ANO"),
        (2, 102, "Petr", "Svoboda", "ANO"),
        (3, 103, "Karel", "Dvorak", "ODS"),
        (4, 104, "Ondrej", "Cerny", "ODS"),
        (5, 105, "Marie", "Nova", "STAN"),
        (6, 106, "Tomas", "Bily", "ODS"),
    ]
    return spark.createDataFrame(
        rows, "id_poslanec long, id_osoba long, jmeno string, prijmeni string, party string"
    )


@pytest.fixture(scope="session")
def void_votes(spark):
    return spark.createDataFrame([], "id_hlasovani long")


def plan_of(df) -> str:
    """Physical plan text (post-Catalyst, pre-execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def rows_by(df, key):
    return {r[key]: r.asDict() for r in df.collect()}
