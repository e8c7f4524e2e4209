"""The reference's voting analytics exercised on the testdata star schema.

The driver's tables are TPC-H-ish, so we derive a deterministic
"votes-shaped" view and run the REAL engine operators
(pspcz_analyzer_spark.operators.voting) on it:

    mp_votes   := lineitem     (MP = supplier, vote event = order,
                                vote code derived from returnflag/linestatus)
    void_votes := orders with o_orderstatus = 'P'   (void-vote exclusion P4)
    mp_info    := supplier ⋈ nation  (party = nation)

This keeps one code path for both the parliamentary schema and the testdata
correctness gate; the oracle SQL replicates the same math independently.

Vote-code derivation (covers every enum code the analyses use):
    returnflag A -> 'A' (YES)   R -> 'B' (NO)
    N + linestatus O -> 'C' (ABSTAINED)
    N + F: linenumber%3 = 0 -> 'F' (DID_NOT_VOTE), 1 -> '@' (ABSENT),
                           2 -> 'M' (EXCUSED)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.operators import voting as V
from pspcz_analyzer_spark.plans import register

# Shared SQL fragments so every oracle derives the identical views.
_SQL_MP_VOTES = """
  SELECT l_suppkey AS id_poslanec, l_orderkey AS id_hlasovani,
         CASE WHEN l_returnflag = 'A' THEN 'A'
              WHEN l_returnflag = 'R' THEN 'B'
              WHEN l_linestatus = 'O' THEN 'C'
              WHEN l_linenumber % 3 = 0 THEN 'F'
              WHEN l_linenumber % 3 = 1 THEN '@'
              ELSE 'M' END AS vysledek
  FROM lineitem
"""
_SQL_VOID = "SELECT o_orderkey AS id_hlasovani FROM orders WHERE o_orderstatus = 'P'"
_SQL_MP_INFO = """
  SELECT s_suppkey AS id_poslanec, s_name AS jmeno, s_name AS prijmeni,
         n_name AS party
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def derive_mp_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    code = (
        F.when(F.col("l_returnflag") == "A", "A")
        .when(F.col("l_returnflag") == "R", "B")
        .when(F.col("l_linestatus") == "O", "C")
        .when(F.col("l_linenumber") % 3 == 0, "F")
        .when(F.col("l_linenumber") % 3 == 1, "@")
        .otherwise("M")
    )
    return li.select(
        F.col("l_suppkey").alias("id_poslanec"),
        F.col("l_orderkey").alias("id_hlasovani"),
        code.alias("vysledek"),
    )


def derive_void_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_orderkey").alias("id_hlasovani"))
    )


def derive_mp_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        F.col("s_suppkey").alias("id_poslanec"),
        F.col("s_name").alias("jmeno"),
        F.col("s_name").alias("prijmeni"),
        F.col("n_name").alias("party"),
    )


_SQL_ACTIVE = f"""
  WITH mp_votes AS ({_SQL_MP_VOTES}),
  void_votes AS ({_SQL_VOID}),
  mp_info AS ({_SQL_MP_INFO}),
  clean AS (
    SELECT * FROM mp_votes
    WHERE id_hlasovani NOT IN (SELECT id_hlasovani FROM void_votes)
  ),
  active AS (
    SELECT c.id_poslanec, c.id_hlasovani, c.vysledek, m.party
    FROM clean c JOIN mp_info m USING (id_poslanec)
    WHERE c.vysledek IN ('A', 'B')
  ),
  majority AS (
    SELECT id_hlasovani, party,
           CASE WHEN sum(CASE WHEN vysledek = 'A' THEN 1 ELSE 0 END)
                   > sum(CASE WHEN vysledek = 'B' THEN 1 ELSE 0 END) THEN 'A'
                WHEN sum(CASE WHEN vysledek = 'B' THEN 1 ELSE 0 END)
                   > sum(CASE WHEN vysledek = 'A' THEN 1 ELSE 0 END) THEN 'B'
           END AS party_direction
    FROM active GROUP BY id_hlasovani, party
  ),
  flagged AS (
    SELECT a.*, m.party_direction,
           a.vysledek <> m.party_direction AS is_rebellion
    FROM active a
    JOIN majority m USING (id_hlasovani, party)
    WHERE m.party_direction IS NOT NULL
  )
"""


@register(
    "loyalty_rebellion_rates",
    oracle=_SQL_ACTIVE
    + """
    , per_mp AS (
      SELECT id_poslanec,
             CAST(sum(CASE WHEN is_rebellion THEN 1 ELSE 0 END) AS BIGINT) AS rebellions,
             count(*) AS active_votes
      FROM flagged GROUP BY id_poslanec
    )
    SELECT p.id_poslanec, i.jmeno, i.prijmeni, i.party,
           p.active_votes, p.rebellions,
           round(p.rebellions / p.active_votes * 100, 6) AS rebellion_pct
    FROM per_mp p
    LEFT JOIN (SELECT * FROM ({mp_info})) i USING (id_poslanec)
    ORDER BY rebellion_pct DESC, id_poslanec
    """.replace("{mp_info}", _SQL_MP_INFO),
    tags=("A1", "J4", "J5", "P4", "voting"),
    doc="Party-majority rebellion rates — the reference's signature two-phase "
    "aggregate (loyalty_service.py:9-141) on the engine's voting operators.",
)
def loyalty_rebellion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.loyalty(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
    )


@register(
    "attendance_rates",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    void_votes AS ({_SQL_VOID}),
    mp_info AS ({_SQL_MP_INFO}),
    clean AS (
      SELECT * FROM mp_votes
      WHERE id_hlasovani NOT IN (SELECT id_hlasovani FROM void_votes)
    ),
    per_mp AS (
      SELECT id_poslanec,
             CAST(sum(CASE WHEN vysledek IN ('A','B','C') THEN 1 ELSE 0 END) AS BIGINT) AS active,
             CAST(sum(CASE WHEN vysledek = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS yes_votes,
             CAST(sum(CASE WHEN vysledek = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS no_votes,
             CAST(sum(CASE WHEN vysledek = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS abstained,
             CAST(sum(CASE WHEN vysledek = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS passive,
             CAST(sum(CASE WHEN vysledek = '@' THEN 1 ELSE 0 END) AS BIGINT) AS absent,
             CAST(sum(CASE WHEN vysledek = 'M' THEN 1 ELSE 0 END) AS BIGINT) AS excused,
             count(*) AS total
      FROM clean GROUP BY id_poslanec
    )
    SELECT p.id_poslanec, i.jmeno, i.prijmeni, i.party,
           p.active, p.yes_votes, p.no_votes, p.abstained,
           p.passive, p.absent, p.excused,
           round(p.active / CAST(p.total - p.excused AS DOUBLE) * 100, 6) AS attendance_pct
    FROM per_mp p LEFT JOIN mp_info i USING (id_poslanec)
    ORDER BY attendance_pct, id_poslanec
    """,
    tags=("A2", "A3", "O4", "voting"),
    doc="Attendance categories + pct (attendance_service.py:9-82): wide "
    "conditional aggregate with derived metric.",
)
def attendance_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.attendance(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
        sort="worst",
    )


@register(
    "party_breakdown_vote42",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    mp_info AS ({_SQL_MP_INFO})
    SELECT m.party,
           CAST(sum(CASE WHEN v.vysledek = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS yes,
           CAST(sum(CASE WHEN v.vysledek = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS no,
           CAST(sum(CASE WHEN v.vysledek = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS abstained,
           CAST(sum(CASE WHEN v.vysledek = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS did_not_vote,
           CAST(sum(CASE WHEN v.vysledek = '@' THEN 1 ELSE 0 END) AS BIGINT) AS absent,
           CAST(sum(CASE WHEN v.vysledek = 'M' THEN 1 ELSE 0 END) AS BIGINT) AS excused,
           count(*) AS total
    FROM mp_votes v JOIN mp_info m USING (id_poslanec)
    WHERE v.id_hlasovani = 42
    GROUP BY m.party
    ORDER BY m.party
    """,
    tags=("A4", "P8", "voting"),
    doc="Per-party breakdown of one vote (vote detail page, "
    "votes_service.py:265-280).",
)
def party_breakdown_vote42(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = derive_mp_votes(spark, sf_dir).filter(F.col("id_hlasovani") == 42)
    return V.party_breakdown(one, derive_mp_info(spark, sf_dir))


@register(
    "vote_detail_rows",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    mp_info AS ({_SQL_MP_INFO}),
    one AS (SELECT * FROM mp_votes WHERE id_hlasovani = 42)
    SELECT v.id_poslanec, m.jmeno, m.party, v.vysledek,
           CAST(sum(CASE WHEN v.vysledek = 'A' THEN 1 ELSE 0 END)
                OVER (PARTITION BY m.party) AS BIGINT) AS party_yes,
           CAST(sum(CASE WHEN v.vysledek = 'B' THEN 1 ELSE 0 END)
                OVER (PARTITION BY m.party) AS BIGINT) AS party_no,
           CAST(count(*) OVER (PARTITION BY m.party) AS BIGINT) AS party_total,
           CAST(count(*) OVER () AS BIGINT) AS vote_total
    FROM one v JOIN mp_info m USING (id_poslanec)
    ORDER BY id_poslanec
    """,
    tags=("P8", "J1", "A4", "composite", "new-surface"),
    priority=30,
    doc="The vote-detail lifecycle (§3.2, votes_service.py:303-319) as ONE "
    "plan: point-filter the vote fact (pushed to the scan), broadcast-join "
    "MP dims, and carry the per-party and whole-vote tallies as windows "
    "over the (one-vote-sized) detail rows — the reference computes three "
    "separate sub-results and stitches dicts. The whole-vote total "
    "partitions by the vote id (constant after the point filter), so no "
    "global single-partition window exists even if the filter widened to "
    "many votes.",
)
def vote_detail_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    one = derive_mp_votes(spark, sf_dir).filter(F.col("id_hlasovani") == 42)
    info = F.broadcast(
        derive_mp_info(spark, sf_dir).select("id_poslanec", "jmeno", "party")
    )
    rows = one.join(info, "id_poslanec")
    pw = Window.partitionBy("id_hlasovani", "party")
    vw = Window.partitionBy("id_hlasovani")
    return rows.select(
        "id_poslanec",
        "jmeno",
        "party",
        "vysledek",
        F.sum(F.when(F.col("vysledek") == "A", 1).otherwise(0)).over(pw).alias("party_yes"),
        F.sum(F.when(F.col("vysledek") == "B", 1).otherwise(0)).over(pw).alias("party_no"),
        F.count(F.lit(1)).over(pw).alias("party_total"),
        F.count(F.lit(1)).over(vw).alias("vote_total"),
    ).orderBy("id_poslanec")


@register(
    "coalition_cohesion",
    oracle=_SQL_ACTIVE
    + """
    , amended AS (
      SELECT f.*,
             f.id_hlasovani IN (
               SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
             ) AS is_amendment
      FROM flagged f
    )
    SELECT party,
           round(avg(CASE WHEN NOT is_rebellion THEN 1.0 ELSE 0.0 END), 6) AS cohesion,
           round(avg(CASE WHEN is_amendment
                          THEN (CASE WHEN NOT is_rebellion THEN 1.0 ELSE 0.0 END)
                     END), 6) AS amendment_cohesion,
           count(*) AS active_votes
    FROM amended
    GROUP BY party
    ORDER BY party
    """,
    tags=("A5", "voting"),
    doc="Per-party cohesion, overall and amendment-only conditional mean "
    "(coalition_service.py:263-281).",
)
def coalition_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    amendment_ids = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("id_hlasovani"))
    )
    return V.coalition_cohesion(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
        amendment_vote_ids=amendment_ids,
    )


@register(
    "party_pair_agreement",
    oracle=_SQL_ACTIVE
    + """
    , majority_nn AS (
      SELECT id_hlasovani, party, party_direction
      FROM majority WHERE party_direction IS NOT NULL
    ),
    pairs AS (
      SELECT a.id_hlasovani, a.party, a.party_direction,
             b.party AS party_b, b.party_direction AS party_direction_b
      FROM majority_nn a
      JOIN majority_nn b ON a.id_hlasovani = b.id_hlasovani AND a.party < b.party
    )
    SELECT party, party_b,
           round(avg(CASE WHEN party_direction = party_direction_b
                          THEN 1.0 ELSE 0.0 END), 6) AS agreement_rate,
           count(*) AS shared_groups
    FROM pairs
    GROUP BY party, party_b
    ORDER BY agreement_rate DESC, party, party_b
    """,
    tags=("J7", "A1", "voting"),
    doc="Unordered party-pair agreement via self-join + theta predicate "
    "(coalition_service.py:70-87).",
)
def party_pair_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.party_pair_agreement(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
    )


_NORM_SQL = "trim(regexp_replace(strip_accents(lower({c})), '\\s+', ' ', 'g'))"


@register(
    "votes_browser_page",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    void_votes AS ({_SQL_VOID}),
    tallies AS (
      SELECT id_hlasovani,
             CAST(sum(CASE WHEN vysledek = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS pro,
             CAST(sum(CASE WHEN vysledek = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS proti,
             CAST(sum(CASE WHEN vysledek = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS zdrzel,
             CAST(sum(CASE WHEN vysledek = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nehlasoval,
             count(*) AS prihlaseno
      FROM mp_votes GROUP BY id_hlasovani
    ),
    titled AS (
      SELECT o.o_orderkey AS id_hlasovani, o.o_orderdate AS datum,
             coalesce(c.c_name, '') AS nazev_dlouhy,
             o.o_orderpriority AS nazev_kratky
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE {_NORM_SQL.format(c="c.c_name")} LIKE '%12%'
         OR {_NORM_SQL.format(c="o.o_orderpriority")} LIKE '%12%'
    ),
    topical AS (
      SELECT DISTINCT l.l_orderkey AS id_hlasovani
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE {_NORM_SQL.format(c="p.p_type")} LIKE '%promo%'
    ),
    votes AS (
      SELECT t.*, ta.pro, ta.proti, ta.zdrzel, ta.nehlasoval,
             ta.prihlaseno,
             CASE WHEN ta.pro > ta.proti THEN 'A' ELSE 'R' END AS vysledek,
             count(*) OVER () AS total_hits
      FROM titled t
      JOIN tallies ta USING (id_hlasovani)
      WHERE t.id_hlasovani NOT IN (SELECT id_hlasovani FROM void_votes)
        AND ta.pro > ta.proti
        AND t.id_hlasovani IN (SELECT id_hlasovani FROM topical)
    )
    SELECT id_hlasovani, datum, nazev_dlouhy, nazev_kratky, vysledek,
           pro, proti, zdrzel, nehlasoval, prihlaseno, total_hits
    FROM votes
    ORDER BY id_hlasovani DESC
    LIMIT 20 OFFSET 20
    """,
    tags=("composite", "browser", "P6", "J8", "O3", "serving"),
    priority=18,
    doc="The FULL votes-browser page the serving layer exposes at "
    "/api/votes (QueryService.votes — reference votes_service.py:160-230 "
    "list_votes): per-vote tallies from ONE map-side-combined aggregate "
    "over mp_votes, void anti-join, derived outcome + outcome filter, "
    "diacritic-folded title search pushed to the orders/customer scan, "
    "topic SEMI-JOIN through lineitem->part, scalar broadcast hit count "
    "(never an unpartitioned window over the hits), newest-first offset "
    "page. One oracle-paired plan proving the serving composite "
    "end-to-end, not just its pieces.",
)
def votes_browser_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.functions.text import contains_normalized
    from pspcz_analyzer_spark.operators.pagination import page_offset

    mp = derive_mp_votes(spark, sf_dir)
    tallies = mp.groupBy("id_hlasovani").agg(
        F.sum(F.when(F.col("vysledek") == "A", 1).otherwise(0)).alias("pro"),
        F.sum(F.when(F.col("vysledek") == "B", 1).otherwise(0)).alias("proti"),
        F.sum(F.when(F.col("vysledek") == "C", 1).otherwise(0)).alias("zdrzel"),
        F.sum(F.when(F.col("vysledek") == "F", 1).otherwise(0)).alias(
            "nehlasoval"
        ),
        F.count(F.lit(1)).alias("prihlaseno"),
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    )
    raw = load_table(spark, sf_dir, "orders")
    titled = (
        raw.join(cust, raw.o_custkey == cust.c_custkey)
        .select(
            F.col("o_orderkey").alias("id_hlasovani"),
            F.col("o_orderdate").alias("datum"),
            F.coalesce(F.col("c_name"), F.lit("")).alias("nazev_dlouhy"),
            F.col("o_orderpriority").alias("nazev_kratky"),
        )
        .filter(
            contains_normalized("nazev_dlouhy", "12")
            | contains_normalized("nazev_kratky", "12")
        )
    )
    void = derive_void_votes(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("id_hlasovani"), "l_partkey"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(contains_normalized("p_type", "PROMO"))
        .select("p_partkey")
    )
    topical = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .select("id_hlasovani")
        .distinct()
    )
    votes = (
        titled.join(void, "id_hlasovani", "left_anti")
        .join(tallies, "id_hlasovani")
        .withColumn(
            "vysledek",
            F.when(F.col("pro") > F.col("proti"), "A").otherwise("R"),
        )
        .filter(F.col("vysledek") == "A")
        .join(topical, "id_hlasovani", "left_semi")
    )
    total = votes.agg(F.count(F.lit(1)).alias("total_hits"))
    page = page_offset(
        votes.crossJoin(F.broadcast(total)),
        [F.col("id_hlasovani").desc()],
        page=2,
        per_page=20,
    )
    return page.select(
        "id_hlasovani", "datum", "nazev_dlouhy", "nazev_kratky", "vysledek",
        "pro", "proti", "zdrzel", "nehlasoval", "prihlaseno", "total_hits",
    )
