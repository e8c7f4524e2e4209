"""Query facade over a long-lived SparkSession (SURVEY §3.1 lifecycle).

The reference's route layer resolves params, checks a TTL cache, and runs
the Polars compute in a pool
(/root/reference/pspcz_analyzer/routes/voting.py:23-45). Here step 5 is a
lazy Spark plan; the facade collects the (small) result to row dicts at the
serving edge only — operators themselves never collect. The TTL cache
absorbs repeats; a data refresh calls ``invalidate()``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import SparkSession

from pspcz_analyzer_spark.operators import voting as V
from pspcz_analyzer_spark.plans import query_fns
from pspcz_analyzer_spark.plans.voting import (
    derive_mp_info,
    derive_mp_votes,
    derive_void_votes,
)
from pspcz_analyzer_spark.serving.cache import TTLCache

Rows = list[dict[str, Any]]


def _strip_sql_quoted(sql: str, backslash_escapes: bool = True) -> str:
    """ONE left-to-right scan that blanks string literals ('', "",
    backslash and doubled-quote escapes), backquoted identifiers
    (doubled-backquote escapes), line comments, and nested bracketed
    comments from a Spark SQL text, each replaced by a single space.

    The states are mutually exclusive IN ORDER, which is the security
    property: a comment opener inside a string literal never starts a
    comment, and a quote inside a comment never opens a string — the
    earlier layered-regex version stripped comments FIRST and was
    bypassable by smuggling ``/*`` / ``--`` / ``'`` markers inside
    literals so the stripped copy lost the DML while Spark still saw
    it. An unterminated region blanks to end-of-text (Spark would
    reject the statement at parse anyway).

    ``backslash_escapes=False`` mirrors the legacy session conf
    ``spark.sql.parser.escapedStringLiterals=true`` (ADVICE r10):
    under it Spark treats a backslash inside EVERY string literal as
    an ordinary character, so the literal ends at the first closing
    quote — the guard must end its string there too, or text Spark
    executes as code is blanked from the guard's view."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        two = sql[i : i + 2]
        if two == "--":
            j = sql.find("\n", i)
            i = n if j < 0 else j  # the newline itself survives
            out.append(" ")
            continue
        if two == "/*":
            depth, i = 1, i + 2
            while i < n and depth:
                nxt = sql[i : i + 2]
                if nxt == "/*":  # Spark supports nested comments
                    depth += 1
                    i += 2
                elif nxt == "*/":
                    depth -= 1
                    i += 2
                else:
                    i += 1
            out.append(" ")
            continue
        c = sql[i]
        if c in ("'", '"', "`"):
            # Spark RAW strings (r'...' / R"...") process NO escapes, so
            # a backslash inside one must not extend the guard's string
            # past Spark's. Treating ANY r/R-preceded quote as raw is
            # the fail-closed direction: when the r is really the tail
            # of an identifier (maximal-munch lexes `colr'x'` as
            # identifier + NORMAL string), the guard may end the string
            # early and scan string content as code — which can only
            # ADD keyword hits (false refusal), never hide one.
            raw = c != "`" and i > 0 and sql[i - 1] in "rR"
            i += 1
            while i < n:
                if (
                    sql[i] == "\\"
                    and c != "`"
                    and not raw
                    and backslash_escapes
                ):
                    i += 2
                    continue
                if sql[i] == c:
                    if sql[i + 1 : i + 2] == c:  # doubled-quote escape
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            out.append(" ")
            continue
        out.append(c)
        i += 1
    return "".join(out)


# Parse-tree classification (VERDICT r10 task 1). The lexer above is a
# fast fail-closed PRE-FILTER; the authoritative read-only decision uses
# Spark's OWN parser so the guard can never desync from Spark's grammar
# (round 10 fixed three such desyncs in one round: comment/quote markers
# smuggled inside string literals, CTE-prefixed DML, raw-string escapes).
# Any node in the parsed tree matching one of these refuses the statement:
#   Command          — every eagerly-run command (DDL, SET, EXPLAIN, CACHE,
#                      ANALYZE, REFRESH, MSCK, LOAD, TRUNCATE, ALTER, SHOW,
#                      DESCRIBE, DECLARE, SQL-scripting CompoundBody, and
#                      the v2 DML nodes Update/Delete/MergeInto all mix it
#                      in on Spark 4.1);
#   ParsedStatement  — parser-level statements, notably InsertIntoStatement;
#   InsertIntoDir    — INSERT OVERWRITE DIRECTORY (plain UnaryNode, neither
#                      of the above);
#   Update/Delete/Merge/InsertIntoStatement — listed explicitly anyway so
#                      the guard survives a Spark release moving them off
#                      the Command trait.
# The TREE walk (not a root check) is load-bearing: `WITH q AS (...)
# INSERT ...` parses to UnresolvedWith(InsertIntoStatement) — the DML is a
# CHILD, verified against pyspark 4.1.2 in test_serving.
_REFUSED_PLAN_TRAITS = (
    "org.apache.spark.sql.catalyst.plans.logical.Command",
    "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement",
    "org.apache.spark.sql.catalyst.plans.logical.InsertIntoDir",
    "org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement",
    "org.apache.spark.sql.catalyst.plans.logical.UpdateTable",
    "org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable",
    "org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable",
)
# EXECUTE IMMEDIATE runs a DYNAMIC statement (its payload is a runtime
# string the static classifier cannot see), so it is refused outright.
# Its node class lives outside plans.logical and carries no refused
# trait on 4.1, hence the simple-name match. CALL (r11 self-review):
# `CALL cat.proc(...)` parses to Call(UnresolvedProcedure) which mixes
# in NONE of the refused traits on 4.1 — a stored procedure is an
# arbitrary catalog-defined mutation primitive, so the construct is
# refused by name like EXECUTE IMMEDIATE.
_REFUSED_PLAN_NAMES = frozenset(
    {
        "UnresolvedExecuteImmediate",
        "ExecuteImmediateQuery",
        "ExecuteImmediateCommand",
        "CompoundBody",
        "Call",
        "UnresolvedProcedure",
    }
)


def classify_readonly_plan(spark: SparkSession, query: str) -> None:
    """Parse ``query`` with Spark's own parser (parse ONLY — nothing
    executes; commands run at ``spark.sql`` time, not at ``parsePlan``)
    and raise ``ValueError`` if ANY node of the parse tree is a
    command / DML / DDL / dynamic-SQL node. Returns silently for pure
    query trees and for statements that fail to parse — a parse
    failure cannot execute, and letting ``spark.sql`` re-raise keeps
    the user-facing ``ParseException`` canonical. Fails CLOSED if the
    classifier classes cannot be loaded."""
    jparser = spark._jsparkSession.sessionState().sqlParser()
    try:
        root = jparser.parsePlan(query)
    except Exception:
        return  # unparseable => spark.sql raises the same ParseException
    jvm = spark._jvm
    traits = []
    for name in _REFUSED_PLAN_TRAITS:
        try:
            traits.append((name, jvm.java.lang.Class.forName(name)))
        except Exception:
            pass  # class absent in this Spark version
    if not any(n.endswith(".Command") for n, _ in traits):
        raise ValueError(
            "sql() read-only classifier could not load Spark's Command "
            "trait; refusing the statement (fail closed)"
        )
    stack = [root]
    while stack:
        node = stack.pop()
        simple = node.getClass().getSimpleName()
        for name, cls in traits:
            if cls.isInstance(node):
                raise ValueError(
                    "sql() executes read-only queries only; parsed plan "
                    f"contains {simple} ({name.rsplit('.', 1)[-1]} node)"
                )
        if simple in _REFUSED_PLAN_NAMES:
            raise ValueError(
                "sql() executes read-only queries only; parsed plan "
                f"contains {simple} (dynamic/compound statement)"
            )
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


class QueryTimeoutError(TimeoutError):
    """Raised when a query exceeds the service's compute budget — the
    serving layer maps this to 503, exactly the reference's analysis
    timeout contract (routes/voting.py:39,64: 15 s else 503)."""


class QueryService:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        ttl_seconds: float = 3600.0,
        clock=None,
        budget_seconds: float | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        kwargs = {"clock": clock} if clock else {}
        self.cache = TTLCache(ttl_seconds, **kwargs)
        self.compute_calls = 0  # observability: cache-miss counter
        self.budget_seconds = budget_seconds

    def _collect_budgeted(self, df_fn) -> Rows:
        """Collect under the compute budget via job-group cancellation.

        Spark's native budget mechanism: tag this thread's jobs with a
        group id, arm a timer that cancels the group (interrupting running
        tasks), and translate the resulting cancellation error. The
        session stays healthy — cancellation is per-group, so concurrent
        and subsequent queries are untouched (proven in test_serving).
        """
        if not self.budget_seconds:
            return [r.asDict(recursive=True) for r in df_fn().collect()]
        import threading
        import uuid

        sc = self.spark.sparkContext
        group = f"svc-budget-{uuid.uuid4().hex[:8]}"
        done = threading.Event()
        fired = threading.Event()  # set IFF the killer actually cancelled

        def killer() -> None:
            if not done.wait(self.budget_seconds):
                fired.set()
                # Re-cancel until the caller returns: cancelJobGroup only
                # kills ACTIVE jobs, and a plan that blows the budget
                # during compilation submits its job after the first
                # cancel. NB cancellation lands at task boundaries and
                # interruption points — a single monolithic codegen task
                # dies late; real scale-out queries are many-task, which
                # is exactly the shape that cancels promptly.
                while not done.is_set():
                    sc.cancelJobGroup(group)
                    done.wait(1.0)

        sc.setJobGroup(group, "budgeted serving query", interruptOnCancel=True)
        timer = threading.Thread(target=killer, daemon=True)
        timer.start()
        try:
            return [r.asDict(recursive=True) for r in df_fn().collect()]
        except Exception as e:
            # Translate to a 503 timeout ONLY when our killer actually
            # cancelled the group — an unrelated failure whose message
            # happens to mention cancellation must surface as itself. Keep
            # the original as __cause__ either way for diagnosability.
            if fired.is_set() and "cancel" in str(e).lower():
                raise QueryTimeoutError(
                    f"query exceeded {self.budget_seconds}s budget"
                ) from e
            raise
        finally:
            done.set()
            sc.setLocalProperty("spark.jobGroup.id", None)

    def _cached(self, key: str, df_fn) -> Rows:
        def compute() -> Rows:
            self.compute_calls += 1
            return self._collect_budgeted(df_fn)

        return self.cache.get_or_compute(key, compute)

    # -- analysis endpoints (route semantics of routes/voting.py) --

    def loyalty(self, top: int | None = 30, party: str | None = None) -> Rows:
        key = f"loyalty:{self.sf_dir}:{top}:{party}"
        return self._cached(
            key,
            lambda: V.loyalty(
                derive_mp_votes(self.spark, self.sf_dir),
                derive_void_votes(self.spark, self.sf_dir),
                derive_mp_info(self.spark, self.sf_dir),
                top=top,
                party_filter=party,
            ),
        )

    def attendance(
        self, sort: str = "worst", top: int | None = 30, party: str | None = None
    ) -> Rows:
        key = f"attendance:{self.sf_dir}:{sort}:{top}:{party}"
        return self._cached(
            key,
            lambda: V.attendance(
                derive_mp_votes(self.spark, self.sf_dir),
                derive_void_votes(self.spark, self.sf_dir),
                derive_mp_info(self.spark, self.sf_dir),
                top=top,
                sort=sort,
                party_filter=party,
            ),
        )

    def similarity(self, top: int | None = 20, cross_party_only: bool = True) -> Rows:
        """Top-k most-similar MP pairs (routes/voting.py:73-91 semantics),
        sparse-join cosine — the 30 s-budget endpoint in the reference."""
        from pspcz_analyzer_spark.operators.similarity import mp_cosine_pairs

        key = f"similarity:{self.sf_dir}:{top}:{cross_party_only}"
        return self._cached(
            key,
            lambda: mp_cosine_pairs(
                derive_mp_votes(self.spark, self.sf_dir),
                derive_void_votes(self.spark, self.sf_dir),
                derive_mp_info(self.spark, self.sf_dir),
                k=top,
                cross_party_only=cross_party_only,
            ),
        )

    def vote_detail(self, vote_id: int) -> Rows:
        """Per-MP detail rows for one vote with party/vote tallies attached
        (the §3.2 lifecycle, votes_service.py:303-319) — point filter pushed
        to the scan, broadcast dims, windows over the one-vote rows."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        def build():
            one = derive_mp_votes(self.spark, self.sf_dir).filter(
                F.col("id_hlasovani") == vote_id
            )
            info = F.broadcast(
                derive_mp_info(self.spark, self.sf_dir).select(
                    "id_poslanec", "jmeno", "party"
                )
            )
            # Tallies partition by (vote id, party) / vote id — constant
            # after the point filter, so no global single-partition window.
            pw = Window.partitionBy("id_hlasovani", "party")
            vw = Window.partitionBy("id_hlasovani")
            return (
                one.join(info, "id_poslanec")
                .select(
                    "id_poslanec",
                    "jmeno",
                    "party",
                    "vysledek",
                    F.sum(F.when(F.col("vysledek") == "A", 1).otherwise(0))
                    .over(pw)
                    .alias("party_yes"),
                    F.sum(F.when(F.col("vysledek") == "B", 1).otherwise(0))
                    .over(pw)
                    .alias("party_no"),
                    F.count(F.lit(1)).over(pw).alias("party_total"),
                    F.count(F.lit(1)).over(vw).alias("vote_total"),
                )
                .orderBy("id_poslanec")
            )

        return self._cached(f"vote:{self.sf_dir}:{vote_id}", build)

    def laws(
        self,
        status: str | None = None,
        priorities: list[str] | None = None,
        search: str | None = None,
        page: int = 1,
        per_page: int = 20,
    ) -> Rows:
        """Laws-listing composite (law_service.py:160-187): optional status/
        topic filters + normalized name search + total-hit count + offset
        page, one plan per call."""
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.functions.text import contains_normalized
        from pspcz_analyzer_spark.operators.pagination import page_offset

        def build():
            orders = load_table(self.spark, self.sf_dir, "orders")
            cust = load_table(self.spark, self.sf_dir, "customer").select(
                "c_custkey", "c_name"
            )
            hits = orders
            if status is not None:
                hits = hits.filter(F.col("o_orderstatus") == status)
            if priorities:
                hits = hits.filter(F.col("o_orderpriority").isin(*priorities))
            hits = hits.join(
                F.broadcast(cust), hits.o_custkey == cust.c_custkey
            )
            if search:
                hits = hits.filter(contains_normalized("c_name", search))
            hits = hits.select(
                "o_orderkey", "o_orderdate", "o_orderpriority", "c_name"
            )
            # Scalar count + one-row broadcast, not an unpartitioned window:
            # a popular search term must not funnel every hit through one task.
            total = hits.agg(F.count(F.lit(1)).alias("total_hits"))
            hits = hits.crossJoin(F.broadcast(total))
            return page_offset(
                hits,
                [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
                page=page,
                per_page=per_page,
            )

        key = (
            f"laws:{self.sf_dir}:{status}:{','.join(priorities or [])}:"
            f"{search}:{page}:{per_page}"
        )
        return self._cached(key, build)

    def amendments(
        self, search: str = "", page: int = 1, per_page: int = 20
    ) -> Rows:
        """Amendments listing (routes/amendments.py:21-47 param shape:
        ``?search=&page=``): the merged steno+letter table, optionally
        filtered by a diacritic-folded submitter search, offset-paged.
        Each row carries ``total_hits`` from a broadcast scalar count —
        the same shape as :meth:`laws`, never an unpartitioned window."""
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.functions.text import contains_normalized
        from pspcz_analyzer_spark.operators.pagination import page_offset

        def build():
            df = query_fns()["amendments_merged"](self.spark, self.sf_dir)
            if search:
                df = df.filter(contains_normalized("submitters", search))
            total = df.agg(F.count(F.lit(1)).alias("total_hits"))
            hits = df.crossJoin(F.broadcast(total))
            return page_offset(
                hits,
                [F.col("doc_id").asc(), F.col("seq").asc()],
                page=page,
                per_page=per_page,
            )

        key = f"amendments:{self.sf_dir}:{search}:{page}:{per_page}"
        return self._cached(key, build)

    def coalitions(self) -> dict[str, Rows]:
        """Amendment-coalition analysis (routes/amendments.py:50-69 shape:
        no params beyond the period, which this service pins): per-party
        cohesion (overall + amendment votes) and cross-party pair
        agreement, both already-green catalog queries. The two parts cache
        and budget independently through the standard path."""
        fns = query_fns()
        cohesion = self._cached(
            f"coalitions:cohesion:{self.sf_dir}",
            lambda: fns["coalition_cohesion"](self.spark, self.sf_dir),
        )
        pairs = self._cached(
            f"coalitions:pairs:{self.sf_dir}",
            lambda: fns["party_pair_agreement"](self.spark, self.sf_dir),
        )
        return {"cohesion": cohesion, "pair_agreement": pairs}

    # -- chart endpoints (routes/charts.py:39-193 semantics) --

    def loyalty_chart(
        self, top: int = 20, party: str | None = None
    ) -> tuple[bytes, str]:
        """Loyalty horizontal-bar chart (routes/charts.py:39-75): the cached
        loyalty rows labeled ``jmeno prijmeni (party)``, rendered
        driver-side (PNG via matplotlib when installed, SVG otherwise).
        Rendering never touches the cluster — it consumes the same cached
        row list the JSON endpoint serves."""
        from pspcz_analyzer_spark.serving.charts import render_chart

        rows = self.loyalty(top=top, party=party)
        labeled = [
            {**r, "mp": f"{r['jmeno']} {r['prijmeni']} ({r['party'] or '?'})"}
            for r in rows
        ]
        return render_chart(
            labeled,
            "barh",
            title="Rebellion rate (%)",
            max_rows=top,
            label="mp",
            value="rebellion_pct",
        )

    def attendance_chart(
        self, top: int = 20, sort: str = "worst", party: str | None = None
    ) -> tuple[bytes, str]:
        """Attendance horizontal-bar chart (routes/charts.py:78-135)."""
        from pspcz_analyzer_spark.serving.charts import render_chart

        rows = self.attendance(sort=sort, top=top, party=party)
        labeled = [
            {**r, "mp": f"{r['jmeno']} {r['prijmeni']} ({r['party'] or '?'})"}
            for r in rows
        ]
        return render_chart(
            labeled,
            "barh",
            title="Attendance (%)",
            max_rows=top,
            label="mp",
            value="attendance_pct",
        )

    def similarity_chart(self) -> tuple[bytes, str]:
        """PCA scatter of MPs colored by party (routes/charts.py:138-190):
        the 2-D vote-matrix PCA joined with broadcast MP info, cached like
        every analysis result, scatter-rendered driver-side."""
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.serving.charts import render_chart

        def build():
            coords = query_fns()["mp_pca_coords"](self.spark, self.sf_dir)
            info = F.broadcast(
                derive_mp_info(self.spark, self.sf_dir).select(
                    "id_poslanec", "jmeno", "prijmeni", "party"
                )
            )
            return coords.join(info, "id_poslanec", "left")

        rows = self._cached(f"pca_chart:{self.sf_dir}", build)
        labeled = [
            {**r, "mp": f"{r['jmeno']} {r['prijmeni']}"} for r in rows
        ]
        return render_chart(
            labeled,
            "scatter",
            title="MP voting similarity (PCA)",
            x="x",
            y="y",
            group="party",
            point_label="mp",
        )

    def votes(
        self,
        search: str = "",
        outcome: str = "",
        topic: str = "",
        page: int = 1,
        per_page: int = 30,
    ) -> dict:
        """Votes browser — the reference's most-used page
        (votes_service.py:160-230 ``list_votes`` + routes/pages.py:38-78):
        one row per non-void vote with per-code tallies and a derived
        outcome, filtered by diacritic-insensitive title search (P6),
        outcome code, and a topic SEMI-JOIN (J8 — votes whose order
        touches a part whose type mentions the topic), sorted newest
        first and offset-paged with a total-hit count. Returns the
        reference's page dict: rows/total/page/per_page/total_pages.

        Plan shape at scale: tallies are ONE map-side-combined aggregate
        over mp_votes; the void exclusion is an anti-join against the
        (small) void list; the topic filter is a semi-join whose part
        side is filtered before the join; the hit count is a scalar
        aggregate broadcast back, never an unpartitioned window."""
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.functions.text import contains_normalized
        from pspcz_analyzer_spark.operators.pagination import page_offset
        from pspcz_analyzer_spark.plans.voting import (
            derive_mp_votes,
            derive_void_votes,
        )

        def build(page: int):
            mp = derive_mp_votes(self.spark, self.sf_dir)
            tallies = mp.groupBy("id_hlasovani").agg(
                F.sum(F.when(F.col("vysledek") == "A", 1).otherwise(0)).alias("pro"),
                F.sum(F.when(F.col("vysledek") == "B", 1).otherwise(0)).alias("proti"),
                F.sum(F.when(F.col("vysledek") == "C", 1).otherwise(0)).alias("zdrzel"),
                F.sum(F.when(F.col("vysledek") == "F", 1).otherwise(0)).alias("nehlasoval"),
                F.count(F.lit(1)).alias("prihlaseno"),
            )
            cust = F.broadcast(
                load_table(self.spark, self.sf_dir, "customer").select(
                    "c_custkey", "c_name"
                )
            )
            raw = load_table(self.spark, self.sf_dir, "orders")
            orders = raw.join(
                cust, raw.o_custkey == cust.c_custkey
            ).select(
                F.col("o_orderkey").alias("id_hlasovani"),
                F.col("o_orderdate").cast("string").alias("datum"),
                F.coalesce(F.col("c_name"), F.lit("")).alias("nazev_dlouhy"),
                F.col("o_orderpriority").alias("nazev_kratky"),
            )
            if search and search.strip():
                # Pushed to the orders scan BEFORE the tally join.
                orders = orders.filter(
                    contains_normalized("nazev_dlouhy", search.strip())
                    | contains_normalized("nazev_kratky", search.strip())
                )
            void = derive_void_votes(self.spark, self.sf_dir)
            votes = (
                orders.join(void, "id_hlasovani", "left_anti")
                .join(tallies, "id_hlasovani")
                .withColumn(
                    "vysledek",
                    F.when(F.col("pro") > F.col("proti"), "A").otherwise("R"),
                )
            )
            if outcome:
                votes = votes.filter(F.col("vysledek") == outcome)
            if topic:
                li = load_table(self.spark, self.sf_dir, "lineitem").select(
                    F.col("l_orderkey").alias("id_hlasovani"), "l_partkey"
                )
                part = (
                    load_table(self.spark, self.sf_dir, "part")
                    .filter(contains_normalized("p_type", topic))
                    .select("p_partkey")
                )
                topical = (
                    li.join(part, li.l_partkey == part.p_partkey, "left_semi")
                    .select("id_hlasovani")
                    .distinct()
                )
                votes = votes.join(topical, "id_hlasovani", "left_semi")
            total = votes.agg(F.count(F.lit(1)).alias("total_hits"))
            votes = votes.crossJoin(F.broadcast(total))
            return page_offset(
                votes,
                [F.col("id_hlasovani").desc()],
                page=page,
                per_page=per_page,
            )

        def fetch(p: int) -> list:
            key = (
                f"votes:{self.sf_dir}:{search}:{outcome}:{topic}:{p}:{per_page}"
            )
            return self._cached(key, lambda: build(page=p))

        # Reference parity (votes_service.list_votes): page clamps into
        # [1, total_pages] — an out-of-range request returns the LAST page,
        # not an empty one. The total rides every row, so an empty
        # out-of-range fetch learns it from page 1 and re-slices once.
        page = max(1, int(page))
        rows = fetch(page)
        if not rows and page > 1:
            rows = fetch(1)
            total = rows[0]["total_hits"] if rows else 0
            page = min(page, max(1, (total + per_page - 1) // per_page))
            if page != 1:
                rows = fetch(page)
        total = rows[0]["total_hits"] if rows else 0
        # Strip via COPY — cached row dicts are shared across calls, and
        # popping in place would strip the total from the cache itself.
        rows = [
            {k: v for k, v in r.items() if k != "total_hits"} for r in rows
        ]
        total_pages = max(1, (total + per_page - 1) // per_page)
        return {
            "rows": rows,
            "total": total,
            "page": page,
            "per_page": per_page,
            "total_pages": total_pages,
        }

    def _discover_manifest_tables(self) -> "dict[str, str]":
        """{name: path} of manifest-committed tables this service may
        describe: directories under the data dir plus this sf_dir's
        scratch tables — the SAME closed set /health reports, so the
        lake-inspection route can resolve by NAME and never read an
        arbitrary caller-supplied path."""
        import os as _os
        import tempfile as _tempfile

        from pspcz_analyzer_spark import manifest as M

        tag = self.sf_dir.strip("/").replace("/", "_")
        tmp = _tempfile.gettempdir()
        candidates = [
            (name, _os.path.join(self.sf_dir, name))
            for name in (
                sorted(_os.listdir(self.sf_dir))
                if _os.path.isdir(self.sf_dir)
                else []
            )
        ] + [
            (name, _os.path.join(tmp, name))
            for name in sorted(_os.listdir(tmp))
            if name.startswith("pspcz_spark_") and tag in name
        ]
        return {
            name: p
            for name, p in candidates
            if _os.path.isdir(_os.path.join(p, M.MANIFEST_DIR))
        }

    def lake_detail(self, name: str) -> dict:
        """DESCRIBE DETAIL for one manifest table (resolved by NAME from
        the discovered set — unknown names raise KeyError): version +
        in-commit timestamp, schema, protocol, table properties
        (clustering spec etc.), pending merge-on-read delete entries,
        tags, staged WAP refs, and the history tail. Pure metadata —
        no Spark job runs, so the lake stays inspectable while the
        cluster is saturated."""
        from pspcz_analyzer_spark import manifest as M

        tables = self._discover_manifest_tables()
        if name not in tables:
            raise KeyError(name)
        path = tables[name]
        m = M.read_manifest(path)
        hist = M.history(path)
        # Clustering health: when the table records a clustering column,
        # report its overlap depth (1 = perfect pruning) — the number an
        # operator watches to know when layout maintenance is due.
        cluster_by = (m.get("props") or {}).get("cluster_by")
        depth = None
        if cluster_by:
            try:
                depth = M.clustering_depth(path, cluster_by.split(",")[0])
            except Exception:
                depth = None
        return {
            "name": name,
            "version": m["version"],
            "committed_at": m.get("ts"),
            "n_files": len(m["files"]),
            "n_rows": hist[-1].get("n_rows") if hist else None,
            "schema": m.get("schema"),
            "protocol": m.get("protocol"),
            "properties": m.get("props") or {},
            "pending_delete_entries": len(m.get("deletes") or []),
            "partition_spec": (m.get("specs") or [None])[-1],
            "clustering_depth": depth,
            "tags": M.list_tags(path),
            "staged_refs": M.list_staged(path),
            "history_tail": hist[-5:],
        }

    def lake_estimate(
        self,
        name: str,
        col: "str | None" = None,
        lo: "str | None" = None,
        hi: "str | None" = None,
        value: "str | None" = None,
    ) -> dict:
        """Scan-size preview for a discovered manifest table — the
        serving face of ``manifest.scan_estimate``: how many files/rows/
        bytes would a scan with this predicate read, and would the
        result qualify as a broadcast side? Query params arrive as
        strings; the column's DECLARED type drives the cast, so a
        numeric range compares numerically. Pure metadata — no Spark
        job, so an operator can cost a query against a saturated
        cluster before submitting it. Unknown names raise KeyError
        (name-resolved, never a caller path). Bad input raises
        ValueError — a non-numeric bound for a numeric column, or a
        predicate on a type whose string form does not compare like
        its stats (bool/decimal/nested) — mapped to 400 at the route;
        string/date/timestamp params pass through verbatim (their
        recorded stats ARE strings that order correctly)."""
        from pspcz_analyzer_spark import manifest as M

        tables = self._discover_manifest_tables()
        if name not in tables:
            raise KeyError(name)
        path = tables[name]
        m = M.read_manifest(path)
        types = {n: (t or "").lower() for n, t in (m.get("schema") or [])}
        # A typo'd ?col= must not masquerade as "this predicate prunes
        # nothing": with a declared schema, an unknown column is a 400,
        # not a full-table estimate (mirrors the unsupported-type
        # refusal below). Schema-less tables keep the passthrough.
        if col and types and col not in types:
            raise ValueError(
                f"table {name!r} has no column {col!r}; declared: "
                + ", ".join(sorted(types))
            )

        def _cast(v: str):
            t = types.get(col or "", "")
            if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
                try:
                    return int(v)
                except ValueError:
                    raise ValueError(
                        f"column {col!r} is {t}; {v!r} is not an integer"
                    )
            if t in ("float", "double"):
                try:
                    return float(v)
                except ValueError:
                    raise ValueError(
                        f"column {col!r} is {t}; {v!r} is not a number"
                    )
            if t in ("string", "varchar", "date", "timestamp", "timestamp_ntz", ""):
                return v
            raise ValueError(
                f"column {col!r} has type {t}; string query params cannot "
                "express an exact predicate on it"
            )

        eq = {col: _cast(value)} if col and value is not None else None
        ranges = (
            {col: (_cast(lo), _cast(hi))}
            if col and lo is not None and hi is not None
            else None
        )
        est = M.scan_estimate(path, eq=eq, ranges=ranges)
        est["broadcastable"] = (
            est["bytes_kept"] is not None
            and est["bytes_kept"] <= M.BROADCAST_BYTES_THRESHOLD
        )
        return est

    def lake_join_plan(
        self,
        left: str,
        right: str,
        how: str = "inner",
        lcol: "str | None" = None,
        llo: "str | None" = None,
        lhi: "str | None" = None,
        lvalue: "str | None" = None,
        rcol: "str | None" = None,
        rlo: "str | None" = None,
        rhi: "str | None" = None,
        rvalue: "str | None" = None,
    ) -> dict:
        """Join-plan preview for two discovered manifest tables — the
        serving face of ``manifest.join_strategy`` over two
        ``scan_estimate``s: which side (if any) would ``join_auto``
        broadcast for this join type, given each side's POST-PRUNING
        size under the optional per-side predicate (same query-param
        casting contract as :meth:`lake_estimate`). Pure metadata — two
        manifest JSON reads plus one fs stat per kept file, no Spark
        job, so an operator can see the broadcast-vs-shuffle answer for
        a saturated cluster before submitting anything. Returns
        ``{strategy, left, right}``; unknown names raise KeyError
        (404), bad predicates ValueError (400)."""
        from pspcz_analyzer_spark import manifest as M

        lest = self.lake_estimate(left, col=lcol, lo=llo, hi=lhi, value=lvalue)
        rest = self.lake_estimate(right, col=rcol, lo=rlo, hi=rhi, value=rvalue)
        return {
            "strategy": M.join_strategy(lest, rest, how=how),
            "left": lest,
            "right": rest,
        }

    def health(self) -> dict:
        """Operator's first curl (reference routes/health.py:16-21, widened
        per its data-freshness intent): session liveness, per-table
        inventory with modification times (freshness), manifest versions
        for any manifest-committed tables under the data dir, and the
        serving cache's hit economics. Metadata-only — no Spark job runs,
        so the endpoint answers even while the cluster is saturated."""
        import os as _os
        import time as _time

        from pspcz_analyzer_spark.catalog import TESTDATA_TABLES

        sc = self.spark.sparkContext
        try:
            alive = not sc._jsc.sc().isStopped()
            app_id = sc.applicationId
        except Exception:
            alive, app_id = False, None
        tables = {}
        newest = 0.0
        for t in TESTDATA_TABLES:
            p = _os.path.join(self.sf_dir, f"{t}.parquet")
            if _os.path.exists(p):
                st = _os.stat(p)
                tables[t] = {
                    "bytes": st.st_size,
                    "modified_at": _time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", _time.gmtime(st.st_mtime)
                    ),
                }
                newest = max(newest, st.st_mtime)
            else:
                tables[t] = None
        manifests = {}
        try:
            from pspcz_analyzer_spark import manifest as M

            for name, p in self._discover_manifest_tables().items():
                try:
                    manifests[name] = M.current_version(p)
                except Exception:
                    manifests[name] = None
        except Exception:
            pass
        return {
            "status": "ok" if alive else "degraded",
            "spark": {"alive": alive, "app_id": app_id},
            "sf_dir": self.sf_dir,
            "tables": tables,
            "data_age_seconds": (
                round(_time.time() - newest, 1) if newest else None
            ),
            "manifest_versions": manifests,
            "cache": {
                "entries": len(getattr(self.cache, "_store", {})),
                "compute_calls": self.compute_calls,
            },
        }

    def query(self, name: str) -> Rows:
        """Any registered catalog query by name (the generic endpoint)."""
        fns = query_fns()
        if name not in fns:
            raise KeyError(f"unknown query: {name}")
        return self._cached(
            f"query:{self.sf_dir}:{name}", lambda: fns[name](self.spark, self.sf_dir)
        )

    def sql(self, query: str, max_rows: int = 10_000) -> Rows:
        """Raw SQL over the registered testdata views (spark.sql) — the
        escape hatch for users who query with SQL strings rather than the
        named catalog. Views register lazily once per service; results cap
        at ``max_rows`` so an unbounded SELECT cannot flood the driver.

        CONTRACT: read-only. Only query statements (``SELECT`` / ``WITH``
        / ``VALUES`` / ``TABLE``, optionally parenthesized) execute;
        anything else — DDL, DML, ``INSERT OVERWRITE DIRECTORY``, ``SET``
        — raises ``ValueError`` BEFORE reaching ``spark.sql`` (Spark runs
        commands eagerly at parse time, so a post-hoc plan check would be
        too late). TWO independent layers must both pass:

        1. Lexical pre-filter (fail-closed, cheap): on the output of ONE
           lexical scan (:func:`_strip_sql_quoted`, matched to the
           session's ``spark.sql.parser.escapedStringLiterals`` conf so
           its string lexing provably tracks Spark's) the leading keyword
           must be a query starter and no DML/DDL keyword may appear
           anywhere at word level. This layer can refuse a legitimate
           query using an unquoted column literally named ``insert``/
           ``update``/etc.; backquote it — false refusal is the right
           failure mode for a read-only escape hatch.
        2. Parse-tree classification (:func:`classify_readonly_plan`,
           authoritative): Spark's OWN parser parses the statement (no
           execution) and the whole tree is refused if any node is a
           Command / ParsedStatement / DML / dynamic-SQL node — so the
           guard cannot desync from Spark's grammar the way a bespoke
           lexer can (r10's three in-round lexer fixes)."""
        from pspcz_analyzer_spark.catalog import register_views

        legacy_escapes = (
            str(
                self.spark.conf.get(
                    "spark.sql.parser.escapedStringLiterals", "false"
                )
            ).lower()
            == "true"
        )
        bare = _strip_sql_quoted(query, backslash_escapes=not legacy_escapes)
        if not re.match(
            r"^\s*(?:\(\s*)*(?:select|with|values|table)\b", bare, re.I
        ):
            raise ValueError(
                "sql() executes read-only queries only "
                "(SELECT / WITH / VALUES / TABLE); statement refused"
            )
        hit = re.search(
            r"\b(insert|update|delete|merge|set|drop|create|alter|"
            r"truncate|grant|revoke|refresh|msck|analyze|cache|"
            r"uncache|load)\b",
            bare,
            re.I,
        )
        if hit:
            raise ValueError(
                "sql() executes read-only queries only; statement "
                f"contains {hit.group(1).upper()!r} outside a string "
                "literal (CTE-prefixed DML is refused too) — backquote "
                "the identifier if it is a column name"
            )
        classify_readonly_plan(self.spark, query)
        if not getattr(self, "_views_ready", False):
            register_views(self.spark, self.sf_dir)
            self._views_ready = True
        df = self.spark.sql(query).limit(max_rows)
        return [r.asDict(recursive=True) for r in df.collect()]

    def invalidate(self, prefix: str = "") -> int:
        """Data-refresh hook: drop cached results (optionally by prefix)."""
        if prefix:
            return self.cache.invalidate_prefix(prefix)
        self.cache.clear()
        return -1
