"""Text-analysis + dedup coverage over the documents table.

The training-data-pipeline surface (BASELINE.json north star): search with
diacritic folding (SURVEY P6/F4), token counting, quality scoring,
fingerprinting, exact + near-duplicate detection. Every oracle replicates
the exact normalization pipeline in DuckDB SQL (strip_accents == our
translate table on this corpus; both asserted in unit tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.functions.text import (
    bpe_ish_token_count,
    contains_normalized,
    strip_html,
    token_count,
)
from pspcz_analyzer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pspcz_analyzer_spark.operators.textual import (
    add_fingerprint,
    language_id,
    quality_score,
)
from pspcz_analyzer_spark.plans import register

# DuckDB expression equal to functions.text.normalize_text on this corpus.
_NORM = "trim(regexp_replace(strip_accents(lower({c})), '\\s+', ' ', 'g'))"


@register(
    "doc_search_normalized",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_NORM.format(c="text")} LIKE '%merge%'
    ORDER BY doc_id
    """,
    tags=("P6", "F4", "search"),
    doc="Diacritic-insensitive substring search (votes browser search, "
    "votes_service.py:101-112) — built-in translate, no UDF.",
)
def doc_search_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(contains_normalized("text", "merge"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "docs_browser_page",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang, source, n_chars,
             count(*) OVER () AS total_hits
      FROM documents
      WHERE {_NORM.format(c="text")} LIKE '%merge%'
    )
    SELECT doc_id, lang, source, n_chars, total_hits
    FROM hits
    ORDER BY doc_id DESC
    LIMIT 25 OFFSET 25
    """,
    tags=("P6", "O3", "composite", "browser"),
    doc="The votes-browser composite lifecycle (§3.2): diacritic-folded "
    "search + total-hit count + offset pagination in one plan "
    "(votes_service.py:101-177). The total-hit count is a scalar "
    "aggregate broadcast back onto the rows — never an unpartitioned "
    "window, which would funnel every hit through one task at scale.",
)
def docs_browser_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.pagination import page_offset

    docs = load_table(spark, sf_dir, "documents")
    matches = docs.filter(contains_normalized("text", "merge")).select(
        "doc_id", "lang", "source", "n_chars"
    )
    total = matches.agg(F.count(F.lit(1)).alias("total_hits"))
    hits = matches.crossJoin(F.broadcast(total))
    return page_offset(hits, [F.col("doc_id").desc()], page=2, per_page=25)


@register(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INTEGER)
             AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("tokens", "text-analysis"),
    doc="Token counting: whitespace + BPE-ish regex pieces (LLM budget "
    "accounting; reference caps by chars, config.py:113-121).",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             len(list_distinct(string_split({_NORM.format(c="text")}, ' '))) AS n_distinct,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio,
             length(text)::DOUBLE AS n_chars_d
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_tokens,
             round(n_distinct / greatest(n_tokens, 1), 6) AS distinct_ratio,
             round(punct_ratio, 6) AS punct_ratio,
             round(n_chars_d / greatest(n_tokens, 1), 6) AS mean_token_len,
             n_distinct / greatest(n_tokens, 1) AS dr_raw,
             n_chars_d / greatest(n_tokens, 1) AS mtl_raw,
             punct_ratio AS pr_raw
      FROM feat
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, distinct_ratio, punct_ratio,
           mean_token_len,
           CAST(round(
             (CASE WHEN n_tokens < 5 THEN 0.0 ELSE 1.0 END) * 0.25
             + (CASE WHEN mtl_raw >= 3 AND mtl_raw <= 12 THEN 1.0 ELSE 0.0 END) * 0.25
             + (CASE WHEN dr_raw >= 0.3 THEN 1.0 ELSE 0.0 END) * 0.25
             + (CASE WHEN pr_raw <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25, 6)
           AS DOUBLE) AS quality_score
    FROM scored
    ORDER BY doc_id
    """,
    tags=("quality", "text-analysis"),
    doc="Per-document quality features + rule score (C4/Gopher-style corpus "
    "filtering shape) — all codegen'd column expressions.",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs).select(
        "doc_id", "n_tokens", "distinct_ratio", "punct_ratio", "mean_token_len", "quality_score"
    ).orderBy("doc_id")


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id, md5({_NORM.format(c="text")}) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    tags=("fingerprint", "text-analysis"),
    doc="Content fingerprint: md5 of normalized text (exact-dup grouping key).",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return add_fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")


@register(
    "exact_dedup_survivors",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
    ),
    fp AS (SELECT doc_id, md5({_NORM.format(c="text")}) AS f FROM corpus)
    SELECT min(doc_id) AS doc_id FROM fp GROUP BY f
    ORDER BY doc_id
    """,
    tags=("dedup-exact",),
    doc="Exact dedup (hash-groupBy on fingerprint, keep min id) over a "
    "corpus with planted exact duplicates.",
)
def exact_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = docs.unionByName(dups)
    return exact_dedup(corpus).select("doc_id").orderBy("doc_id")


@register(
    "near_dup_jaccard",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             )) AS shingle
      FROM norm
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           round(i.intersection / (sa.set_size + sb.set_size - i.intersection), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.intersection / (sa.set_size + sb.set_size - i.intersection) >= 0.3
    ORDER BY id_a, id_b
    """,
    tags=("dedup-near", "J11-scale"),
    doc="Exact n-gram (3-shingle) Jaccard near-dup pairs over a corpus with "
    "planted half-length near-duplicates; docs only meet via shared "
    "shingles (no n^2).",
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    halved = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(n_chars / 2) AS INT))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(halved)
    return ngram_jaccard_pairs(corpus, n=3, threshold=0.3).orderBy("id_a", "id_b")


@register(
    "near_dup_jaccard_capped",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             )) AS shingle
      FROM norm
    ),
    hot AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 20
    ),
    kept AS (SELECT * FROM sh ANTI JOIN hot USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           round(i.intersection / (sa.set_size + sb.set_size - i.intersection), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.intersection / (sa.set_size + sb.set_size - i.intersection) >= 0.3
    ORDER BY id_a, id_b
    """,
    tags=("dedup-near", "scale-path", "new-surface"),
    priority=30,
    doc="Hot-shingle-capped Jaccard near-dup (document frequency > 20 "
    "dropped before the self-join): the corpus-scale formulation — join "
    "fanout is bounded per shingle, so cost tracks true overlap even when "
    "stopword n-grams dominate. Oracle recomputes the capped semantics "
    "exactly; on this corpus the surviving pair set matches the exact "
    "variant's planted dups.",
)
def near_dup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    halved = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(n_chars / 2) AS INT))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(halved)
    return ngram_jaccard_pairs(
        corpus, n=3, threshold=0.3, max_shingle_df=20
    ).orderBy("id_a", "id_b")


@register(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             )) AS shingle
      FROM norm
    ),
    hot AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 20
    ),
    kept AS (SELECT * FROM sh ANTI JOIN hot USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.intersection / (sa.set_size + sb.set_size - i.intersection) >= 0.3
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT node, component,
           CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
             AS component_size
    FROM comp
    ORDER BY node
    """,
    tags=("dedup-near", "clustering", "iterative", "new-surface"),
    priority=30,
    doc="Near-dup PAIRS -> CLUSTERS via iterative hash-to-min connected "
    "components (operators/graph.py): the transitive-closure step an "
    "actual dedup pass needs before picking survivors. Each iteration is "
    "one node-keyed shuffle; near-dup graphs are near-cliques so the loop "
    "converges in 2-3 rounds. The oracle recomputes components as a "
    "recursive-CTE closure — min-id labels make the fixpoint "
    "deterministic and value-comparable.",
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.graph import cluster_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    halved = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(n_chars / 2) AS INT))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(halved)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.3, max_shingle_df=20)
    return cluster_pairs(
        pairs.select("id_a", "id_b"),
        nodes=corpus.select(F.col("doc_id").alias("node")),
    ).orderBy("node")


# Planted-exact-duplicate corpus + the fingerprint-equal pair list both the
# LSH queries must recover. Identical normalized text => identical MinHash
# signature / SimHash fingerprint, so a correct implementation catches every
# such pair structurally (recall 1 on exact dups); the verification join
# then removes any near-dup candidates, making the result oracle-equal.
_SQL_DUP_PAIRS = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
    ),
    fp AS (SELECT doc_id, md5({_NORM.format(c="text")}) AS f FROM corpus)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
"""


def _planted_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )


@register(
    "minhash_lsh_exact_recall",
    oracle=_SQL_DUP_PAIRS,
    tags=("dedup-minhash", "lsh", "scale-path"),
    doc="MinHash-LSH banding over a corpus with planted exact duplicates: "
    "candidate pairs (band-hash equi-join — the 100 TB dedup path) verified "
    "by fingerprint equality must equal the full fingerprint-equal pair "
    "set, proving banding loses no identical pair and signatures are "
    "content-determined.",
)
def minhash_lsh_exact_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_dup_corpus(spark, sf_dir)
    cand = minhash_lsh_pairs(corpus)
    fp = add_fingerprint(corpus).select("doc_id", "fingerprint")
    verified = (
        cand.join(fp.select(F.col("doc_id").alias("id_a"), F.col("fingerprint").alias("f_a")), "id_a")
        .join(fp.select(F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("f_b")), "id_b")
        .filter(F.col("f_a") == F.col("f_b"))
    )
    return verified.select("id_a", "id_b").orderBy("id_a", "id_b")


@register(
    "simhash_dup_pairs",
    oracle=_SQL_DUP_PAIRS,
    tags=("dedup-simhash", "scale-path"),
    doc="SimHash + pigeonhole 16-bit chunk blocking over planted exact "
    "duplicates: Hamming<=3 pairs verified by fingerprint equality must "
    "equal the fingerprint-equal pair set (identical text => identical "
    "64-bit SimHash => caught by every chunk).",
)
def simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_dup_corpus(spark, sf_dir)
    pairs = simhash_pairs(corpus, max_hamming=3)
    fp = add_fingerprint(corpus).select("doc_id", "fingerprint")
    verified = (
        pairs.join(fp.select(F.col("doc_id").alias("id_a"), F.col("fingerprint").alias("f_a")), "id_a")
        .join(fp.select(F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("f_b")), "id_b")
        .filter(F.col("f_a") == F.col("f_b"))
    )
    return verified.select("id_a", "id_b").orderBy("id_a", "id_b")


@register(
    "doc_language_id",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             list_distinct(string_split({_NORM.format(c="text")}, ' ')) AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id,
        len(list_intersect(toks, ['the','and','of','to','is','with'])) AS h_en,
        len(list_intersect(toks, ['der','die','und','ist','nicht','das'])) AS h_de,
        len(list_intersect(toks, ['le','la','et','est','les','des'])) AS h_fr,
        len(list_intersect(toks, ['el','la','que','de','los','es'])) AS h_es,
        len(list_intersect(toks, ['a','je','se','na','to','pro'])) AS h_cs
      FROM norm
    )
    SELECT doc_id,
      CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_cs) = 0 THEN 'und'
           WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de AND h_fr >= h_cs THEN 'fr'
           WHEN h_es >= h_en AND h_es >= h_de AND h_es >= h_cs THEN 'es'
           WHEN h_en >= h_de AND h_en >= h_cs THEN 'en'
           WHEN h_de >= h_cs THEN 'de'
           ELSE 'cs' END AS pred_lang
    FROM hits
    ORDER BY doc_id
    """,
    tags=("lang-id", "text-analysis"),
    doc="Stopword-marker language ID (argmax of marker hits, deterministic "
    "tie-break) — the n-gram heuristic shape, zero UDFs.",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", language_id("text").alias("pred_lang")
    ).orderBy("doc_id")


@register(
    "doc_nb_lang_classify",
    oracle=f"""
    WITH train AS (
      SELECT lang, {_NORM.format(c="text")} AS ntext
      FROM documents WHERE doc_id % 2 = 0
    ),
    test AS (
      SELECT doc_id, {_NORM.format(c="text")} AS ntext
      FROM documents WHERE doc_id % 2 = 1
    ),
    tgb AS (
      SELECT lang, ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 AS b
      FROM (SELECT lang, unnest(string_split(ntext, ' ')) AS g FROM train)
      WHERE g <> ''
    ),
    grid AS (
      SELECT l.lang, r.b
      FROM (SELECT DISTINCT lang FROM train) l
      CROSS JOIN (SELECT unnest(range(512)) AS b) r
    ),
    counts AS (SELECT lang, b, count(*) AS c FROM tgb GROUP BY 1, 2),
    dense AS (
      SELECT g.lang, g.b, coalesce(c.c, 0) AS c
      FROM grid g LEFT JOIN counts c ON g.lang = c.lang AND g.b = c.b
    ),
    tots AS (SELECT lang, sum(c) AS t FROM dense GROUP BY 1),
    model AS (
      SELECT d.lang, d.b, ln((d.c + 1.0) / (t.t + 512.0)) AS lp
      FROM dense d JOIN tots t ON d.lang = t.lang
    ),
    priors AS (
      SELECT lang,
             ln(count(*)::DOUBLE / (SELECT count(*) FROM train)) AS prior
      FROM train GROUP BY lang
    ),
    db AS (
      SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 AS b,
             count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(ntext, ' ')) AS g FROM test)
      WHERE g <> ''
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT db.doc_id, m.lang,
             round(sum(db.c * m.lp) + p.prior, 6) AS nb_score
      FROM db
      JOIN model m ON db.b = m.b
      JOIN priors p ON m.lang = p.lang
      GROUP BY db.doc_id, m.lang, p.prior
    )
    SELECT doc_id, lang AS pred_label, nb_score
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY nb_score DESC, lang
    ) = 1
    ORDER BY doc_id
    """,
    tags=("lang-id", "classifier", "pipeline", "new-surface"),
    priority=18,
    doc="Supervised Naive Bayes language classifier over hashed unigrams "
    "(operators/textual.py::nb_train_classify): trained on the even-id "
    "half (labels = lang), scoring the odd-id half — the fastText-style "
    "closed-form linear filter real pretraining stacks run for "
    "language/quality/domain gating, with NO iterative fitting (one "
    "aggregate per distribution, |L| x 512-row model broadcast). The "
    "oracle replays training AND inference in SQL (shared md5-bucket "
    "idiom); scores round to 6 before the argmax so the comparison is "
    "engine-stable. Accuracy vs the true lang label is pinned in "
    "test_textual.py, not here — the gate checks the MATH.",
)
def doc_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.textual import nb_train_classify

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    return nb_train_classify(train, test, "lang").orderBy("doc_id")


@register(
    "doc_length_quantiles",
    oracle="""
    SELECT source,
           quantile_cont(n_chars, 0.5) AS q50,
           quantile_cont(n_chars, 0.9) AS q90,
           quantile_cont(n_chars, 0.99) AS q99,
           count(*) AS n_docs
    FROM documents
    GROUP BY source ORDER BY source
    """,
    tags=("quantiles", "text-analysis", "new-surface"),
    doc="Exact per-group length quantiles (corpus length-distribution "
    "audit): Spark's interpolating percentile == DuckDB quantile_cont "
    "value-for-value; one percentile pass, scalar columns out. At 100 TB "
    "swap for percentile_approx (same call shape, bounded memory) — kept "
    "exact here for the oracle gate.",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))").alias("q"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "source",
            F.col("q")[0].alias("q50"),
            F.col("q")[1].alias("q90"),
            F.col("q")[2].alias("q99"),
            "n_docs",
        )
        .orderBy("source")
    )


@register(
    "doc_vocab_approx",
    oracle=None,  # HLL estimates are impl-defined; rows-only
    tags=("approx", "new-surface"),
    doc="Approximate distinct vocabulary per language via HyperLogLog++ "
    "(approx_count_distinct over exploded tokens) — constant-memory "
    "cardinality at any corpus size; exactness asserted within rsd in "
    "tests.",
)
def doc_vocab_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    docs = load_table(spark, sf_dir, "documents")
    toks = explode_notnull(
        docs, F.split(normalize_text("text"), " "), "tok", keep=("lang",)
    )
    return (
        toks.groupBy("lang")
        .agg(F.approx_count_distinct("tok", 0.01).alias("approx_vocab"))
        .orderBy("lang")
    )


@register(
    "doc_vocab_exact",
    oracle=f"""
    SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS vocab
    FROM (
      SELECT lang,
             unnest(string_split({_NORM.format(c="text")}, ' ')) AS tok
      FROM documents
    )
    GROUP BY lang ORDER BY lang
    """,
    tags=("distinct", "text-analysis", "new-surface"),
    doc="Exact distinct vocabulary per language (oracle-checkable twin of "
    "doc_vocab_approx): explode normalized tokens, count(distinct) — "
    "partial aggregation keeps the shuffle to distinct tokens per "
    "partition. At corpus scale prefer the HLL twin (constant memory).",
)
def doc_vocab_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    docs = load_table(spark, sf_dir, "documents")
    toks = explode_notnull(
        docs, F.split(normalize_text("text"), " "), "tok", keep=("lang",)
    )
    return (
        toks.groupBy("lang")
        .agg(F.count_distinct("tok").alias("vocab"))
        .orderBy("lang")
    )


@register(
    "docs_by_source_stats",
    oracle="""
    SELECT source, lang, count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
    tags=("A7", "agg"),
    doc="Min/max/avg aggregate per group (period date-range idiom, "
    "tisk_models.py:119-131).",
)
def docs_by_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source", "lang")
    )


@register(
    "doc_html_strip_roundtrip",
    # The oracle states the EXPECTED text independently of the stripper's
    # implementation: wrapping a document in known markup and stripping it
    # must give back the whitespace-collapsed document plus the decoded
    # entity suffix. No DuckDB re-implementation of the regex chain — a
    # stripper bug cannot cancel out of both sides.
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(text || ' & konec <EOF>', '\s+', ' ', 'g'))
             AS clean
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F14", "html", "text-analysis"),
    doc="HTML-to-text round-trip (SURVEY F14, scraper text extraction "
    "steno_scraper.py:93): wrap each document in tags + comment + script "
    "block + encoded entities, strip with the built-in regexp chain, "
    "expect the original text back with entities decoded.",
    priority=18,
)
def doc_html_strip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Escape the payload the way a real HTML producer would (& first, then
    # <): the round-trip then restores the ORIGINAL text for ANY document
    # content — without this, a regenerated corpus containing a literal
    # "<...>" span or "&amp;" would strip/decode it and diverge from the
    # oracle, which states the expected text directly.
    escaped = F.replace(
        F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
        F.lit("<"),
        F.lit("&lt;"),
    )
    wrapped = F.concat(
        F.lit('<div class="doc">'),
        escaped,
        F.lit("</div><!-- interní poznámka --><script>if (a < b) x();</script>"
              " &amp; konec &lt;EOF&gt;"),
    )
    return docs.select(
        "doc_id", strip_html(wrapped).alias("clean")
    ).orderBy("doc_id")


@register(
    "doc_gopher_flags",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split({_NORM.format(c="text")}, ' '),
                         w -> length(w) > 0) AS words,
             list_filter(string_split(text, chr(10)),
                         ln -> length(trim(ln)) > 0) AS lines
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(words) AS n_words,
             greatest(len(words), 1) AS nz,
             greatest(len(lines), 1) AS n_lines,
             list_sum(list_transform(words, w -> length(w)))::DOUBLE
               / greatest(len(words), 1) AS mean_wl,
             (len(string_split(text, '#')) - 1)
               + (len(string_split(text, '...')) - 1) AS n_symbols,
             len(list_filter(lines,
                 ln -> regexp_matches(trim(ln), '^([-*•])'))) AS bullet_lines,
             len(list_filter(lines,
                 ln -> regexp_matches(trim(ln), '(\\.\\.\\.|…)$'))) AS ell_lines,
             len(list_filter(words,
                 w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
             len(list_intersect(list_distinct(words),
                 ['the','be','is','to','of','and','that','have','with']))
               AS stop_hits
      FROM base
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS gopher_n_words,
           (n_words >= 50 AND n_words <= 100000)      AS ok_word_count,
           (mean_wl >= 3 AND mean_wl <= 10)           AS ok_mean_word_len,
           (n_symbols::DOUBLE / nz <= 0.1)            AS ok_symbol_ratio,
           (bullet_lines::DOUBLE / n_lines < 0.9)     AS ok_bullet_lines,
           (ell_lines::DOUBLE / n_lines < 0.3)        AS ok_ellipsis_lines,
           (alpha_words::DOUBLE / nz >= 0.8)          AS ok_alpha_words,
           (stop_hits >= 2)                           AS ok_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (mean_wl >= 3 AND mean_wl <= 10)
            AND (n_symbols::DOUBLE / nz <= 0.1)
            AND (bullet_lines::DOUBLE / n_lines < 0.9)
            AND (ell_lines::DOUBLE / n_lines < 0.3)
            AND (alpha_words::DOUBLE / nz >= 0.8)
            AND (stop_hits >= 2))                     AS keep_gopher
    FROM m
    ORDER BY doc_id
    """,
    tags=("pipeline", "quality", "gopher", "new-surface"),
    priority=18,
    doc="The Gopher document-quality rule set (Rae et al. 2021, "
    "arXiv:2112.11446 Table A1; reused by MassiveText/RefinedWeb/Dolma) "
    "as named per-rule flags + the keep conjunction "
    "(operators/textual.py::gopher_quality_flags): word-count bounds, "
    "mean word length, #/ellipsis symbol ratio, bullet/ellipsis line "
    "fractions, alphabetic-word fraction, stopword presence — the "
    "audit-ready data-card columns, all codegen'd over ONE scan, no "
    "shuffle.",
)
def doc_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.textual import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = gopher_quality_flags(docs)
    return out.select(
        "doc_id",
        F.col("gopher_n_words").cast("int").alias("gopher_n_words"),
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_bullet_lines",
        "ok_ellipsis_lines",
        "ok_alpha_words",
        "ok_stopwords",
        "keep_gopher",
    ).orderBy("doc_id")


@register(
    "near_dup_containment",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             )) AS shingle
      FROM norm
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.intersection,
           sa.set_size AS size_a, sb.set_size AS size_b,
           round(i.intersection / sa.set_size, 6) AS containment_a,
           round(i.intersection / sb.set_size, 6) AS containment_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE greatest(i.intersection / sa.set_size,
                   i.intersection / sb.set_size) >= 0.9
    ORDER BY id_a, id_b
    """,
    tags=("dedup-near", "containment", "new-surface"),
    priority=18,
    doc="Exact n-gram containment pairs (operators/dedup.py::"
    "ngram_containment_pairs) over the same planted-prefix corpus as "
    "near_dup_jaccard: the half-length copies score ~1.0 containment in "
    "their sources while their Jaccard sits near 0.5 — the near-SUPERSET "
    "detector (quotes, excerpts, boilerplate-wrapped reposts, eval "
    "snippets hiding inside long pages) that resemblance misses by "
    "construction. Same shingle-hash candidate machinery: pairs only "
    "meet via shared shingles, threshold applied to the raw ratio.",
)
def near_dup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    halved = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(n_chars / 2) AS INT))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(halved)
    return ngram_containment_pairs(corpus, n=3, threshold=0.9).orderBy(
        "id_a", "id_b"
    )
