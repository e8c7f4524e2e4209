"""pspcz_analyzer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``tadeasf/pspcz_analyzer`` (a single-node Polars analyzer of Czech
Parliament open data), re-expressed Spark-first:

* all relational semantics become lazy DataFrame plans optimized by Catalyst
  (the reference is eager Polars with hand-coded optimizations — see SURVEY.md §4.1);
* Python dict lookups become broadcast joins;
* NumPy matrix math becomes ``pyspark.ml`` / vectorized column expressions;
* the file-watcher freshness model becomes snapshot re-reads / Structured
  Streaming.

Layout:
    session     SparkSession factory tuned for scale (AQE, Arrow, broadcast)
    schemas     per-table column order + lenient types (UNL has no headers)
    catalog     table registry over Parquet directories
    sources/    UNL (pipe-delimited windows-1250) reader; Parquet sinks
                (overwrite, partitioned, upsert, anti-join resume)
    functions/  scalar column functions (diacritics, tokens, fingerprints)
    operators/  reusable operators (voting analytics, dedup, ANN, fuzzy /
                as-of joins, pagination, sessionization, multimodal,
                document-parser UDTFs, enrichment, parliamentary dims)
    plans/      the query catalog: named queries + DuckDB oracle SQL
    streaming/  Structured Streaming surface over the events table
    serving/    TTL cache + query facade (+ optional FastAPI routes)
"""

__version__ = "0.1.0"
