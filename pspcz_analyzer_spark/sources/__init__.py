"""Data sources and sinks.

    unl      pipe-delimited Windows-1250 headerless reader (the psp.cz
             open-data wire format) with lenient typed casting
    sinks    Parquet write paths: overwrite, partitioned, key-based upsert,
             and the anti-join resume pattern for checkpointed pipelines
"""
