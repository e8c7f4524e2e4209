"""Scalar column-function library (pure pyspark.sql.functions compositions).

Everything here returns Column expressions that stay inside whole-stage
codegen — no Python UDFs. UDF-backed document parsers live in operators/.
"""
