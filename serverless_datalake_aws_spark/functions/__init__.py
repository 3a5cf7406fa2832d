"""Column-expression function library (all JVM-side builtin compositions).

Everything here returns pyspark Columns built from `pyspark.sql.functions`
so the hot path stays inside whole-stage codegen — no Python UDFs.
"""
