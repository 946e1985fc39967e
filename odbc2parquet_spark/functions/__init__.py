"""Scalar-function helpers built from pyspark.sql.functions (JVM-side)."""
