"""Scalar/column function library (normalization, hashing, phonetics,
similarity, text statistics).  Everything here is either a pure Spark
column expression (JVM-side, whole-stage codegen) or an Arrow-batched
pandas UDF — never per-row Python."""
