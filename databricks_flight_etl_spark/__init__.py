"""flight-etl-engine: a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference (sarbaaz0303/databricks-flight-etl — a Databricks notebook
pipeline over flight data; see /root/repo/SURVEY.md), re-expressed as an
idiomatic, composable PySpark library:

- ``sources``   — schema-declared CSV/JSON/Parquet readers, size-targeted
                  Parquet sink (SURVEY §2.1 S1–S8).
- ``functions`` — scalar derivations, notably the HHMM departure-time
                  decode (SURVEY §2.10 Q7, reference NB:261–291).
- ``operators`` — the data-quality suite (completeness, accuracy,
                  consistency, uniqueness, validity, timeliness; SURVEY
                  §2.10 Q1–Q6), generic relational helpers, and the
                  LLM-data-pipeline extensions (dedup, similarity search,
                  multimodal columns, text analysis; SURVEY §2.11 X1–X5).
- ``plans``     — partition-sizing and plan-inspection utilities
                  (replaces the reference's SizeEstimator probe, NB:416–427).
- ``streaming`` — Structured Streaming variants of the batch operators.

Everything takes and returns ``pyspark.sql.DataFrame`` (lazily planned,
Catalyst-optimized). No custom execution engine, no RDD code paths.
"""

__version__ = "0.1.0"
