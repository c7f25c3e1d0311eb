"""example_beam_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``mkuthan/example-beam`` reference
(Apache Beam / Scio streaming playground), re-expressed Spark-first.

Layout
------
- :mod:`example_beam_spark.session`    — SparkSession bootstrap (AQE, UTC, Arrow).
- :mod:`example_beam_spark.schemas`    — fixed StructTypes (the analog of the
  reference's ``windowing/model.scala`` compile-time case classes).
- :mod:`example_beam_spark.sources`    — explicit-schema parquet readers,
  in-memory sources, streaming replay source.
- :mod:`example_beam_spark.operators`  — batch DataFrame operators (CTR
  windowing, enrichment joins, relational surface, dedup, similarity, text).
- :mod:`example_beam_spark.streaming`  — Structured Streaming operators
  (watermarked windows, stateful lookup-cache join, custom merging window).
- :mod:`example_beam_spark.registry`   — query registry binding each operator
  to a DuckDB oracle SQL string for the correctness harness.

Everything is DataFrame/Catalyst-native; Python row-level code exists only in
the genuinely stateful streaming operators (applyInPandasWithState).
"""

__version__ = "0.1.0"
