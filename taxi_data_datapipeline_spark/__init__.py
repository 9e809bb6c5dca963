"""taxi_data_datapipeline_spark — a PySpark-native analytics engine.

Brand-new implementation of the query and data-processing capabilities of
``sharvaanit/Taxi-data-datapipeline`` (a single-node pandas/pyarrow pivot ETL
over NYC TLC taxi parquet), re-expressed Spark-first:

* the reference's hand-rolled batch loop / partial-aggregate / combine stages
  collapse into single declarative DataFrame plans (one shuffle, Catalyst
  partial+final HashAggregate),
* its manual column pruning / early filters are left to Catalyst,
* its process-pool parallelism is Spark task scheduling,
* its empirical partition-size optimizer is ``spark.sql.files.maxPartitionBytes``
  + AQE.

Beyond reference parity the package adds the standard relational surface the
reference lacks (joins, windows, set ops, grouping sets, top-k) and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Layout:
    sources/    parquet discovery, path metadata, fuzzy schema detection, ingest
    functions/  scalar Column helpers (datetime coercion, place keys, text, vectors)
    operators/  composable DataFrame->DataFrame operators (pivot, joins, dedup, ...)
    plans/      end-to-end pipeline runners + metrics/report
    streaming/  Structured Streaming variants
"""

__version__ = "0.1.0"
