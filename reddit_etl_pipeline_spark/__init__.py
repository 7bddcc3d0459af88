"""PySpark-native analytics engine with the query and data-processing
capabilities of dharmateja03/reddit-ETL-Pipeline.

The reference pipeline (Reddit API -> pandas -> CSV -> S3 -> Redshift ->
dbt -> analytics) is re-expressed Spark-first: one lazy Catalyst plan from
source scan to sink, Parquet as the lake format, and the warehouse layer
(COPY / staging / DELETE USING / INSERT) collapsed into declarative
DataFrame operators (tolerant CSV scan, last-write-wins upsert).

Modules
-------
- ``session``   SparkSession builder (UTC, AQE, Arrow)
- ``schema``    canonical 16-column reddit posts schema + varchar widths
- ``sources``   tolerant CSV reader (Redshift COPY parity), reddit fetcher,
                parquet lake
- ``functions`` scalar derivations, text analysis, portable hashing, vectors
- ``operators`` upsert, dedup (exact/minhash/simhash/jaccard), similarity
                search, data quality, multimodal plumbing
- ``plans``     dbt-equivalent model runner, canonical analytics queries,
                daily-batch pipeline driver
- ``streaming`` Structured Streaming ingest of the same schema
"""

__version__ = "0.1.0"
