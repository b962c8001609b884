"""datalake_worker_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference data-lake worker (goshawk-3/datalake-worker, Rust: see
/root/reference/src/lib.rs, data_manager.rs, rocksdb_storage_engine.rs)
plus a full relational / streaming / LLM-data-pipeline operator surface
designed for 100 TB scale:

- ``catalog``      — chunk metadata catalog (register/find/list/delete/vacuum,
                     leases) mirroring the reference's DataManager+StorageEngine
                     semantics on top of Parquet metadata tables.
- ``session``      — SparkSession factory (AQE, Arrow, UTC).
- ``canonical``    — deterministic canonicalization + hashing for oracle
                     differential tests.
- ``operators/``   — relational batch operators (joins incl. as-of, windows,
                     aggregates, set ops, top-k).
- ``functions/``   — LLM-pipeline ops: dedup (exact/MinHash/SimHash/Jaccard),
                     similarity search, text analysis, multimodal columns.
- ``sources/``     — readers/writers (parquet/csv/json/in-memory).
- ``streaming/``   — Structured Streaming ops (windows, watermark, dedup,
                     stream-static join, foreachBatch ingest).
- ``registry``     — the declared query surface: every operator exposed as a
                     named (spark_fn, oracle_sql) pair; this is the
                     correctness contract checked against DuckDB.
"""

__version__ = "0.1.0"
