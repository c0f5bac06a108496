"""delta_data_pipelines_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing semantics of the reference
system ``hossein-khalilian/delta-data-pipelines`` (an Airflow-orchestrated
ETL/ELT stack for real-estate listings) as an idiomatic Spark engine:

- all relational logic as DataFrame / Spark SQL plans (Catalyst optimizes);
- all scalar logic (Persian digits, toman parsing, relative dates, enum
  maps, ...) as native column expressions — no row-at-a-time Python;
- queue / incremental semantics as Structured Streaming micro-batches;
- MongoDB-unique-index / MinIO-version-rotation semantics as a
  parquet-backed versioned table layer with MERGE and time travel;
- plus first-class large-scale training-data operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text analysis, and multimodal column plumbing.

Layout:
    session      SparkSession factory tuned for local[N] + cluster parity
    catalog      loaders for the test star schema (TESTDATA.md)
    functions/   scalar expression library (SURVEY.md §2.6, F1-F37)
    operators/   relational + large-scale operators (SURVEY.md §2, north star)
    storage/     versioned parquet tables, MERGE, watermark state
    queries/     end-to-end query pipelines (search index, TPC-H-ish)
    streaming/   Structured Streaming ingestion pipelines
    ingest/      per-site transformer registry (raw payload → canonical)
"""

__version__ = "0.1.0"
