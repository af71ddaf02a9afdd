"""mc_ns_data_pipeline_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full capability surface of the reference pipeline
(North-East-Scientific/mc-ns-data-pipeline, surveyed in SURVEY.md) as an
idiomatic Spark DataFrame / SQL / Structured-Streaming engine, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
    session     SparkSession factory with scale-aware defaults
    catalog     testdata/table loading + temp-view registration
    functions   scalar expression library (F1-F14 of SURVEY.md §2.7) + text/vector/hash helpers
    operators   relational operator surface (projections, joins, aggregations,
                dedup, similarity, windows, multimodal)
    sources     connectors (paginated REST, csv/json contract readers, state readers)
    sinks       writers (partitioned files, upsert/replace, audit, reports)
    plans       the declared query suite Q1-Q14 + extensions, with DuckDB oracles
    streaming   incremental pipeline (6h tumbling windows, watermark, per-key replace)
"""

__version__ = "0.1.0"
