"""opendataloader_pdf_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new, Spark-first analytics engine with the query and data-processing
capabilities of the reference ``hnc-leebd/opendataloader-pdf`` dataflow
(see SURVEY.md), re-expressed as a distributed engine:

* a binlog/WAL-style change-event tail replayed into an exactly-once lake
  upsert over a table of pre-tokenized training sequences
  ``(doc_id string, tokens array<int>, n_tok int, source string)``;
* dedup by (doc_id, lsn), last-writer-wins windowing, key-partitioned MERGE
  with salt-based skew splitting, additive schema evolution, checkpointed
  resumability and per-partition lineage/metrics;
* the full reference operator inventory (filters, sessionization, window
  adjacency joins, frequency/mode stats, spatial containment joins, reading
  order) as reusable ``f(df) -> df`` transforms;
* large-scale training-data pipeline operators: exact/minhash/simhash
  dedup, ANN similarity search, language-ID, quality scoring, token
  counting, fingerprinting.

Everything is declarative pyspark.sql; Python appears only in vectorized
pandas/Arrow UDFs (never per-row) where DataFrame ops genuinely can't
express the semantics.
"""

__version__ = "0.1.0"
