"""blockchain_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagination of jsvisa/blockchain-etl's block-range
extract-flatten-enrich-upsert pipeline (reference at /root/reference) as a
change-log tail applying insert/update/delete/rollback events to a
snapshot-versioned lake table of pre-tokenized training sequences.

Architecture (Spark-first, not a port):

- ``tables/``     snapshot-versioned parquet table with atomic manifest
                  commits, hash-bucket partitioning, copy-on-write MERGE
                  with bucket-level file pruning, and time travel
                  (the role Iceberg plays in the north star; no Iceberg
                  jars ship in this image so the commit protocol is
                  implemented directly — same semantics, ~600 LoC).
- ``cdc/``        event schema, deterministic generator, the batch apply
                  path (validate → reorg → dedup → LSN-guarded merge),
                  a declarative full-replay, and a pure-Python oracle.
- ``streaming/``  the micro-batch tail loop (epoch store + checkpointing
                  via the table's commit ledger) and a Structured
                  Streaming wrapper.
- ``functions/``  column-expression helpers (item ids, hex decode,
                  tokenization, text quality, vector math) — JVM-side
                  built-ins wherever possible, Arrow/pandas UDFs only
                  where semantics demand.
- ``operators/``  the reference's operator surface (enrich joins,
                  incremental aggregates, windows, checkers) plus
                  training-data ops (dedup families, ANN similarity,
                  multimodal plumbing) re-expressed as DataFrame plans.
"""

__version__ = "0.1.0"
