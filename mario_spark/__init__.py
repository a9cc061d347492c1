"""mario_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch re-implementation of the capability surface of
MITLibraries/mario (reference at /root/reference, read-only). Mario itself
is an ETL shell (JSON -> Go channel pipeline -> OpenSearch bulk); every
query-side operator (tokenization, inverted index, BM25, top-k) is
delegated to OpenSearch/Lucene via config/es_record_mappings.json. This
package implements BOTH halves natively on Spark:

- Half A (ETL): record schema + JSON source (mario_spark.record), index
  lifecycle/catalog/CLI (mario_spark.index, mario_spark.cli)
- Half B (search engine): analyzers, inverted index build with delta+VByte
  compressed postings and block-max metadata, segment merge, BM25
  block-max-WAND top-k -> mario_spark.analyze/.docs/.postings/.query/
  .wand/.merge

Plus large-scale training-data pipeline operators (dedup, similarity
search, text stats, multimodal plumbing) under mario_spark.ops.

Design notes (100 TB scale):
- Everything is declared with the DataFrame API so Catalyst does predicate
  pushdown / column pruning / partial aggregation / broadcast planning.
- Python appears only in vectorized pandas/Arrow UDFs (tokenize, extract,
  posting codec, WAND scorer) — no row-at-a-time Python UDFs anywhere.
- Postings are hash-bucketed by term (file-level pruning for query terms)
  and doc-sharded for parallel query fan-out; head-term skew is handled by
  salted repartitioning at build and per-shard WAND at query time.
"""

__version__ = "0.1.0"

from mario_spark.session import get_spark  # noqa: F401
