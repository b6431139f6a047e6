"""Training-data preparation operators: deduplication, similarity search,
text analysis, multimodal column plumbing.

These extend the telemetry-pipeline operator set (SURVEY.md §2) with the
operations a large-scale training-data pipeline needs over `documents`
(doc_id, text, lang, source, n_chars) and `embeddings`
(vec_id, embedding: array<float>, label) tables.

Design rules (same as the rest of the engine):
- JVM-side column expressions everywhere (higher-order functions
  transform/aggregate/zip_with); pandas UDFs only for genuinely
  non-expressible work (multimodal decode).
- Deterministic hashes (md5-derived 32-bit) so every operator has a
  DuckDB-expressible oracle.
- Pair-generating operators are LSH/band/bucket-gated so candidate
  generation is a key-equality shuffle join, never an all-pairs product.
"""
