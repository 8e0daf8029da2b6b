"""automative_rag_tpu — a TPU-native retrieval-augmented-generation framework.

A from-scratch rebuild of the capability set of jliang87/Automative-RAG
(bilingual automotive RAG: ingest → embed → hybrid search → rerank → generate,
run as observable job chains behind an HTTP API), with the retrieval core
re-designed TPU-first:

- dense embedding via a JAX/Flax encoder (bge-m3-compatible architecture),
- an in-HBM vector index (flat exact + IVF ANN) searched with masked
  similarity matmuls and ``jax.lax.top_k``,
- metadata payload filters compiled to bitmask predicates over a columnar
  metadata store,
- ColBERT-style late-interaction reranking as a fused MaxSim Pallas kernel,
- corpus sharding across a ``jax.sharding.Mesh`` with per-shard top-k and an
  ICI all-gather merge.

See SURVEY.md for the blueprint and BASELINE.md for performance targets.
"""

__version__ = "0.1.0"
