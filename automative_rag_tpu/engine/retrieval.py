"""The TPU retrieval engine: encode → ANN top-k → bitmask filter → MaxSim
rerank → token-budget trim.

This is the pipeline the reference *intended* but never wired (SURVEY.md §0:
the ColBERT reranker was preloaded yet absent from the live retrieval path,
``src/core/query/tasks/retrieval_tasks.py:75-140`` did plain vector search
only). Here rerank is a first-class stage:

    query ──► DenseEmbedder ──► index.search(retrieval_k, filter bitmask)
          ──► LateInteractionReranker.rerank(final_k)
          ──► mode-aware token-budget trim ──► (doc, score) list

Depths and cutoffs come from the per-mode table (``config.mode_config``).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..config.mode_config import QueryMode, mode_config, trim_documents_by_tokens
from ..documents.schema import Document
from ..models.bge_m3 import DenseEmbedder
from ..rerank.reranker import LateInteractionReranker


class RetrievalEngine:
    def __init__(
        self,
        embedder: DenseEmbedder,
        index,
        reranker: Optional[LateInteractionReranker] = None,
        token_store=None,
    ):
        self.embedder = embedder
        self.index = index
        self.reranker = reranker
        self.token_store = token_store
        self.last_timings: Dict[str, float] = {}

    # ------------------------------------------------------------ ingest
    def add_documents(self, documents: List[Document]) -> List[str]:
        texts = [d.page_content for d in documents]
        vectors = self.embedder.embed_texts(texts)
        ids = self.index.add(vectors, documents)
        if self.token_store is not None and self.reranker is not None:
            # token embeddings row-aligned with the index (rerank-from-store)
            token_embs, masks = self.reranker.encoder.encode_documents(texts)
            self.token_store.append(token_embs, masks)
        return ids

    # ----------------------------------------------------------- retrieve
    def retrieve(
        self,
        query: str,
        mode: QueryMode | str = QueryMode.FACTS,
        metadata_filter: Optional[Dict[str, Any]] = None,
        retrieval_k: Optional[int] = None,
        final_k: Optional[int] = None,
        rerank: bool = True,
    ) -> List[Tuple[Document, float]]:
        """Full retrieval pipeline; returns (doc, score) sorted descending.

        Scores are cosine similarities when rerank is off, hybrid/MaxSim
        scores when on (reference contract: tests/test_retrieval.py:191-327
        — retrieve → rerank on/off → format)."""
        mode = QueryMode.parse(mode)
        params = mode_config.get_retrieval_params(mode)
        k1 = retrieval_k or params["retrieval_k"]
        k2 = final_k or params["final_k"]

        t0 = time.perf_counter()
        qvec = self.embedder.embed_query(query)
        t1 = time.perf_counter()
        hits = self.index.search(np.asarray(qvec), k1, metadata_filter)[0]
        t2 = time.perf_counter()

        candidates = [h.document for h in hits]
        if rerank and self.reranker is not None and candidates:
            rows = [h.row for h in hits]
            if self.token_store is not None and max(rows) < self.token_store.rows:
                ranked = self.reranker.rerank_rows(
                    query, candidates, rows, self.token_store, top_k=k2
                )
            else:
                ranked = self.reranker.rerank(query, candidates, top_k=k2)
            # MaxSim/hybrid scores are unbounded; normalize to [0,1] for the
            # relevance cutoffs that assume cosine-like scores
            if ranked:
                scores = np.array([s for _, s in ranked], np.float64)
                lo, hi = scores.min(), scores.max()
                if hi > lo:
                    norm = 0.2 + 0.8 * (scores - lo) / (hi - lo)
                else:
                    norm = np.ones_like(scores)
                ranked = [(doc, float(n)) for (doc, _), n in zip(ranked, norm)]
        else:
            ranked = [(h.document, h.score) for h in hits[:k2]]
        t3 = time.perf_counter()

        trimmed = trim_documents_by_tokens(ranked, mode)
        self.last_timings = {
            "embed_s": t1 - t0,
            "search_s": t2 - t1,
            "rerank_s": t3 - t2,
            "retrieval_k": k1,
            "final_k": k2,
            "candidates": len(candidates),
        }
        return trimmed

    def retrieve_batch(
        self,
        queries: List[str],
        mode: QueryMode | str = QueryMode.FACTS,
        metadata_filter: Optional[Dict[str, Any]] = None,
        rerank: bool = True,
    ) -> List[List[Tuple[Document, float]]]:
        """Batched retrieval: one encoder forward and one search launch for
        all queries; rerank gathers each query's own candidates from the
        token store. This is the serving-throughput path — per-query cost
        amortizes every matmul over the batch."""
        if not queries:
            return []
        mode = QueryMode.parse(mode)
        params = mode_config.get_retrieval_params(mode)
        k1, k2 = params["retrieval_k"], params["final_k"]

        t0 = time.perf_counter()
        qvecs = self.embedder.embed_texts(queries)
        t1 = time.perf_counter()
        per_query_hits = self.index.search(qvecs, k1, metadata_filter)
        t2 = time.perf_counter()

        out: List[List[Tuple[Document, float]]] = []
        for query, hits in zip(queries, per_query_hits):
            candidates = [h.document for h in hits]
            if rerank and self.reranker is not None and candidates:
                rows = [h.row for h in hits]
                if self.token_store is not None and max(rows) < self.token_store.rows:
                    ranked = self.reranker.rerank_rows(
                        query, candidates, rows, self.token_store, top_k=k2
                    )
                else:
                    ranked = self.reranker.rerank(query, candidates, top_k=k2)
                if ranked:
                    scores = np.array([s for _, s in ranked], np.float64)
                    lo, hi = scores.min(), scores.max()
                    norm = (
                        0.2 + 0.8 * (scores - lo) / (hi - lo)
                        if hi > lo else np.ones_like(scores)
                    )
                    ranked = [(d, float(s)) for (d, _), s in zip(ranked, norm)]
            else:
                ranked = [(h.document, h.score) for h in hits[:k2]]
            out.append(trim_documents_by_tokens(ranked, mode))
        self.last_timings = {
            "embed_s": t1 - t0,
            "search_s": t2 - t1,
            "rerank_s": time.perf_counter() - t2,
            "batch": len(queries),
        }
        return out

    # -------------------------------------------------------------- admin
    def stats(self) -> Dict[str, Any]:
        return {
            "index": self.index.stats(),
            "embedder_dim": self.embedder.dim,
            "embedder_pretrained": getattr(self.embedder, "pretrained", False),
            "reranker": self.reranker is not None,
        }
