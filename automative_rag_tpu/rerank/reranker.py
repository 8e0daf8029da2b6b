"""Late-interaction (ColBERT-style) hybrid reranker.

Functional parity with the reference's ``ColBERTReranker``
(``src/core/query/llm/rerankers.py``): MaxSim late-interaction scoring,
optional hybrid combine with a second scorer at weights 0.8/0.2 after
per-candidate-set min-max normalization (:267-349), token-level match
explanations (:387-561), and multi-query rerank sharing document encodings
(:563-662).

The TPU difference: the per-document Python scoring loop is replaced by the
fused MaxSim kernel (``ops/maxsim.py``) scoring all candidates for all
queries in one launch, and the second scorer is pluggable (the reference
hard-codes a torch CrossEncoder).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..documents.schema import Document
from ..models.colbert import ColBERTEncoder
from ..ops.maxsim import maxsim_argmax_ref, maxsim_scores, min_max_normalize

# second-stage scorer signature: (query, [texts]) -> np.ndarray of scores
SecondScorer = Callable[[str, Sequence[str]], np.ndarray]


class LateInteractionReranker:
    def __init__(
        self,
        encoder: ColBERTEncoder,
        colbert_weight: float = 0.8,
        second_weight: float = 0.2,
        second_scorer: Optional[SecondScorer] = None,
        use_pallas: Optional[bool] = None,
        block_docs: int = 128,
    ):
        self.encoder = encoder
        self.colbert_weight = colbert_weight
        self.second_weight = second_weight
        self.second_scorer = second_scorer
        self.use_pallas = use_pallas
        self.block_docs = block_docs
        self.last_timings: dict = {}

    # ------------------------------------------------------------- scoring
    def maxsim_scores_batch(
        self,
        queries: Sequence[str],
        documents: Sequence[Document],
    ) -> np.ndarray:
        """Raw MaxSim scores [n_queries, n_docs]; doc encodings shared across
        queries (reference batch path, rerankers.py:563-662)."""
        t0 = time.perf_counter()
        q_emb, q_mask = self.encoder.encode_queries(list(queries))
        t1 = time.perf_counter()
        d_emb, d_mask = self.encoder.encode_documents([d.page_content for d in documents])
        # token-major relayout at encode time so scoring pays no transpose
        d_emb_t = np.ascontiguousarray(d_emb.transpose(1, 0, 2))
        t2 = time.perf_counter()
        scores = np.asarray(
            maxsim_scores(
                jnp.asarray(q_emb),
                jnp.asarray(q_mask),
                jnp.asarray(d_emb_t),
                jnp.asarray(d_mask),
                block_docs=self.block_docs,
                use_pallas=self.use_pallas,
                token_major=True,
            )
        )
        t3 = time.perf_counter()
        self.last_timings = {
            "encode_query_s": t1 - t0,
            "encode_docs_s": t2 - t1,
            "maxsim_s": t3 - t2,
        }
        return scores

    def maxsim_scores_from_store(
        self,
        queries: Sequence[str],
        rows: Sequence[int],
        store,
    ) -> np.ndarray:
        """MaxSim scores [n_queries, n_rows] against stored token embeddings
        (no document forward passes — see token_store.py). Mesh-sharded
        stores (parallel/sharded_rerank.py) score in place on the mesh via
        ``store.maxsim``; single-device stores gather the candidate slab and
        run the fused kernel."""
        t0 = time.perf_counter()
        q_emb, q_mask = self.encoder.encode_queries(list(queries))
        t1 = time.perf_counter()
        if hasattr(store, "maxsim"):
            scores = np.asarray(store.maxsim(q_emb, q_mask, rows))
            self.last_timings = {
                "encode_query_s": t1 - t0,
                "maxsim_s": time.perf_counter() - t1,
                "sharded": True,
            }
            return scores
        if hasattr(store, "maxsim_fused"):
            # gather + kernel in ONE dispatch when the store is
            # device-resident (r05 item 3: each eager hop is a ~26 ms
            # relay round trip)
            fused = store.maxsim_fused(q_emb, q_mask, rows)
            if fused is not None:
                scores = np.asarray(fused)
                self.last_timings = {
                    "encode_query_s": t1 - t0,
                    "maxsim_s": time.perf_counter() - t1,
                    "fused_gather": True,
                }
                return scores
        if hasattr(store, "gather_for_maxsim"):
            # int8 stores stay int8 all the way into the kernel (half the
            # gather write + half the kernel read); others dequantize
            docs_t, d_scales, d_mask = store.gather_for_maxsim(rows)
        else:
            docs_t, d_mask = store.gather(rows)
            d_scales = None
        t2 = time.perf_counter()
        scores = np.asarray(
            maxsim_scores(
                jnp.asarray(q_emb),
                jnp.asarray(q_mask),
                docs_t,
                d_mask,
                block_docs=self.block_docs,
                use_pallas=self.use_pallas,
                token_major=True,
                d_scales=d_scales,
            )
        )
        t3 = time.perf_counter()
        self.last_timings = {
            "encode_query_s": t1 - t0,
            "gather_s": t2 - t1,
            "maxsim_s": t3 - t2,
        }
        return scores

    def rerank_rows_batch(
        self,
        queries: Sequence[str],
        docs_per_query: Sequence[Sequence[Document]],
        rows_per_query: Sequence[Sequence[int]],
        store,
        top_k: Optional[int] = None,
    ) -> List[List[Tuple[Document, float]]]:
        """Batched rerank-from-store with per-query candidate sets in ONE
        MaxSim launch (VERDICT r1 weak #2: the old path looped rerank_rows
        per query, paying a kernel launch + cross-encoder forward each).

        The per-query row sets are unioned: the kernel streams each distinct
        candidate's token slab once and scores it against every query —
        identical HBM traffic to per-query gathers (the union's total bytes
        bound both), one launch instead of B. Scores for rows a query didn't
        retrieve are computed but discarded (MXU pairs are cheap; the kernel
        is bandwidth-bound). The second scorer runs as one batched pass over
        all real (query, doc) pairs; min-max normalization stays PER QUERY
        (reference per-candidate-set semantics, rerankers.py:302-333)."""
        if not any(len(d) for d in docs_per_query):
            return [[] for _ in queries]
        union = sorted({int(r) for rows in rows_per_query for r in rows})
        pos_of = {r: i for i, r in enumerate(union)}
        scores = self.maxsim_scores_from_store(list(queries), union, store)

        second_rows: Optional[List[np.ndarray]] = None
        if self.second_scorer is not None:
            second_rows = self._second_scores_batch(queries, docs_per_query)

        out: List[List[Tuple[Document, float]]] = []
        for b, (docs, rows) in enumerate(zip(docs_per_query, rows_per_query)):
            if not docs:
                out.append([])
                continue
            maxsim = scores[b, [pos_of[int(r)] for r in rows]]
            if second_rows is None:
                combined = maxsim
            else:
                combined = (
                    self.colbert_weight * min_max_normalize(maxsim)
                    + self.second_weight * min_max_normalize(second_rows[b])
                )
            ranked = sorted(zip(docs, combined.tolist()), key=lambda p: p[1], reverse=True)
            out.append(ranked[:top_k] if top_k is not None else ranked)
        return out

    def _second_scores_batch(
        self, queries: Sequence[str], docs_per_query: Sequence[Sequence[Document]]
    ) -> List[np.ndarray]:
        """Second-stage scores per query, computed in one batched forward
        when the scorer supports pair scoring (CrossEncoderScorer does)."""
        score_pairs = getattr(self.second_scorer, "score_pairs", None)
        if score_pairs is None:
            return [
                np.asarray(self.second_scorer(q, [d.page_content for d in docs]))
                if docs else np.zeros(0)
                for q, docs in zip(queries, docs_per_query)
            ]
        pairs = [
            (q, d.page_content)
            for q, docs in zip(queries, docs_per_query)
            for d in docs
        ]
        flat = np.asarray(score_pairs(pairs))
        out, cursor = [], 0
        for docs in docs_per_query:
            out.append(flat[cursor : cursor + len(docs)])
            cursor += len(docs)
        return out

    def rerank_rows(
        self,
        query: str,
        documents: Sequence[Document],
        rows: Sequence[int],
        store,
        top_k: Optional[int] = None,
    ) -> List[Tuple[Document, float]]:
        """rerank() over stored token embeddings; same hybrid combine."""
        if not documents:
            return []
        maxsim = self.maxsim_scores_from_store([query], rows, store)[0]
        if self.second_scorer is None:
            ranked = sorted(zip(documents, maxsim.tolist()), key=lambda p: p[1], reverse=True)
            return ranked[:top_k] if top_k is not None else ranked
        colbert_norm = min_max_normalize(maxsim)
        second = np.asarray(self.second_scorer(query, [d.page_content for d in documents]))
        combined = self.colbert_weight * colbert_norm + self.second_weight * min_max_normalize(second)
        ranked = sorted(zip(documents, combined.tolist()), key=lambda p: p[1], reverse=True)
        return ranked[:top_k] if top_k is not None else ranked

    # -------------------------------------------------------------- rerank
    def rerank(
        self,
        query: str,
        documents: Sequence[Document],
        top_k: Optional[int] = None,
    ) -> List[Tuple[Document, float]]:
        """Hybrid rerank: MaxSim scores, optionally combined with the second
        scorer at (colbert_weight, second_weight) after per-set min-max
        normalization — exact reference combine semantics."""
        if not documents:
            return []
        maxsim = self.maxsim_scores_batch([query], documents)[0]

        if self.second_scorer is None:
            ranked = sorted(zip(documents, maxsim.tolist()), key=lambda p: p[1], reverse=True)
            return ranked[:top_k] if top_k is not None else ranked

        colbert_norm = min_max_normalize(maxsim)
        second = np.asarray(self.second_scorer(query, [d.page_content for d in documents]))
        second_norm = min_max_normalize(second)
        combined = self.colbert_weight * colbert_norm + self.second_weight * second_norm
        ranked = sorted(zip(documents, combined.tolist()), key=lambda p: p[1], reverse=True)
        return ranked[:top_k] if top_k is not None else ranked

    def rerank_batch(
        self,
        queries: Sequence[str],
        documents: Sequence[Document],
        top_k: Optional[int] = None,
    ) -> List[List[Tuple[Document, float]]]:
        """Rerank several queries against one candidate set with shared doc
        encodings; MaxSim-only scores (the reference batch path also skips
        the cross-encoder)."""
        if not documents:
            return [[] for _ in queries]
        scores = self.maxsim_scores_batch(queries, documents)
        out = []
        for row in scores:
            ranked = sorted(zip(documents, row.tolist()), key=lambda p: p[1], reverse=True)
            out.append(ranked[:top_k] if top_k is not None else ranked)
        return out

    # -------------------------------------------------------- explanations
    def explain(
        self,
        query: str,
        document: Document,
        top_matches: int = 5,
    ) -> dict:
        """Token-level match explanation: for each content query token, the
        best-matching doc token and similarity (reference rerankers.py:387-561)."""
        q_emb, q_mask = self.encoder.encode_queries([query])
        d_emb, d_mask = self.encoder.encode_documents([document.page_content])
        best_idx, best_sim = maxsim_argmax_ref(
            jnp.asarray(q_emb[0]), jnp.asarray(q_mask[0]),
            jnp.asarray(d_emb[0]), jnp.asarray(d_mask[0]),
        )
        best_idx, best_sim = np.asarray(best_idx), np.asarray(best_sim)

        q_tokens = self.encoder.tokenize_for_display(query, self.encoder.max_query_length)
        d_tokens = self.encoder.tokenize_for_display(
            document.page_content, self.encoder.max_doc_length
        )
        matches = []
        for pos in np.nonzero(q_mask[0])[0]:
            matches.append(
                {
                    "query_token": q_tokens[pos] if pos < len(q_tokens) else "?",
                    "doc_token": (
                        d_tokens[best_idx[pos]] if best_idx[pos] < len(d_tokens) else "?"
                    ),
                    "similarity": float(best_sim[pos]),
                }
            )
        matches.sort(key=lambda m: m["similarity"], reverse=True)
        return {
            "total_score": float(best_sim.sum()),
            "matches": matches[:top_matches],
            "query_content_tokens": int(q_mask[0].sum()),
        }
