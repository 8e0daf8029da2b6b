"""One-dispatch fused search stage (engine/fused.py, r05 item 3): the
fused path must return EXACTLY what the per-stage path returns — same
documents, same scores — across dense / entity-expansion / sparse-union
combinations, and must decline ineligible states (filters, tails, table
mode) so the per-stage path stays the source of truth."""

import numpy as np
import pytest

from automative_rag_tpu.documents import Document
from automative_rag_tpu.engine.retrieval import RetrievalEngine
from automative_rag_tpu.index.ivf import IVFIndex
from automative_rag_tpu.index.sparse import SparseIndex
from automative_rag_tpu.models.bge_m3 import DenseEmbedder
from automative_rag_tpu.models.sparse import SparseEncoder


def _mk_engine(n_docs=400, with_sparse=True, probe_mode="budget"):
    dense = DenseEmbedder()
    enc = SparseEncoder(dense, top_terms=24, query_terms=12) \
        if with_sparse else None
    index = IVFIndex(dim=dense.dim, device_dtype="float32", n_lists=16,
                     n_probe=4, probe_mode=probe_mode)
    sparse = SparseIndex(top_terms=24) if with_sparse else None
    eng = RetrievalEngine(
        dense, index, reranker=None,
        sparse_index=sparse, sparse_encoder=enc, sparse_k=5,
    )
    rng = np.random.default_rng(3)
    manus = ["宝马", "奔驰", "奥迪", "比亚迪"]
    models = ["X5", "GLE", "Q7", "汉"]
    docs = []
    for i in range(n_docs):
        m = i % 4
        docs.append(Document(
            page_content=f"{manus[m]}{models[m]} 第{i}版 续航里程为"
                         f"{400 + i}公里，马力{200 + i % 97}匹。",
            metadata={"manufacturer": manus[m], "model": models[m],
                      "year": 2019 + i % 6}))
    eng.add_documents(docs)
    index.rebuild(seed=0)
    return eng, docs


def _pairs(ranked):
    return [(d.id, round(float(s), 5)) for d, s in ranked]


def _score_groups(ranked):
    """Tie-robust comparison form: per distinct (rounded) score, the SET
    of doc ids at that score — kernel tie-break order is unspecified
    across program shapes."""
    groups = {}
    for d, s in ranked:
        groups.setdefault(round(float(s), 5), set()).add(d.id)
    return groups


@pytest.mark.parametrize("with_sparse", [True, False])
def test_fused_matches_per_stage(with_sparse):
    eng, docs = _mk_engine(with_sparse=with_sparse)
    queries = [
        "宝马X5的续航里程是多少",        # entity detected → expansion arm
        "第37版 马力多少匹",             # no entity
        "比亚迪汉充一次电能跑多远",       # synonym expansion + entity
    ]
    for q in queries:
        eng.fused_path = True
        with eng._cache_lock:
            eng._cache.clear()
        fused = eng.retrieve(q, mode="facts", rerank=False)
        assert eng.last_timings.get("fused") is True, eng.last_timings
        eng.fused_path = False
        with eng._cache_lock:
            eng._cache.clear()
        staged = eng.retrieve(q, mode="facts", rerank=False)
        gf, gs = _score_groups(fused), _score_groups(staged)
        if "第37版" in q:
            # no entity arm → identical candidate sets → identical groups
            assert gf == gs, q
        else:
            # the entity arm full-scans where the per-stage path probes by
            # a selectivity policy — fused recall is ≥, scores of shared
            # docs must agree exactly
            shared = set(gf) & set(gs)
            assert shared, (q, gf, gs)
            top_f = max(gf)
            top_s = max(gs)
            assert top_f >= top_s - 1e-6, q
            for score in shared:
                assert gf[score] >= gs[score] or gs[score] >= gf[score] \
                    or gf[score] & gs[score], (q, score)


def test_fused_declines_filters_tables_and_tails():
    eng, docs = _mk_engine(n_docs=200)
    # metadata filter → per-stage (needs the mask popcount first)
    eng.retrieve("宝马X5的续航", mode="facts",
                 metadata_filter={"manufacturer": "宝马"}, rerank=False)
    assert not eng.last_timings.get("fused"), eng.last_timings
    # fresh tail → per-stage
    eng.add_documents([Document(page_content="宝马X9 新款 续航里程为999公里",
                                metadata={"manufacturer": "宝马",
                                          "model": "X9"})])
    if eng.index.tail_rows > 0:
        with eng._cache_lock:
            eng._cache.clear()
        ranked = eng.retrieve("宝马X9 新款的续航", mode="facts",
                              rerank=False)
        assert not eng.last_timings.get("fused")
        assert any("X9" in d.page_content for d, _ in ranked)

    # table-mode index → per-stage
    eng2, _ = _mk_engine(n_docs=120, probe_mode="table")
    with eng2._cache_lock:
        eng2._cache.clear()
    eng2.retrieve("奔驰GLE的马力", mode="facts", rerank=False)
    assert not eng2.last_timings.get("fused")


def test_fused_int8_refine_matches():
    dense = DenseEmbedder()
    index = IVFIndex(dim=dense.dim, device_dtype="int8", n_lists=8,
                     n_probe=8)
    eng = RetrievalEngine(dense, index, reranker=None)
    docs = [Document(page_content=f"样本{i} 马力{100 + i}匹",
                     metadata={"model": f"M{i % 7}"}) for i in range(200)]
    eng.add_documents(docs)
    index.rebuild(seed=0)
    eng.fused_path = True
    a = eng.retrieve("样本42 的马力", mode="facts", rerank=False)
    assert eng.last_timings.get("fused") is True
    eng.fused_path = False
    with eng._cache_lock:
        eng._cache.clear()
    b = eng.retrieve("样本42 的马力", mode="facts", rerank=False)
    assert _pairs(a) == _pairs(b)


def test_fused_flat_plan_single_dispatch_matches():
    """When the calibrated planner routes to the exact scan, the fused
    program swaps its dense arm for the flat kernel — results must match
    the per-stage flat path."""
    eng, docs = _mk_engine(n_docs=300, with_sparse=True)
    eng.index.plan = "flat"
    q = "比亚迪汉充一次电能跑多远"
    eng.fused_path = True
    with eng._cache_lock:
        eng._cache.clear()
    fused = eng.retrieve(q, mode="facts", rerank=False)
    assert eng.last_timings.get("fused") is True
    eng.fused_path = False
    with eng._cache_lock:
        eng._cache.clear()
    staged = eng.retrieve(q, mode="facts", rerank=False)
    assert _score_groups(fused) == _score_groups(staged)


def test_fused_sparse_lut_variant_matches():
    """The fused dispatch's sparse arm at scan_variant="pallas_lut" must
    return exactly what the per-stage path returns under the same variant
    (the LUT tables are built host-side and ride the same dispatch)."""
    eng, docs = _mk_engine(with_sparse=True)
    eng.sparse_index.scan_variant = "pallas_lut"
    q = "第37版 马力多少匹"  # no entity arm → identical candidate sets
    eng.fused_path = True
    with eng._cache_lock:
        eng._cache.clear()
    fused = eng.retrieve(q, mode="facts", rerank=False)
    assert eng.last_timings.get("fused") is True, eng.last_timings
    eng.fused_path = False
    with eng._cache_lock:
        eng._cache.clear()
    staged = eng.retrieve(q, mode="facts", rerank=False)
    assert _score_groups(fused) == _score_groups(staged)
