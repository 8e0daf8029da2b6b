"""FlatIndex tests against a numpy exact-search oracle (SURVEY.md §4: unit
test kernels against exact-search oracles on small corpora)."""

import numpy as np
import pytest

from automative_rag_tpu.documents import Document
from automative_rag_tpu.index import FlatIndex


def _random_corpus(rng, n, dim, n_manu=4):
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    manus = [f"manu-{i}" for i in range(n_manu)]
    docs = [
        Document(
            page_content=f"doc {i}",
            metadata={
                "manufacturer": manus[i % n_manu],
                "model": f"model-{i % 7}",
                "year": 2015 + (i % 10),
                "source_id": f"s{i % 5}",
            },
        )
        for i in range(n)
    ]
    return vectors, docs


def _oracle_topk(vectors, query, k, row_mask=None):
    v = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    q = query / np.linalg.norm(query)
    scores = v @ q
    if row_mask is not None:
        scores = np.where(row_mask, scores, -np.inf)
    order = np.argsort(-scores)[:k]
    return [o for o in order if np.isfinite(scores[o])]


@pytest.fixture
def corpus(rng):
    return _random_corpus(rng, 500, 64)


def test_exact_topk_matches_oracle(rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    for _ in range(5):
        q = rng.normal(size=64).astype(np.float32)
        got = [r.row for r in index.search(q, 10)[0]]
        want = _oracle_topk(vectors, q, 10)
        assert got == want


def test_filtered_search_matches_oracle(rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    row_mask = np.array(
        [d.metadata["manufacturer"] == "manu-1" and d.metadata["year"] == 2019 for d in docs]
    )
    q = rng.normal(size=64).astype(np.float32)
    got = [r.row for r in index.search(q, 10, {"manufacturer": "manu-1", "year": 2019})[0]]
    want = _oracle_topk(vectors, q, 10, row_mask)
    assert got == want
    for r in index.search(q, 10, {"manufacturer": "manu-1", "year": 2019})[0]:
        assert r.document.metadata["manufacturer"] == "manu-1"
        assert r.document.metadata["year"] == 2019


def test_recall_at_10_is_perfect(rng, corpus):
    """Flat search is exact — recall@10 vs oracle must be 1.0 (BASELINE
    config #0: ~1K chunks, flat exact cosine, recall@10 on CPU)."""
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    queries = rng.normal(size=(20, 64)).astype(np.float32)
    batched = index.search(queries, 10)
    v = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    for b in range(20):
        q = queries[b] / np.linalg.norm(queries[b])
        scores = v @ q
        kth = np.sort(scores)[-10]
        # every returned row must score within fp epsilon of the oracle's
        # 10th-best — exactness up to fp32 rank-boundary ties
        for r in batched[b]:
            assert scores[r.row] >= kth - 1e-5


def test_delete_and_upsert(rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    n = index.count

    target = docs[0].id
    assert index.delete_by_ids([target]) == 1
    assert index.count == n - 1
    q = vectors[0]
    rows = [r.row for r in index.search(q, 5)[0]]
    assert 0 not in rows  # deleted row can't be returned

    # upsert same id with a new vector: old row tombstoned
    new_doc = Document(page_content="replacement", metadata={"manufacturer": "manu-0"}, id=docs[1].id)
    index.add(rng.normal(size=(1, 64)).astype(np.float32), [new_doc])
    assert index.count == n - 1  # -1 deleted, +1 new, -1 tombstoned
    assert index.get_document(docs[1].id).page_content == "replacement"


def test_metadata_scroll(rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    hits = index.metadata_search({"manufacturer": "manu-2"}, limit=1000)
    want = sum(1 for d in docs if d.metadata["manufacturer"] == "manu-2")
    assert len(hits) == want


def test_filter_fallback_on_bad_field(rng, corpus):
    """Un-compilable filters fall back to unfiltered search (reference
    vectorstore.py:195-213 fallback semantics)."""
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    q = rng.normal(size=64).astype(np.float32)
    got = [r.row for r in index.search(q, 5, {"nonexistent_field": "x"})[0]]
    want = _oracle_topk(vectors, q, 5)
    assert got == want


def test_fewer_matches_than_k(rng):
    vectors, docs = _random_corpus(rng, 50, 32)
    index = FlatIndex(dim=32, device_dtype="float32")
    index.add(vectors, docs)
    q = rng.normal(size=32).astype(np.float32)
    results = index.search(q, 20, {"year": 2015})[0]
    want = sum(1 for d in docs if d.metadata["year"] == 2015)
    assert len(results) == min(want, 20)


def test_save_load_roundtrip(tmp_path, rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    index.delete_by_ids([docs[3].id])
    index.save(str(tmp_path / "idx"))

    restored = FlatIndex.load(str(tmp_path / "idx"))
    assert restored.count == index.count
    q = rng.normal(size=64).astype(np.float32)
    a = [(r.row, round(r.score, 5)) for r in index.search(q, 10, {"manufacturer": "manu-1"})[0]]
    b = [(r.row, round(r.score, 5)) for r in restored.search(q, 10, {"manufacturer": "manu-1"})[0]]
    assert a == b


def test_stats(rng, corpus):
    vectors, docs = corpus
    index = FlatIndex(dim=64, device_dtype="float32")
    index.add(vectors, docs)
    stats = index.stats()
    assert stats["count"] == 500
    assert stats["capacity"] == 512
    assert stats["vocab_sizes"]["manufacturer"] == 4


def test_int8_index_recall(rng, corpus):
    """int8 symmetric quantization: top-10 must overlap f32 exact search
    ≥ 90% (halved HBM, 2x MXU throughput; rerank repairs the tail)."""
    vectors, docs = corpus
    exact = FlatIndex(dim=64, device_dtype="float32")
    exact.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    quant = FlatIndex(dim=64, device_dtype="int8")
    quant.add(vectors, docs)
    assert quant.stats()["hbm_bytes"] == 512 * 64  # 1 byte per element

    overlap = 0.0
    queries = rng.normal(size=(10, 64)).astype(np.float32)
    for q in queries:
        want = {r.row for r in exact.search(q, 10)[0]}
        got = {r.row for r in quant.search(q, 10)[0]}
        overlap += len(got & want) / 10
    assert overlap / 10 >= 0.9


def test_int8_filtered_search(rng, corpus):
    vectors, docs = corpus
    quant = FlatIndex(dim=64, device_dtype="int8")
    quant.add(vectors, docs)
    q = rng.normal(size=64).astype(np.float32)
    hits = quant.search(q, 10, {"manufacturer": "manu-1"})[0]
    assert hits
    for r in hits:
        assert r.document.metadata["manufacturer"] == "manu-1"
