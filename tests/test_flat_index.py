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


def test_flat_live_appends_keep_slab_resident(rng):
    """Pure appends under the fold threshold keep the staged device slab
    (restaging is a full host->HBM corpus transfer); the fresh rows are
    host-searched and must honor filters, deletes, and metadata scans."""
    import numpy as np

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.flat import FlatIndex

    def mk(n, prefix="d"):
        v = rng.normal(size=(n, 32)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs = [Document(page_content=f"{prefix}{i}",
                         metadata={"manufacturer": f"m{i % 3}", "year": 2020},
                         id=f"{prefix}{i}") for i in range(n)]
        return v, docs

    index = FlatIndex(dim=32)
    v, docs = mk(200)
    index.add(v, docs)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    index.search(q, 5)  # stage
    staged = index._device
    assert staged is not None and staged["staged_rows"] == 200

    tv, tdocs = mk(4, prefix="t")
    for d in tdocs:
        d.metadata["manufacturer"] = "m9"
    index.add(tv, tdocs)
    assert index._device is staged  # pure append: slab survives

    hits = index.search(tv[1:2], 3)[0]
    assert hits[0].document.id == "t1"
    hits = index.search(tv[1:2], 5, {"manufacturer": "m9"})[0]
    assert len(hits) == 4
    # metadata scan sees host-tail rows
    assert {d.id for d in index.metadata_search({"manufacturer": "m9"})} == {
        "t0", "t1", "t2", "t3"
    }
    # delete a tail row
    index.delete_by_ids(["t1"])
    hits = index.search(tv[1:2], 5, {"manufacturer": "m9"})[0]
    assert all(h.document.id != "t1" for h in hits) and len(hits) == 3

    # upsert of a staged row must restage (stale validity would resurrect it)
    index.search(q, 5)
    staged = index._device
    redo_v, redo_docs = mk(1)  # id d0 again
    index.add(redo_v, redo_docs)
    assert index._device is not staged

    # exceeding the fold threshold restages on the next search
    index.search(q, 5)
    big_v, big_docs = mk(1500, prefix="big")
    index.add(big_v, big_docs)
    assert index._device is None  # 1500 > max(1024, staged//100)
    index.search(q, 5)
    assert index._device["staged_rows"] == index.total_rows


def test_sharded_flat_live_appends(rng):
    import jax
    import numpy as np
    import pytest as _pytest

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.parallel import ShardedFlatIndex, make_mesh

    if len(jax.devices()) < 8:
        _pytest.skip("needs the virtual mesh")
    v = rng.normal(size=(500, 32)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={}) for i in range(500)]
    index = ShardedFlatIndex(dim=32, mesh=make_mesh(8))
    index.add(v, docs)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    index.search(q, 5)
    staged = index._device
    tv = rng.normal(size=(2, 32)).astype(np.float32)
    index.add(tv, [Document(page_content=f"t{i}", metadata={}) for i in range(2)])
    assert index._device is staged
    hits = index.search(tv[0:1], 3)[0]
    assert hits[0].document.page_content == "t0"


# ------------------------------------------------------------- int4 (w4a16)

def _int4_corpus(n=600, dim=128, seed=0):
    rng = np.random.default_rng(seed)
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    docs = [
        Document(page_content=f"doc {i}",
                 metadata={"manufacturer": f"m{i % 3}", "year": 2020 + i % 4})
        for i in range(n)
    ]
    return vectors, docs


def test_int4_recall_vs_f32_oracle():
    """w4a16 search (packed-nibble corpus, full-precision queries) must
    recall nearly everything the exact index returns — weight-only int4
    error, repaired downstream by rerank."""
    vectors, docs = _int4_corpus()
    exact = FlatIndex(dim=128, device_dtype="float32")
    exact.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    q4 = FlatIndex(dim=128, device_dtype="int4")
    q4.add(vectors, docs)
    assert q4.stats()["device_dtype"] == "int4"
    # packed corpus is half the int8 footprint
    assert q4.stats()["hbm_bytes"] == q4._device_state()["capacity"] * 128 // 2

    rng = np.random.default_rng(1)
    overlaps = []
    for _ in range(10):
        q = rng.normal(size=128).astype(np.float32)
        want = {h.row for h in exact.search(q, 10)[0]}
        got = {h.row for h in q4.search(q, 10)[0]}
        overlaps.append(len(want & got) / 10)
    assert np.mean(overlaps) >= 0.85, overlaps
    # self-query: the row's own vector must rank first
    hits = q4.search(vectors[37], 5)[0]
    assert hits[0].row == 37


def test_int4_filters_tail_and_roundtrip(tmp_path):
    vectors, docs = _int4_corpus(n=300)
    idx = FlatIndex(dim=128, device_dtype="int4")
    idx.add(vectors, docs)
    q = vectors[12]
    hits = idx.search(q, 8, {"manufacturer": "m1"})[0]
    assert hits and all(h.document.metadata["manufacturer"] == "m1" for h in hits)
    # live tail: append after staging, self-query the fresh row
    idx.search(q, 4)
    rng = np.random.default_rng(2)
    fresh = rng.normal(size=(5, 128)).astype(np.float32)
    idx.add(fresh, [Document(page_content=f"fresh {i}", metadata={})
                    for i in range(5)])
    hits = idx.search(fresh[3], 3)[0]
    assert hits[0].row == 303
    # checkpoint round-trip preserves the logical dtype
    idx.save(str(tmp_path))
    restored = FlatIndex.load(str(tmp_path))
    assert restored._dtype_name == "int4"
    assert restored.search(vectors[12], 3)[0][0].row == \
        idx.search(vectors[12], 3)[0][0].row


def test_int4_rejected_for_ivf():
    import pytest as _pytest

    from automative_rag_tpu.index.ivf import IVFIndex

    with _pytest.raises(ValueError, match="int4"):
        IVFIndex(dim=64, device_dtype="int4")


def test_int4_sharded_matches_single_device():
    """The mesh-sharded w4a16 path (packed corpus column-sharded by row,
    per-shard w4_matmul + merge) must return what the single-device int4
    index returns."""
    import jax

    from automative_rag_tpu.parallel import ShardedFlatIndex, make_mesh

    assert len(jax.devices()) >= 8
    vectors, docs = _int4_corpus(n=500)
    single = FlatIndex(dim=128, device_dtype="int4")
    single.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    sharded = ShardedFlatIndex(dim=128, mesh=make_mesh(8), device_dtype="int4")
    sharded.add(vectors, docs)
    assert sharded.stats()["device_dtype"] == "int4"

    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.normal(size=128).astype(np.float32)
        want = [(h.row, round(h.score, 4)) for h in single.search(q, 8)[0]]
        got = [(h.row, round(h.score, 4)) for h in sharded.search(q, 8)[0]]
        assert got == want
    hits = sharded.search(vectors[77], 3, {"manufacturer": "m2"})[0]
    assert all(h.document.metadata["manufacturer"] == "m2" for h in hits)


def test_append_is_amortized_no_full_copy(rng):
    """r03 verdict weak #3: add() concatenated the FULL host mirror per call
    (101.8 s for 10 rows at 1M×1024). With growth slack, appends inside the
    slack must reuse the same backing buffer (no O(corpus) copy), and a
    regrowth must preserve every row."""
    vectors, docs = _random_corpus(rng, 600, 64)
    index = FlatIndex(dim=64)
    index.add(vectors[:500], docs[:500])
    before = index._vectors.copy()
    buf_id = id(index._vec_buf)
    assert index._vec_buf.shape[0] >= 600  # slack exists

    # appends within slack: backing buffer identity is stable
    for i in range(500, 600, 10):
        index.add(vectors[i : i + 10], docs[i : i + 10])
        assert id(index._vec_buf) == buf_id
    assert index.total_rows == 600

    # force a regrowth well past the slack and check contents survive
    more_v, more_docs = _random_corpus(rng, index._vec_buf.shape[0], 64)
    for d in more_docs:
        d.id = "grow-" + d.id  # distinct ids: pure append, no upsert
    index.add(more_v, more_docs)
    assert id(index._vec_buf) != buf_id
    np.testing.assert_array_equal(index._vectors[:500], before[:500])
    assert index.total_rows == 600 + len(more_docs)

    # search still exact after regrowth
    q = rng.normal(size=64).astype(np.float32)
    hits = index.search(np.asarray([q]), k=5)[0]
    oracle = _oracle_topk(index._vectors, q, 5)
    assert [h.row for h in hits] == oracle


def test_int4_host_refine_repairs_recall_with_exact_scores():
    """The quantized scan returns a refine_mult*k shortlist whose rows are
    rescored exactly on the host f32 mirror: recall@10 must be >= the
    unrefined scan's and the returned scores must be TRUE cosines
    (10M int4 direct recall was 0.7063, BENCH_SCALE_10M_r04)."""
    vectors, docs = _int4_corpus(n=2000)
    exact = FlatIndex(dim=128, device_dtype="float32")
    exact.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    plain = FlatIndex(dim=128, device_dtype="int4", refine_mult=0)
    plain.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    refined = FlatIndex(dim=128, device_dtype="int4")  # default: refine on
    refined.add(vectors, docs)
    assert refined.stats()["refine_mult"] == 8

    rng = np.random.default_rng(7)
    rec_plain, rec_ref = [], []
    for _ in range(8):
        q = rng.normal(size=128).astype(np.float32)
        want = {h.row for h in exact.search(q, 10)[0]}
        rec_plain.append(len(want & {h.row for h in plain.search(q, 10)[0]}) / 10)
        hits = refined.search(q, 10)[0]
        rec_ref.append(len(want & {h.row for h in hits}) / 10)
        # scores are exact cosines of the normalized pair
        qn = q / np.linalg.norm(q)
        for h in hits[:3]:
            vn = vectors[h.row] / np.linalg.norm(vectors[h.row])
            assert abs(h.score - float(qn @ vn)) < 1e-5
    assert np.mean(rec_ref) >= np.mean(rec_plain)
    assert np.mean(rec_ref) >= 0.95, (np.mean(rec_plain), np.mean(rec_ref))


def test_int8_host_refine_exact_scores_and_tail():
    """int8 + refine: exact scores, and the host-tail merge stays
    consistent (tail scores were already exact f32 — refined slab scores
    now live on the same scale, so the merged rank is the true rank)."""
    vectors, docs = _int4_corpus(n=800)
    idx = FlatIndex(dim=128, device_dtype="int8")
    idx.add(vectors, docs)
    idx.search(vectors[0], 4)  # stage the slab
    rng = np.random.default_rng(11)
    fresh = rng.normal(size=(6, 128)).astype(np.float32)
    idx.add(fresh, [Document(page_content=f"fresh {i}", metadata={})
                    for i in range(6)])
    hits = idx.search(fresh[2], 5)[0]
    assert hits[0].row == 802  # the fresh row wins via the exact merge
    assert abs(hits[0].score - 1.0) < 1e-5


def test_approx_shortlist_parity_with_exact_refine():
    """topk_approx only engages on the REFINED quantized scan (host refine
    rescores the shortlist exactly), so results must match the exact-
    shortlist path; the unrefined bf16 path must be untouched by the flag."""
    import numpy as np

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(5)
    n = 40_000  # above the two-stage/approx threshold (32768)
    vectors = rng.normal(size=(n, 32)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={"year": 2015 + i % 8})
            for i in range(n)]
    queries = rng.normal(size=(3, 32)).astype(np.float32)

    results = {}
    for approx in (False, True):
        idx = FlatIndex(dim=32, device_dtype="int8", topk_approx=approx)
        idx.add(vectors, docs)
        results[approx] = idx.search(queries, k=10)
    for ra, re_ in zip(results[True], results[False]):
        assert [h.row for h in ra] == [h.row for h in re_]
        assert np.allclose([h.score for h in ra], [h.score for h in re_])

    # filtered path too (mask interacts with the shortlist selection)
    idx = FlatIndex(dim=32, device_dtype="int8", topk_approx=True)
    idx.add(vectors, docs)
    hits = idx.search(queries, k=10, metadata_filter={"year": 2017})[0]
    assert hits and all(h.document.metadata["year"] == 2017 for h in hits)
