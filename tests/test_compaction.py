"""Index compaction: tombstoned rows are reclaimed and every row-aligned
structure (metadata columns, IVF lists, token store) stays consistent.

The reference's Qdrant optimizer reclaims deleted points in the background
(``vectorstore.py:320-353`` delete semantics); an HBM-resident static-shape
index must do it explicitly — without it a churn-heavy corpus scans (and
pays HBM for) every row it ever held."""

import numpy as np
import pytest

from automative_rag_tpu.documents import Document
from automative_rag_tpu.index.flat import FlatIndex
from automative_rag_tpu.index.ivf import IVFIndex
from automative_rag_tpu.rerank.token_store import TokenStore


def _mk_docs(n, prefix="d"):
    return [
        Document(
            page_content=f"doc {prefix}{i}",
            metadata={"manufacturer": f"m{i % 3}", "year": 2020 + (i % 4)},
            id=f"{prefix}{i}",
        )
        for i in range(n)
    ]


def _mk_vectors(rng, n, dim=64):
    v = rng.normal(size=(n, dim)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture
def corpus(rng):
    docs = _mk_docs(40)
    vectors = _mk_vectors(rng, 40)
    return docs, vectors


def _top_ids(index, q, k=5, flt=None):
    return [h.document.id for h in index.search(q, k, flt)[0]]


def test_flat_compact_preserves_search(corpus, rng):
    docs, vectors = corpus
    index = FlatIndex(dim=64)
    index.add(vectors, docs)
    victims = [d.id for d in docs[::3]]
    index.delete_by_ids(victims)

    q = _mk_vectors(rng, 1)
    before = _top_ids(index, q)
    before_filtered = _top_ids(index, q, flt={"manufacturer": "m1"})

    info = index.compact()
    assert info["reclaimed_rows"] == len(victims)
    assert info["rows"] == 40 - len(victims)
    assert index.count == index.total_rows == info["rows"]
    assert not index._deleted.any()
    assert len(index._docs) == info["rows"]

    assert _top_ids(index, q) == before
    assert _top_ids(index, q, flt={"manufacturer": "m1"}) == before_filtered
    # metadata scroll agrees too
    assert {d.id for d in index.metadata_search({"manufacturer": "m1"}, limit=100)} == {
        d.id for d in docs if d.metadata["manufacturer"] == "m1" and d.id not in victims
    }

    # no-op second compact
    assert index.compact()["reclaimed_rows"] == 0


def test_flat_compact_after_upsert(corpus, rng):
    docs, vectors = corpus
    index = FlatIndex(dim=64)
    index.add(vectors, docs)
    # upsert half the ids with fresh vectors (tombstones the old rows)
    redo = _mk_docs(20)
    index.add(_mk_vectors(rng, 20), redo)
    assert index.total_rows == 60 and index.count == 40

    q = _mk_vectors(rng, 1)
    before = _top_ids(index, q, k=8)
    assert index.compact()["reclaimed_rows"] == 20
    assert index.total_rows == 40
    assert _top_ids(index, q, k=8) == before
    # upserted ids resolve to their new rows
    for d in redo[:3]:
        assert index.get_document(d.id).page_content == d.page_content


def test_ivf_compact_remaps_lists(rng):
    docs = _mk_docs(200)
    vectors = _mk_vectors(rng, 200)
    index = IVFIndex(dim=64, n_lists=8, n_probe=8)
    index.add(vectors, docs)
    index.rebuild()
    # delete a third AFTER the build, then add a fresh tail
    index.delete_by_ids([d.id for d in docs[::3]])
    tail_docs = _mk_docs(10, prefix="t")
    index.add(_mk_vectors(rng, 10), tail_docs)

    q = _mk_vectors(rng, 3)
    before = [_top_ids(index, q[i : i + 1], k=10) for i in range(3)]
    old_tail = index.total_rows - index._indexed_rows

    info = index.compact()
    assert info["reclaimed_rows"] == len(docs[::3])
    # the build survives: still list-covered, tail unchanged in size
    assert index._budget_built
    assert index.total_rows - index._indexed_rows == old_tail
    # remapped CSR entries point at live rows only
    entries = index._sorted_rows
    assert entries.max() < index.total_rows
    live_entries = entries[entries >= 0]
    assert not index._deleted[live_entries].any()

    for i in range(3):
        assert _top_ids(index, q[i : i + 1], k=10) == before[i]


def test_ivf_table_mode_compact_remaps_lists(rng):
    docs = _mk_docs(200)
    vectors = _mk_vectors(rng, 200)
    index = IVFIndex(dim=64, n_lists=8, n_probe=8, probe_mode="table")
    index.add(vectors, docs)
    index.rebuild()
    index.delete_by_ids([d.id for d in docs[::3]])
    q = _mk_vectors(rng, 3)
    before = [_top_ids(index, q[i: i + 1], k=10) for i in range(3)]
    info = index.compact()
    assert info["reclaimed_rows"] == len(docs[::3])
    assert index._list_table is not None
    table = index._list_table
    assert table.max() < index.total_rows
    live_entries = table[table >= 0]
    assert not index._deleted[live_entries].any()
    for i in range(3):
        assert _top_ids(index, q[i: i + 1], k=10) == before[i]


def test_token_store_select_rows_alignment(rng):
    store = TokenStore(dim=32, max_doc_length=8, quantize="int8")
    n = 12
    tokens = rng.normal(size=(n, 8, 32)).astype(np.float32)
    masks = np.ones((n, 8), bool)
    scales = np.abs(tokens).max(axis=2) / 127.0
    quant = np.clip(
        np.round(tokens / np.maximum(scales[..., None], 1e-12)), -127, 127
    ).astype(np.int8)
    store.append_quantized(quant, scales.astype(np.float16), masks)

    live = np.array([0, 2, 3, 7, 8, 11])
    ref_before = [np.asarray(store.gather_for_maxsim([int(r)])[0]) for r in live]
    store.select_rows(live)
    assert store.rows == live.size
    for new_row, want in enumerate(ref_before):
        got = np.asarray(store.gather_for_maxsim([new_row])[0])
        np.testing.assert_array_equal(got, want)


def test_app_compact_keeps_rerank_from_store(tmp_path, rng):
    """End-to-end: ingest → delete → compact → a reranked query still uses
    the token store (no silent fallback) and returns the right document."""
    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.config.settings import Settings

    settings = Settings(
        index_kind="flat",
        data_dir=str(tmp_path),
        index_dir=str(tmp_path / "index"),
        store_token_embeddings=True,
    )
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    try:
        jobs = [
            app.ingest_text(
                f"2023款宝马5系 加速时间 6.{i}秒", {"manufacturer": "宝马", "model": "5系"}
            )
            for i in range(4)
        ]
        jobs += [
            app.ingest_text(
                f"2022款奥迪A6 加速时间 7.{i}秒", {"manufacturer": "奥迪", "model": "A6"}
            )
            for i in range(4)
        ]
        for j in jobs:
            assert app.tracker.wait_for_terminal(j, timeout=60) == "completed"
        assert app.index.count == app.token_store.rows == 8

        app.index.delete_by_filter({"manufacturer": "奥迪"})
        info = app.compact_index()
        assert info["reclaimed_rows"] == 4
        assert app.token_store.rows == app.index.total_rows == 4

        ranked = app.engine.retrieve("宝马5系 加速时间", mode="facts")
        assert ranked and all(
            doc.metadata["manufacturer"] == "宝马" for doc, _ in ranked
        )
        # the store path (not the encode fallback) must still be viable:
        # every candidate row is covered by the compacted store
        assert max(app.index._row_of_id.values()) < app.token_store.rows
    finally:
        app.shutdown()


def test_sharded_ivf_compact_requires_rebuild(rng):
    import jax

    from automative_rag_tpu.parallel import ShardedIVFIndex, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    docs = _mk_docs(96)
    vectors = _mk_vectors(rng, 96)
    index = ShardedIVFIndex(dim=64, mesh=make_mesh(axis_name="shard"), axis_name="shard")
    index.add(vectors, docs)
    index.rebuild()
    index.delete_by_ids([d.id for d in docs[::2]])

    q = _mk_vectors(rng, 1)
    before = _top_ids(index, q, k=8)
    info = index.compact()
    assert info["rebuild_required"] and index._centroids is None
    # falls back to exact sharded search until rebuilt — results unchanged
    assert _top_ids(index, q, k=8) == before
    index.rebuild()
    assert _top_ids(index, q, k=8) == before


def test_api_delete_and_compact(tmp_path):
    """HTTP surface: delete one doc, bulk delete by filter and by job, then
    compact through the endpoint."""
    import json as _json

    from automative_rag_tpu.api.app import build_api
    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.config.settings import Settings

    settings = Settings(
        index_kind="flat",
        data_dir=str(tmp_path),
        index_dir=str(tmp_path / "index"),
        store_token_embeddings=True,
    )
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    api = build_api(app)

    def call(method, path, body=None):
        raw = _json.dumps(body).encode() if body is not None else b""
        status, payload, _ = api.dispatch(method, path, {}, raw)
        return status, _json.loads(payload)

    try:
        jobs = {}
        for i, (make, model) in enumerate(
            [("宝马", "5系"), ("宝马", "X5"), ("奥迪", "A6")]
        ):
            status, body = call("POST", "/ingest/text", {
                "content": f"{make}{model} 测试文档 {i}",
                "metadata": {"manufacturer": make, "model": model},
            })
            assert status == 200
            jobs[model] = body["job_id"]
        for j in jobs.values():
            assert app.tracker.wait_for_terminal(j, timeout=60) == "completed"
        assert app.index.count == 3

        # single-doc delete + 404 on repeat
        doc_id = app.index._docs[0].id
        status, body = call("DELETE", f"/ingest/documents/{doc_id}")
        assert status == 200 and body["deleted"] == 1
        status, _ = call("DELETE", f"/ingest/documents/{doc_id}")
        assert status == 404

        # bulk delete rejects an empty filter
        status, _ = call("DELETE", "/ingest/documents")
        assert status == 422

        # delete by job id
        status, body = call("DELETE", f"/ingest/documents?job_id={jobs['A6']}")
        assert status == 200 and body["deleted"] == 1

        # delete by metadata filter (nothing left matching 宝马 X5 after)
        status, body = call("DELETE", "/ingest/documents?manufacturer=宝马")
        assert status == 200 and body["deleted"] == 1 and body["remaining"] == 0

        # compact reclaims all three tombstones atomically with the store
        status, body = call("POST", "/system/compact-index")
        assert status == 200 and body["reclaimed_rows"] == 3
        assert app.index.total_rows == 0 and app.token_store.rows == 0
    finally:
        app.shutdown()
