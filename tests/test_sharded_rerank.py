"""Mesh-sharded token store / MaxSim rerank: scores must match the
single-device gather path on the virtual 8-device CPU mesh, with only the
[B, k] score matrix crossing the (simulated) interconnect."""

import numpy as np
import pytest

from automative_rag_tpu.models import ColBERTEncoder, EncoderConfig
from automative_rag_tpu.parallel import ShardedTokenStore, make_mesh
from automative_rag_tpu.rerank import LateInteractionReranker
from automative_rag_tpu.rerank.token_store import TokenStore


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def colbert():
    return ColBERTEncoder(config=EncoderConfig.tiny(), max_query_length=16,
                          max_doc_length=32)


@pytest.fixture(scope="module")
def corpus(colbert):
    texts = [f"宝马X{i % 9} 速度 {i} 测试评测文本内容" for i in range(40)]
    embs, masks = colbert.encode_documents(texts)
    return texts, embs, masks


def _stores(colbert, corpus, mesh, quantize="none"):
    _, embs, masks = corpus
    single = TokenStore(dim=colbert.dim, max_doc_length=32,
                        device_dtype="float32", quantize=quantize)
    sharded = ShardedTokenStore(dim=colbert.dim, max_doc_length=32, mesh=mesh,
                                device_dtype="float32", quantize=quantize)
    single.append(embs, masks)
    sharded.append(embs, masks)
    return single, sharded


def test_sharded_scores_match_gather_path(colbert, corpus, mesh):
    single, sharded = _stores(colbert, corpus, mesh)
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    rows = [0, 3, 17, 31, 39, 8, 25]
    queries = ["宝马X3 怎么样", "速度 测试"]
    a = reranker.maxsim_scores_from_store(queries, rows, single)
    assert "sharded" not in reranker.last_timings
    b = reranker.maxsim_scores_from_store(queries, rows, sharded)
    assert reranker.last_timings.get("sharded") is True
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)


def test_sharded_int8_scores_close(colbert, corpus, mesh):
    single, sharded = _stores(colbert, corpus, mesh, quantize="int8")
    q_emb, q_mask = colbert.encode_queries(["宝马X3 评测"])
    rows = list(range(40))
    got = sharded.maxsim(q_emb, q_mask, rows)
    # oracle: the single-device int8 store's gather path
    from automative_rag_tpu.ops.maxsim import maxsim_scores
    import jax.numpy as jnp

    docs_t, d_mask = single.gather(rows)
    want = np.asarray(maxsim_scores(
        jnp.asarray(q_emb), jnp.asarray(q_mask), docs_t, d_mask,
        token_major=True, use_pallas=False,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert got.shape == (1, 40)


def test_sharded_k_padding_and_order(colbert, corpus, mesh):
    """k not a multiple of the pad quantum; results sliced back and ordered
    per the caller's row list."""
    single, sharded = _stores(colbert, corpus, mesh)
    q_emb, q_mask = colbert.encode_queries(["测试"])
    rows = [5, 2, 38]
    got = sharded.maxsim(q_emb, q_mask, rows)
    assert got.shape == (1, 3)
    want = sharded.maxsim(q_emb, q_mask, [2, 5, 38])
    np.testing.assert_allclose(got[0, [1, 0, 2]], want[0], rtol=1e-5)


def test_sharded_append_invalidates_cache(colbert, corpus, mesh):
    texts, embs, masks = corpus
    _, sharded = _stores(colbert, corpus, mesh)
    q_emb, q_mask = colbert.encode_queries(["宝马X1"])
    before = sharded.maxsim(q_emb, q_mask, [0])
    assert sharded.stats()["device_resident"]
    # append the same row again: row 40 must score identically to row 0
    sharded.append(embs[:1], masks[:1])
    after = sharded.maxsim(q_emb, q_mask, [40, 0])
    np.testing.assert_allclose(after[0, 0], after[0, 1], rtol=1e-5)
    np.testing.assert_allclose(after[0, 1], before[0, 0], rtol=1e-5)


def test_sharded_budget_fallback(colbert, corpus, mesh):
    """Over-budget store falls back to the host-gather path with identical
    scores."""
    texts, embs, masks = corpus
    small = ShardedTokenStore(dim=colbert.dim, max_doc_length=32, mesh=mesh,
                              device_dtype="float32", device_budget_bytes=1)
    small.append(embs, masks)
    big = ShardedTokenStore(dim=colbert.dim, max_doc_length=32, mesh=mesh,
                            device_dtype="float32")
    big.append(embs, masks)
    q_emb, q_mask = colbert.encode_queries(["速度"])
    rows = [1, 20, 39]
    np.testing.assert_allclose(
        small.maxsim(q_emb, q_mask, rows), big.maxsim(q_emb, q_mask, rows),
        rtol=1e-3, atol=1e-4,
    )
    assert not small.stats()["device_resident"]


def test_app_wires_sharded_token_store(mesh):
    """token_store_sharded=True: the app serves queries end-to-end with the
    token store row-sharded on the same mesh as the index."""
    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.config.settings import Settings

    settings = Settings()
    settings.index_kind = "sharded"
    settings.token_store_sharded = True
    app = RAGApplication(settings=settings, tiny=True)
    try:
        assert isinstance(app.token_store, ShardedTokenStore)
        assert app.token_store.mesh is app.index.mesh
        jid = app.ingest_text("2023款小鹏G9的续航是702公里。")
        import time as _time

        deadline = _time.time() + 60
        while app.tracker.get_job(jid)["status"] not in ("completed", "failed"):
            assert _time.time() < deadline
            _time.sleep(0.05)
        result = app.query_sync("小鹏G9续航", timeout=60)
        assert result["status"] == "completed"
        assert "702" in result["result"]["answer"]
        # the rerank actually went through the sharded path
        assert app.token_store.rows > 0
    finally:
        app.shutdown()


def test_sharded_store_concurrent_append_and_maxsim(colbert, corpus, mesh):
    """Ingestion-thread appends racing direct-path reranks must neither crash
    nor corrupt scores (same guarantee as the single-device store soak)."""
    import threading

    texts, embs, masks = corpus
    _, sharded = _stores(colbert, corpus, mesh)
    q_emb, q_mask = colbert.encode_queries(["宝马X5"])
    baseline = sharded.maxsim(q_emb, q_mask, [0, 5])
    errors = []

    def writer():
        try:
            for _ in range(10):
                sharded.append(embs[:2], masks[:2])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def reader():
        try:
            for _ in range(10):
                got = sharded.maxsim(q_emb, q_mask, [0, 5])
                np.testing.assert_allclose(got, baseline, rtol=1e-4)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert sharded.rows == 40 + 20


def test_sharded_residual2_init_rejected(colbert, mesh):
    # residual2 is reached via compress(), never at init (same as the base)
    with pytest.raises(ValueError):
        ShardedTokenStore(dim=colbert.dim, max_doc_length=32, mesh=mesh,
                          quantize="residual2")


def test_sharded_residual_compress_matches_single_device(colbert, corpus, mesh):
    """compress() on the sharded store: shards decode their own candidates'
    packed codes at score time; scores must match the single-device residual
    store's gather path."""
    import jax.numpy as jnp

    from automative_rag_tpu.ops.maxsim import maxsim_scores

    single, sharded = _stores(colbert, corpus, mesh)
    info_a = single.compress(k_centroids=16, n_iters=4, seed=0, bits=4)
    info_b = sharded.compress(k_centroids=16, n_iters=4, seed=0, bits=4)
    assert info_a["compression"] == info_b["compression"] > 1
    assert sharded.quantize == "residual2"

    q_emb, q_mask = colbert.encode_queries(["宝马X5 速度"])
    rows = [0, 7, 19, 33, 39]
    got = sharded.maxsim(q_emb, q_mask, rows)
    assert sharded.stats()["device_resident"]
    docs_t, d_mask = single.gather(rows)
    want = np.asarray(maxsim_scores(
        jnp.asarray(q_emb), jnp.asarray(q_mask), docs_t, d_mask,
        token_major=True, use_pallas=False,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # appends after compress() encode against the trained centroids and stay
    # queryable on the sharded path
    _, embs, masks = corpus
    sharded.append(embs[:1], masks[:1])
    after = sharded.maxsim(q_emb, q_mask, [40, 0])
    np.testing.assert_allclose(after[0, 0], after[0, 1], rtol=1e-4)


def test_app_save_load_rehosts_sharded_store(tmp_path, mesh):
    """save_index/load_index round-trips the token store back onto the mesh
    when TOKEN_STORE_SHARDED is on."""
    import time as _time

    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.config.settings import Settings

    def _wait(app, jid):
        deadline = _time.time() + 60
        while app.tracker.get_job(jid)["status"] not in ("completed", "failed"):
            assert _time.time() < deadline
            _time.sleep(0.05)

    settings = Settings()
    settings.index_kind = "sharded"
    settings.token_store_sharded = True
    app = RAGApplication(settings=settings, tiny=True)
    try:
        _wait(app, app.ingest_text("2023款蔚来ES6的续航是610公里。"))
        rows_before = app.token_store.rows
        app.save_index(str(tmp_path))
    finally:
        app.shutdown()

    app2 = RAGApplication(settings=settings, tiny=True)
    try:
        assert app2.load_index(str(tmp_path)) == 1
        assert isinstance(app2.token_store, ShardedTokenStore)
        assert app2.token_store.rows == rows_before
        result = app2.query_sync("蔚来ES6续航", timeout=60)
        assert result["status"] == "completed"
        assert "610" in result["result"]["answer"]
    finally:
        app2.shutdown()
        settings.index_kind = "flat"
        settings.token_store_sharded = False
