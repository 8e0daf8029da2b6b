"""Token-store rerank path: scores must match the re-encode path exactly,
persistence round-trips, and the engine prefers the store."""

import numpy as np
import pytest

from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.documents import Document
from automative_rag_tpu.models import ColBERTEncoder, EncoderConfig
from automative_rag_tpu.rerank import LateInteractionReranker
from automative_rag_tpu.rerank.token_store import TokenStore


@pytest.fixture(scope="module")
def colbert():
    return ColBERTEncoder(config=EncoderConfig.tiny(), max_query_length=16, max_doc_length=32)


def test_store_scores_match_reencode(colbert):
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    docs = [Document(page_content=f"宝马X{i} 测试文本 {i}") for i in range(6)]
    texts = [d.page_content for d in docs]

    store = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    embs, masks = colbert.encode_documents(texts)
    store.append(embs, masks)

    direct = reranker.maxsim_scores_batch(["宝马X3 怎么样"], docs)
    stored = reranker.maxsim_scores_from_store(["宝马X3 怎么样"], list(range(6)), store)
    np.testing.assert_allclose(stored, direct, rtol=1e-3, atol=1e-4)

    # fp16 storage can flip near-ties; top-1 and score values must agree
    ranked_direct = reranker.rerank("宝马X3", docs, top_k=3)
    ranked_store = reranker.rerank_rows("宝马X3", docs, list(range(6)), store, top_k=3)
    assert ranked_direct[0][0].page_content == ranked_store[0][0].page_content
    np.testing.assert_allclose(
        [s for _, s in ranked_direct], [s for _, s in ranked_store], rtol=1e-3
    )


def test_store_gather_subset(colbert):
    store = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    embs, masks = colbert.encode_documents(["一", "二", "三", "四"])
    store.append(embs, masks)
    docs_t, m = store.gather([2, 0])
    assert docs_t.shape == (32, 2, colbert.dim)
    np.testing.assert_allclose(np.asarray(docs_t)[:, 0, :], embs[2].astype(np.float32), rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(m), masks[[2, 0]])


def test_store_host_fallback(colbert):
    # zero device budget forces the host-gather path
    store = TokenStore(dim=colbert.dim, max_doc_length=32,
                       device_dtype="float32", device_budget_bytes=0)
    embs, masks = colbert.encode_documents(["甲", "乙"])
    store.append(embs, masks)
    docs_t, m = store.gather([1])
    assert docs_t.shape == (32, 1, colbert.dim)


def test_store_save_load(tmp_path, colbert):
    store = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    embs, masks = colbert.encode_documents(["持久化测试"])
    store.append(embs, masks)
    store.save(str(tmp_path))
    restored = TokenStore.load(str(tmp_path), dim=colbert.dim, max_doc_length=32,
                               device_dtype="float32")
    assert restored.rows == 1
    np.testing.assert_array_equal(restored._tokens, store._tokens)


def test_engine_uses_store():
    app = RAGApplication(tiny=True)
    try:
        import time

        jid = app.ingest_text("奔驰GLC 2023款百公里加速6.2秒。")
        while app.tracker.get_job(jid)["status"] not in ("completed", "failed"):
            time.sleep(0.05)
        assert app.token_store is not None
        assert app.token_store.rows == app.index.total_rows

        ranked = app.engine.retrieve("奔驰GLC 加速")
        assert ranked
        # the store path reports gather timing (or the fused
        # gather+maxsim single-dispatch marker) instead of doc-encode timing
        timings = app.reranker.last_timings
        assert "gather_s" in timings or timings.get("fused_gather")
    finally:
        app.shutdown()


def test_int8_store_close_to_fp16(colbert):
    from automative_rag_tpu.rerank.token_store import TokenStore

    docs = [Document(page_content=f"奔驰GLE {i}款测试") for i in range(5)]
    texts = [d.page_content for d in docs]
    embs, masks = colbert.encode_documents(texts)

    exact = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    exact.append(embs, masks)
    quant = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32",
                       quantize="int8")
    quant.append(embs, masks)
    assert quant._tokens.dtype == np.int8

    reranker = LateInteractionReranker(colbert, use_pallas=False)
    s_exact = reranker.maxsim_scores_from_store(["奔驰GLE"], list(range(5)), exact)
    s_quant = reranker.maxsim_scores_from_store(["奔驰GLE"], list(range(5)), quant)
    np.testing.assert_allclose(s_quant, s_exact, rtol=0.05)
    # quantization can flip near-ties; top-1 must agree
    assert int(np.argmax(s_exact[0])) == int(np.argmax(s_quant[0]))


def test_int8_store_save_load(tmp_path, colbert):
    from automative_rag_tpu.rerank.token_store import TokenStore

    store = TokenStore(dim=colbert.dim, max_doc_length=32,
                       device_dtype="float32", quantize="int8")
    embs, masks = colbert.encode_documents(["量化持久化"])
    store.append(embs, masks)
    store.save(str(tmp_path))
    restored = TokenStore.load(str(tmp_path), dim=colbert.dim, max_doc_length=32,
                               device_dtype="float32")
    assert restored.quantize == "int8" and restored.rows == 1
    np.testing.assert_array_equal(restored._tokens, store._tokens)


def test_residual2_compression(colbert):
    from automative_rag_tpu.rerank.token_store import TokenStore

    docs = [Document(page_content=f"理想L{i} 2023款测试文本内容 {i}") for i in range(12)]
    embs, masks = colbert.encode_documents([d.page_content for d in docs])

    exact = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    exact.append(embs, masks)
    store = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    store.append(embs, masks)
    info = store.compress(k_centroids=32, n_iters=6, bits=4)
    assert store.quantize == "residual2"
    # tiny dims: centroid-table overhead dominates; ~4x at D=1024 with 4-bit
    assert info["compression"] > 2.0, info

    reranker = LateInteractionReranker(colbert, use_pallas=False)
    s_exact = reranker.maxsim_scores_from_store(["理想L7"], list(range(12)), exact)
    s_comp = reranker.maxsim_scores_from_store(["理想L7"], list(range(12)), store)
    # scores correlate strongly and top-1 agrees
    corr = np.corrcoef(s_exact[0], s_comp[0])[0, 1]
    assert corr > 0.95, corr
    assert int(np.argmax(s_exact[0])) == int(np.argmax(s_comp[0]))

    # appends after compression encode against the trained centroids
    more, more_masks = colbert.encode_documents(["新增文档 蔚来ES8"])
    store.append(more, more_masks)
    assert store.rows == 13
    docs_t, m = store.gather([12])
    assert docs_t.shape == (32, 1, colbert.dim)


def test_residual2_save_load(tmp_path, colbert):
    from automative_rag_tpu.rerank.token_store import TokenStore

    store = TokenStore(dim=colbert.dim, max_doc_length=32, device_dtype="float32")
    embs, masks = colbert.encode_documents(["压缩持久化测试一", "压缩持久化测试二"])
    store.append(embs, masks)
    store.compress(k_centroids=16, n_iters=4)
    before = store.gather([0, 1])[0]
    store.save(str(tmp_path))

    restored = TokenStore.load(str(tmp_path), dim=colbert.dim, max_doc_length=32,
                               device_dtype="float32")
    assert restored.quantize == "residual2" and restored.rows == 2
    after = restored.gather([0, 1])[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after), rtol=1e-3)


def test_on_device_int8_encode_matches_host_quantization():
    """encode_documents_int8 (on-device quantization, int8 fetch) must
    reproduce the host path (fp16 fetch → TokenStore int8 quantization)
    closely enough that MaxSim scores agree."""
    import jax.numpy as jnp

    from automative_rag_tpu.models import ColBERTEncoder, EncoderConfig
    from automative_rag_tpu.ops.maxsim import maxsim_scores

    enc = ColBERTEncoder(config=EncoderConfig.tiny(), max_query_length=16,
                         max_doc_length=32)
    texts = ["宝马X5 中大型SUV", "特斯拉Model 3 续航606公里", "丰田凯美瑞"]

    host = TokenStore(dim=enc.dim, max_doc_length=32, quantize="int8",
                      device_dtype="float32")
    embs, masks = enc.encode_documents(texts)
    host.append(embs, masks)

    dev = TokenStore(dim=enc.dim, max_doc_length=32, quantize="int8",
                     device_dtype="float32")
    quant, scales, masks2 = enc.encode_documents_int8(texts)
    dev.append_quantized(quant, scales, masks2)

    assert dev.rows == host.rows
    np.testing.assert_array_equal(dev._masks, host._masks)
    # int8 codes match up to rounding ties of the fp16 round-trip
    mismatch = (dev._tokens != host._tokens).mean()
    assert mismatch < 0.02, mismatch

    q_emb, q_mask = enc.encode_queries(["SUV 续航"])
    rows = [0, 1, 2]
    s_host = maxsim_scores(
        jnp.asarray(q_emb, jnp.float32), jnp.asarray(q_mask),
        *(lambda d, m: (jnp.asarray(d), m))(*host.gather(rows)),
        token_major=True, use_pallas=False)
    s_dev = maxsim_scores(
        jnp.asarray(q_emb, jnp.float32), jnp.asarray(q_mask),
        *(lambda d, m: (jnp.asarray(d), m))(*dev.gather(rows)),
        token_major=True, use_pallas=False)
    np.testing.assert_allclose(np.asarray(s_dev), np.asarray(s_host),
                               rtol=0.02, atol=0.05)


def test_append_quantized_requires_int8_store():
    store = TokenStore(dim=16, max_doc_length=8)
    with pytest.raises(ValueError):
        store.append_quantized(np.zeros((1, 8, 16), np.int8),
                               np.zeros((1, 8), np.float16),
                               np.ones((1, 8), bool))


def test_append_device_matches_quantized(colbert):
    """append_device (slab stays in HBM, lazy host sync) must be
    indistinguishable from append_quantized: gathers, rows, persistence."""
    import jax.numpy as jnp

    texts = [f"设备驻留测试 {i}" for i in range(5)]
    quant, scales, masks = colbert.encode_documents_int8(texts)
    dev_q, dev_s, masks2 = colbert.encode_documents_device(texts)
    assert isinstance(dev_q, jnp.ndarray)
    np.testing.assert_array_equal(np.asarray(dev_q), quant)

    ref = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                     device_dtype="float32")
    ref.append_quantized(quant, scales, masks)
    dev = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                     device_dtype="float32")
    dev.append_device(dev_q, dev_s, masks2)
    assert dev.rows == ref.rows == 5
    assert dev._pending_rows == 5  # host sync is lazy

    for rows in ([2, 0, 4], [1]):
        sq, ss, sm = dev.gather_for_maxsim(rows)
        rq, rs, rm = ref.gather_for_maxsim(rows)
        np.testing.assert_array_equal(np.asarray(sq), np.asarray(rq))
        np.testing.assert_allclose(np.asarray(ss), np.asarray(rs), rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(sm), np.asarray(rm))


def test_append_device_then_host_append_order(colbert):
    """Host appends after device appends must sync first (row order)."""
    embs, masks = colbert.encode_documents(["先设备", "后主机"])
    q, s, m = colbert.encode_documents_device(["先设备"])

    store = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                       device_dtype="float32")
    store.append_device(q, s, m)
    store.append(embs[1:], masks[1:])  # host path → forces sync, lands row 1
    assert store.rows == 2 and store._pending_rows == 0

    ref = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                     device_dtype="float32")
    ref.append(embs, masks)
    got, _, _ = store.gather_for_maxsim([0, 1])
    want, _, _ = ref.gather_for_maxsim([0, 1])
    # row 0 came through the device path (fp16-free), row 1 host: codes can
    # differ by rounding ties only
    assert (np.asarray(got) != np.asarray(want)).mean() < 0.02


def test_append_device_save_syncs(tmp_path, colbert):
    q, s, m = colbert.encode_documents_device(["持久化同步", "第二行"])
    store = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                       device_dtype="float32")
    store.append_device(q, s, m)
    assert store._tokens.shape[0] == 0  # nothing on the host yet
    store.save(str(tmp_path))
    restored = TokenStore.load(str(tmp_path), dim=colbert.dim,
                               max_doc_length=32, device_dtype="float32")
    assert restored.quantize == "int8" and restored.rows == 2
    np.testing.assert_array_equal(
        restored._tokens, np.asarray(q).astype(np.int8))


def test_append_device_budget_fallback(colbert):
    """Over-budget stores fall back to the host path transparently."""
    q, s, m = colbert.encode_documents_device(["预算回退"])
    store = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                       device_dtype="float32", device_budget_bytes=64)
    store.append_device(q, s, m)
    assert store.rows == 1 and store._pending_rows == 0
    assert store._buf is None and store._tokens.shape[0] == 1
    docs_t, masks = store.gather([0])
    assert docs_t.shape == (32, 1, colbert.dim)


def test_append_device_buffer_growth(colbert):
    """Appends past the initial capacity grow the buffer in place."""
    store = TokenStore(dim=colbert.dim, max_doc_length=32, quantize="int8",
                       device_dtype="float32")
    import automative_rag_tpu.rerank.token_store as ts_mod

    orig = TokenStore._grow_cap
    TokenStore._grow_cap = lambda self, rows: max(rows, 2)  # tiny capacity
    try:
        for i in range(4):
            q, s, m = colbert.encode_documents_device([f"增长 {i}"])
            store.append_device(q, s, m)
    finally:
        TokenStore._grow_cap = orig
    assert store.rows == 4
    sq, ss, sm = store.gather_for_maxsim([0, 3])
    assert np.asarray(sq).shape == (32, 2, colbert.dim)
    # host sync after growth still reproduces every row in order
    store.drop_device_cache()
    assert store._tokens.shape[0] == 4 and store._pending_rows == 0


def test_sync_reads_back_from_buffer_without_slab_retention():
    """Device appends keep ONE HBM copy (the buffer); sync slices rows
    back out of it and host bytes match a host-side append exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    store = TokenStore(dim=16, max_doc_length=4, quantize="int8")
    twin = TokenStore(dim=16, max_doc_length=4, quantize="int8")
    embs = rng.normal(size=(6, 4, 16)).astype(np.float32)
    masks = np.ones((6, 4), bool)
    scales = np.abs(embs).max(axis=2) / 127.0
    quant = np.clip(np.round(embs / np.maximum(scales, 1e-8)[:, :, None]),
                    -127, 127).astype(np.int8)
    store.append_device(jnp.asarray(quant), jnp.asarray(scales), masks)
    twin.append_quantized(quant, scales.astype(np.float16), masks)
    assert store._pending_rows == 6
    with store._mutex:
        store._sync_host_locked()
    np.testing.assert_array_equal(store._tokens, twin._tokens)
    np.testing.assert_array_equal(store._scales, twin._scales)
    assert store._pending_rows == 0


def test_load_rejects_geometry_drift(tmp_path):
    store = TokenStore(dim=8, max_doc_length=4, quantize="int8")
    embs = np.random.default_rng(0).normal(size=(3, 4, 8)).astype(np.float32)
    store.append(embs, np.ones((3, 4), bool))
    store.save(str(tmp_path))
    with pytest.raises(ValueError, match="geometry"):
        TokenStore.load(str(tmp_path), dim=8, max_doc_length=6,
                        quantize="int8")
