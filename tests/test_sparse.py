"""Sparse (lexical) retrieval arm — encoder, index kernel vs numpy oracle,
idf, persistence, compaction alignment, and engine integration.

The arm covers bge-m3's sparse head (the reference deploys only the dense
head — this is a capability the flagship encoder family has that the
reference leaves on the table)."""

import numpy as np
import pytest

from automative_rag_tpu.config.settings import Settings
from automative_rag_tpu.documents.schema import Document
from automative_rag_tpu.engine.retrieval import RetrievalEngine
from automative_rag_tpu.index.flat import FlatIndex
from automative_rag_tpu.index.sparse import SparseIndex, _score_rows_np
from automative_rag_tpu.models.bge_m3 import DenseEmbedder
from automative_rag_tpu.models.encoder import EncoderConfig
from automative_rag_tpu.models.sparse import SPARSE_PAD, SparseEncoder


@pytest.fixture(scope="module")
def dense():
    return DenseEmbedder(config=EncoderConfig.tiny(hidden_size=64))


@pytest.fixture(scope="module")
def encoder(dense):
    return SparseEncoder(dense, top_terms=16, query_terms=8)


# --------------------------------------------------------------- encoder

def test_encoder_lexical_mode_and_shapes(encoder):
    assert encoder.mode == "lexical" and encoder.use_idf
    ids, w = encoder.encode_documents(["宝马X5的油耗是8.9升", "hello world"])
    assert ids.shape == (2, 16) and w.shape == (2, 16)
    assert ids.dtype == np.int32 and w.dtype == np.float32
    # padded tail: id SPARSE_PAD carries zero weight
    assert ((ids == SPARSE_PAD) == (w == 0.0)).all()
    # real terms are non-negative token ids with positive weights
    assert (ids[ids != SPARSE_PAD] >= 0).all()
    assert (w[ids != SPARSE_PAD] > 0).all()


def test_encoder_tf_weighting(encoder):
    # a repeated term outweighs a single occurrence (sqrt-tf)
    ids1, w1 = encoder.encode_query("油耗 油耗 油耗 价格")
    by_id = dict(zip(ids1.tolist(), w1.tolist()))
    ids_a, _ = encoder.encode_query("油耗")
    ids_b, _ = encoder.encode_query("价格")
    t_a = [t for t in ids_a if t != SPARSE_PAD]
    t_b = [t for t in ids_b if t != SPARSE_PAD]
    # unigram ids for 油耗 appear among the query's terms with higher weight
    assert max(by_id.get(t, 0.0) for t in t_a) > max(
        by_id.get(t, 0.0) for t in t_b)


def test_encoder_excludes_special_tokens(encoder):
    ids, w = encoder.encode_documents([""])
    assert (ids[0] == SPARSE_PAD).all() and (w[0] == 0.0).all()


def test_encoder_shared_terms_match(encoder):
    """Query and document containing the same rare string share term ids —
    the whole point of the lexical arm."""
    d_ids, _ = encoder.encode_documents(["型号 xDrive40i 的配置"])
    q_ids, _ = encoder.encode_query("xDrive40i")
    doc_terms = set(d_ids[0][d_ids[0] != SPARSE_PAD].tolist())
    q_terms = set(q_ids[q_ids != SPARSE_PAD].tolist())
    assert doc_terms & q_terms


# ----------------------------------------------------------------- index

def _random_corpus(encoder, n=40, seed=0):
    rng = np.random.default_rng(seed)
    vocab_words = ["油耗", "功率", "扭矩", "加速", "价格", "内饰", "座椅",
                   "安全", "辅助", "驾驶", "续航", "充电", "电池", "悬挂"]
    texts = [
        " ".join(rng.choice(vocab_words, size=rng.integers(3, 9)))
        for _ in range(n)
    ]
    return texts, encoder.encode_documents(texts)


def test_index_search_matches_numpy_oracle(encoder):
    texts, (ids, w) = _random_corpus(encoder, n=40)
    idx = SparseIndex(top_terms=encoder.top_terms)
    idx.append(ids, w)
    q_ids, q_w = encoder.encode_query("油耗 功率 扭矩")
    got = idx.search(q_ids, q_w, k=10)
    oracle = _score_rows_np(ids, w, q_ids, q_w)
    want = sorted(
        [(int(r), float(s)) for r, s in enumerate(oracle) if s > 0],
        key=lambda x: -x[1],
    )[:10]
    assert [r for r, _ in got] == [r for r, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=2e-2)


def test_index_live_append_tail(encoder):
    """Rows appended after the slab stages still rank (host tail merge)."""
    texts, (ids, w) = _random_corpus(encoder, n=20)
    idx = SparseIndex(top_terms=encoder.top_terms)
    idx.append(ids, w)
    q_ids, q_w = encoder.encode_query("独特词汇测试")
    idx.search(q_ids, q_w, k=5)  # stages the slab
    assert idx.stats()["staged_rows"] == 20
    t_ids, t_w = encoder.encode_documents(["独特词汇测试 独特词汇测试"])
    idx.append(t_ids, t_w)
    got = idx.search(q_ids, q_w, k=3)
    assert got and got[0][0] == 20  # the fresh row wins
    assert idx.stats()["staged_rows"] == 20  # slab survived the append


def test_index_idf_favors_rare_terms(encoder):
    idx = SparseIndex(top_terms=encoder.top_terms)
    common = ["油耗 测试"] * 30 + ["罕见词 出现"]
    ids, w = encoder.encode_documents(common)
    idx.append(ids, w)
    q_ids, _ = encoder.encode_query("油耗 罕见词")
    idf = idx.idf(q_ids)
    terms = {int(t): float(v) for t, v in zip(q_ids, idf) if t != SPARSE_PAD}
    rare_ids, _ = encoder.encode_query("罕见词")
    common_ids, _ = encoder.encode_query("油耗")
    rare = [terms[int(t)] for t in rare_ids if int(t) in terms]
    freq = [terms[int(t)] for t in common_ids if int(t) in terms]
    assert min(rare) > max(freq)


def test_index_save_load_select_rows(tmp_path, encoder):
    texts, (ids, w) = _random_corpus(encoder, n=12)
    idx = SparseIndex(top_terms=encoder.top_terms)
    idx.append(ids, w)
    idx.save(str(tmp_path))
    restored = SparseIndex.load(str(tmp_path))
    assert restored.rows == 12 and restored.top_terms == encoder.top_terms
    assert restored._df == idx._df
    q_ids, q_w = encoder.encode_query(texts[3])
    assert [r for r, _ in restored.search(q_ids, q_w, k=3)] == \
        [r for r, _ in idx.search(q_ids, q_w, k=3)]
    # compaction-style reorder
    keep = [5, 3, 11]
    restored.select_rows(keep)
    assert restored.rows == 3
    np.testing.assert_array_equal(restored._ids, idx._ids[keep])
    got = restored.search(q_ids, q_w, k=1)
    assert got and got[0][0] == 1  # texts[3] now at row 1


# ---------------------------------------------------------------- engine

@pytest.fixture()
def engine_with_sparse(dense):
    enc = SparseEncoder(dense, top_terms=24, query_terms=12)
    index = FlatIndex(dim=dense.dim)
    sparse = SparseIndex(top_terms=24)
    eng = RetrievalEngine(
        dense, index, reranker=None,
        sparse_index=sparse, sparse_encoder=enc, sparse_k=5,
    )
    docs = [
        Document(page_content="宝马X5 xDrive40i 的百公里油耗是8.9升",
                 metadata={"manufacturer": "宝马", "model": "X5", "year": 2023}),
        Document(page_content="奔驰GLE 450 的百公里油耗是9.3升",
                 metadata={"manufacturer": "奔驰", "model": "GLE", "year": 2022}),
        Document(page_content="奥迪Q7 55TFSI 的最大功率250千瓦",
                 metadata={"manufacturer": "奥迪", "model": "Q7", "year": 2023}),
        Document(page_content="比亚迪汉EV 的续航里程605公里",
                 metadata={"manufacturer": "比亚迪", "model": "汉", "year": 2023}),
    ]
    ids = eng.add_documents(docs)
    return eng, docs, ids


def test_engine_appends_sparse_rows(engine_with_sparse):
    eng, docs, ids = engine_with_sparse
    assert eng.sparse_index.rows == eng.index.total_rows == 4


def test_engine_sparse_recall_exact_term(engine_with_sparse):
    """An exact rare designation reaches the candidates through the sparse
    arm even when the dense arm is weak (tiny-dim hashed dense)."""
    eng, docs, ids = engine_with_sparse
    ranked = eng.retrieve("xDrive40i 多少油耗", rerank=False)
    assert ranked
    assert any("xDrive40i" in d.page_content for d, _ in ranked)
    # fused scores stay in the cosine-like presentation range
    assert all(-1.0 <= s <= 1.0 + 1e-6 for _, s in ranked)
    assert "sparse_s" in eng.last_timings


def test_engine_sparse_respects_filter(engine_with_sparse):
    eng, docs, ids = engine_with_sparse
    ranked = eng.retrieve(
        "xDrive40i 油耗", metadata_filter={"manufacturer": "奔驰"},
        rerank=False,
    )
    assert all(d.metadata["manufacturer"] == "奔驰" for d, _ in ranked)


def test_engine_sparse_skips_deleted(engine_with_sparse):
    eng, docs, ids = engine_with_sparse
    eng.index.delete_by_ids([ids[0]])  # the xDrive40i doc
    ranked = eng.retrieve("xDrive40i 油耗", rerank=False)
    assert all("xDrive40i" not in d.page_content for d, _ in ranked)


def test_engine_sparse_misalignment_disables(engine_with_sparse):
    """Rows out of alignment (should be impossible) → the arm disengages
    rather than returning wrong documents."""
    eng, docs, ids = engine_with_sparse
    eng.sparse_index.append(
        np.full((1, 24), -1, np.int32), np.zeros((1, 24), np.float32))
    ranked = eng.retrieve("油耗", rerank=False)
    assert ranked  # dense arm still answers
    assert eng.last_timings.get("sparse_candidates") is None


# ------------------------------------------------------------- app level

def test_app_sparse_roundtrip_and_compaction(tmp_path):
    """Full-stack invariants: ingest pairs sparse rows with index rows,
    save/load restores them, compaction keeps alignment, and an exact-term
    query rides the arm end to end."""
    from automative_rag_tpu.app import RAGApplication

    settings = Settings(
        index_kind="flat",
        data_dir=str(tmp_path),
        index_dir=str(tmp_path / "index"),
        sparse_enabled=True,
    )
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    try:
        jobs = [
            app.ingest_text("宝马X5 xDrive40i 的油耗是8.9升",
                            {"manufacturer": "宝马", "model": "X5"}),
            app.ingest_text("奔驰GLE 450 的油耗是9.3升",
                            {"manufacturer": "奔驰", "model": "GLE"}),
            app.ingest_text("奥迪Q7 55TFSI 的功率250千瓦",
                            {"manufacturer": "奥迪", "model": "Q7"}),
        ]
        for j in jobs:
            assert app.tracker.wait_for_terminal(j, timeout=60) == "completed"
        assert app.sparse_index.rows == app.index.total_rows == 3
        assert app.health()["sparse"]["rows"] == 3

        ranked = app.engine.retrieve("xDrive40i 油耗", rerank=False)
        assert any("xDrive40i" in d.page_content for d, _ in ranked)

        # save → fresh app → the arm still answers
        app.save_index()
        app.shutdown()
        app2 = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
        try:
            app2.load_index()
            assert app2.sparse_index.rows == app2.index.total_rows == 3
            ranked = app2.engine.retrieve("55TFSI 功率", rerank=False)
            assert any("55TFSI" in d.page_content for d, _ in ranked)

            # delete + compact: alignment survives, query still exact
            app2.index.delete_by_filter({"manufacturer": "奔驰"})
            info = app2.compact_index()
            assert "error" not in info
            assert app2.sparse_index.rows == app2.index.total_rows == 2
            ranked = app2.engine.retrieve("xDrive40i", rerank=False)
            assert any("xDrive40i" in d.page_content for d, _ in ranked)
            assert all("GLE" not in d.page_content for d, _ in ranked)
        finally:
            app2.shutdown()
    finally:
        try:
            app.shutdown()
        except Exception:
            pass


def test_engine_sparse_with_sharded_index(dense):
    """The arm works on sharded index kinds too — rows_match/host_scores
    come from the FlatIndex host mirrors that sharded kinds inherit."""
    from automative_rag_tpu.parallel import ShardedFlatIndex, make_mesh

    enc = SparseEncoder(dense, top_terms=24, query_terms=12)
    index = ShardedFlatIndex(dim=dense.dim, mesh=make_mesh(), axis_name="shard")
    sparse = SparseIndex(top_terms=24)
    eng = RetrievalEngine(
        dense, index, reranker=None,
        sparse_index=sparse, sparse_encoder=enc, sparse_k=4,
    )
    docs = [
        Document(page_content=f"第{i}号文档 常规内容 油耗数据",
                 metadata={"manufacturer": "宝马"})
        for i in range(15)
    ] + [
        Document(page_content="特殊型号 xDrive40i 的规格说明",
                 metadata={"manufacturer": "宝马"}),
    ]
    eng.add_documents(docs)
    assert sparse.rows == index.total_rows == 16
    ranked = eng.retrieve("xDrive40i 规格", rerank=False)
    assert any("xDrive40i" in d.page_content for d, _ in ranked)


def test_rows_match_bounds_stale_rows(dense):
    """rows_match treats rows beyond the (possibly just-compacted) table as
    not-live instead of raising — a sparse search snapshot can race a
    concurrent compaction."""
    index = FlatIndex(dim=dense.dim)
    vecs = np.random.default_rng(0).normal(size=(3, dense.dim)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={"manufacturer": "宝马"})
            for i in range(3)]
    index.add(vecs, docs)
    ok = index.rows_match([0, 2, 7, 100], {"manufacturer": "宝马"})
    assert ok.tolist() == [True, True, False, False]


def test_load_syncs_encoder_width(tmp_path, dense):
    """A checkpoint saved at a different SPARSE_TOP_TERMS keeps appends
    row-shaped: the encoder follows the restored width."""
    from automative_rag_tpu.app import RAGApplication

    settings = Settings(
        index_kind="flat", data_dir=str(tmp_path),
        index_dir=str(tmp_path / "index"),
        sparse_enabled=True, sparse_top_terms=16,
    )
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    try:
        j = app.ingest_text("宝马X5 xDrive40i 油耗8.9升", {"manufacturer": "宝马"})
        assert app.tracker.wait_for_terminal(j, timeout=60) == "completed"
        app.save_index()
    finally:
        app.shutdown()

    import dataclasses
    settings2 = dataclasses.replace(settings, sparse_top_terms=48)
    app2 = RAGApplication(settings=settings2, tiny=True, tiny_dim=64)
    try:
        app2.load_index()
        assert app2.sparse_index.top_terms == 16
        assert app2.sparse_encoder.top_terms == 16
        # post-restore ingest appends at the restored width
        j = app2.ingest_text("奔驰GLE 油耗9.3升", {"manufacturer": "奔驰"})
        assert app2.tracker.wait_for_terminal(j, timeout=60) == "completed"
        assert app2.sparse_index.rows == app2.index.total_rows == 2
    finally:
        app2.shutdown()


def test_transformer_mode_with_sparse_head(tmp_path):
    """With an encoder checkpoint + a sparse_linear head on disk, the
    encoder switches to the learned bge-m3 path: per-token relu weights,
    max-aggregated per term id, specials excluded, idf off."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from test_weight_loading import _synthesize_encoder_ckpt

    config = EncoderConfig.tiny()
    _synthesize_encoder_ckpt(tmp_path, config)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(config.hidden_size,)).astype(np.float32)
    save_file({"sparse_linear.weight": w[None, :],
               "sparse_linear.bias": np.zeros(1, np.float32)},
              str(tmp_path / "sparse_linear.safetensors"))

    d = DenseEmbedder(config=config, weights_path=str(tmp_path), max_length=16)
    assert d.pretrained
    enc = SparseEncoder(d, top_terms=8, query_terms=8)
    assert enc.mode == "transformer" and not enc.use_idf

    text = "测试 测试 油耗"
    ids, weights = enc.encode_documents([text])
    live = ids[0] != SPARSE_PAD
    assert live.any() and (weights[0][live] > 0).all()

    # oracle: the per-token weights from the same jitted head (the CPU
    # backend's low-precision matmul flips near-zero relu signs between
    # jit and eager, so an eager re-forward is not a stable reference);
    # what's under test is the term extraction/aggregation on top
    tok_ids, tok_mask = d.tokenizer.encode_batch([text], enc.max_length)
    token_w = np.asarray(
        enc._token_weights_fn(d.params, tok_ids, tok_mask), np.float32)[0]
    specials = {d.tokenizer.pad_token_id, d.tokenizer.cls_token_id,
                d.tokenizer.sep_token_id}
    want = {}
    for t, tw in zip(tok_ids[0], token_w):
        t = int(t)
        if tw > 0 and t not in specials:
            want[t] = max(want.get(t, 0.0), float(tw))
    got = {int(t): float(v) for t, v in zip(ids[0][live], weights[0][live])}
    top = dict(sorted(want.items(), key=lambda kv: -kv[1])[:8])
    assert set(got) == set(top)
    for t in got:
        np.testing.assert_allclose(got[t], top[t], rtol=1e-4)


# ------------------------------------------------------------ batch path

def test_index_search_batch_matches_single(encoder):
    """One batched dispatch must return exactly the per-query results,
    including host-tail merging."""
    rng = np.random.default_rng(7)
    t = encoder.top_terms
    ids = rng.integers(0, 300, size=(120, t)).astype(np.int32)
    weights = np.abs(rng.normal(0.8, 0.4, size=(120, t))).astype(np.float32)
    idx = SparseIndex(top_terms=t, device_dtype="float32")
    idx.append(ids, weights)
    queries = []
    for r in (2, 17, 44, 80):
        q_ids = ids[r, :10].astype(np.int32)
        q_w = np.abs(rng.normal(1.0, 0.3, size=10)).astype(np.float32)
        queries.append((q_ids, q_w))
    # stage the slab, then append a live tail so both paths must merge it
    idx.search(*queries[0], k=3)
    tail_ids = rng.integers(0, 300, size=(9, t)).astype(np.int32)
    tail_w = np.abs(rng.normal(0.8, 0.4, size=(9, t))).astype(np.float32)
    idx.append(tail_ids, tail_w)
    assert idx._device is not None
    got = idx.search_batch(
        np.stack([q for q, _ in queries]),
        np.stack([w for _, w in queries]), k=8)
    for (q_ids, q_w), batch_hits in zip(queries, got):
        single = idx.search(q_ids, q_w, k=8)
        assert [r for r, _ in batch_hits] == [r for r, _ in single]
        np.testing.assert_allclose(
            [v for _, v in batch_hits], [v for _, v in single], rtol=1e-5)


def test_engine_retrieve_batch_uses_one_sparse_dispatch(engine_with_sparse):
    """retrieve_batch must produce the same candidates as per-query
    retrieve with the sparse arm engaged (batched kernel parity), and the
    exact-term union must survive the batch path."""
    eng, docs, ids = engine_with_sparse
    queries = ["xDrive40i 多少油耗", "比亚迪汉EV续航", "最大功率多少千瓦"]
    batch = eng.retrieve_batch(queries, rerank=False)
    assert len(batch) == 3
    singles = [eng.retrieve(q, rerank=False) for q in queries]
    for got, want in zip(batch, singles):
        assert [d.page_content for d, _ in got] == \
            [d.page_content for d, _ in want]
    assert any("xDrive40i" in d.page_content for d, _ in batch[0])


def test_explain_overlap_names_shared_terms(encoder):
    matches = encoder.explain_overlap(
        "xDrive40i 的油耗是多少", "宝马X5 xDrive40i 的百公里油耗是8.9升")
    assert matches, "shared terms must be reported"
    terms = [m["term"] for m in matches]
    assert any("xdrive" in t for t in terms), terms  # subword-tokenized
    # sorted by contribution, all positive
    contribs = [m["contribution"] for m in matches]
    assert contribs == sorted(contribs, reverse=True)
    assert all(c > 0 for c in contribs)
    # no overlap → empty
    assert encoder.explain_overlap("毫无关联的词汇啊", "something else entirely") == [] or \
        all(m["contribution"] >= 0 for m in
            encoder.explain_overlap("毫无关联的词汇啊", "something else entirely"))


def test_pallas16_variant_matches_32bit():
    """The 16-bit scan (dense exact remap + bf16 accumulator) must rank
    like the 32-bit path up to bf16(q_w) rounding: same rows except
    near-tie reorders, scores within ~0.4% (one bf16 ulp)."""
    import numpy as np

    from automative_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(0)
    n, T, Q = 3000, 48, 32
    vocab = rng.choice(100_000, size=5000, replace=False)
    ids = vocab[rng.integers(0, 5000, size=(n, T))].astype(np.int32)
    w = rng.random((n, T)).astype(np.float32)
    q_ids = vocab[rng.integers(0, 5000, size=Q)].astype(np.int32)
    q_ids[-2:] = (-1, 999_999_999)  # pad + never-seen term
    q_w = rng.random(Q).astype(np.float32)

    idx32 = SparseIndex(top_terms=T)
    idx32.append(ids, w)
    idx32.scan_variant = "pallas"
    idx16 = SparseIndex(top_terms=T)
    idx16.append(ids, w)
    idx16.scan_variant = "pallas16"
    assert idx16._device_state()[0].dtype == np.int16

    r32 = idx32.search(q_ids, q_w, k=20)
    r16 = idx16.search(q_ids, q_w, k=20)
    rows32 = {r for r, _ in r32}
    rows16 = {r for r, _ in r16}
    assert len(rows32 & rows16) >= 18, (r32, r16)
    by_row32 = dict(r32)
    for row, v16 in r16:
        if row in by_row32:
            assert abs(by_row32[row] - v16) <= 4e-3 * max(
                abs(by_row32[row]), 1e-6)

    # batched path agrees with itself and the 32-bit batch
    qb = np.stack([q_ids, np.roll(q_ids, 3)])
    qwb = np.stack([q_w, q_w * 0.5])
    for a, b in zip(idx32.search_batch(qb, qwb, k=10),
                    idx16.search_batch(qb, qwb, k=10)):
        assert len({r for r, _ in a} & {r for r, _ in b}) >= 8


def test_pallas16_tail_and_vocab_fallback():
    """Tail rows score on the host with RAW ids (terms unknown to the
    staged 16-bit vocab must still match tail rows); a vocabulary wider
    than the int16 budget falls back to the 32-bit slab."""
    import numpy as np

    import automative_rag_tpu.index.sparse as sp
    from automative_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(1)
    n, T = 500, 48
    ids = rng.integers(0, 3000, size=(n, T)).astype(np.int32)
    w = rng.random((n, T)).astype(np.float32)
    idx = SparseIndex(top_terms=T)
    idx.append(ids, w)
    idx.scan_variant = "pallas16"
    idx._device_state()  # stage 16-bit
    new_ids = np.full((1, T), -1, np.int32)
    new_ids[0, 0] = 999_999_999
    new_w = np.zeros((1, T), np.float32)
    new_w[0, 0] = 5.0
    idx.append(new_ids, new_w)  # tail (below fold threshold)
    hits = idx.search(np.array([999_999_999], np.int32),
                      np.array([2.0], np.float32), k=3)
    assert hits and hits[0][0] == n, hits

    # vocab fallback: > _DENSE16_MAX distinct terms → int32 slab
    wide = SparseIndex(top_terms=T)
    m = (sp._DENSE16_MAX // T) + 8
    wide_ids = np.arange(m * T, dtype=np.int32).reshape(m, T)
    wide.append(wide_ids, np.ones((m, T), np.float32))
    wide.scan_variant = "pallas16"
    assert wide._device_state()[0].dtype == np.int32
    hits = wide.search(np.array([5], np.int32),
                       np.array([1.0], np.float32), k=2)
    assert hits and hits[0][0] == 0


def test_pallas_lut_variant_matches_exactly():
    """The hash-LUT scan ("pallas_lut") is EXACT vs the compare-unroll
    kernel: per element at most one query term matches, so both kernels
    accumulate the identical f32 values in the identical order — scores
    must be bitwise equal, rows identical."""
    from automative_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(7)
    n, T, Q = 3000, 48, 32
    vocab = rng.choice(2_000_000_000, size=5000, replace=False)
    ids = vocab[rng.integers(0, 5000, size=(n, T))].astype(np.int32)
    w = rng.random((n, T)).astype(np.float32)
    q_ids = vocab[rng.integers(0, 5000, size=Q)].astype(np.int32)
    q_ids[-2:] = (-1, 1_999_999_999)  # pad + never-seen term
    q_w = rng.random(Q).astype(np.float32)
    q_w[-2] = 0.0

    base = SparseIndex(top_terms=T)
    base.append(ids, w)
    base.scan_variant = "pallas"
    lut = SparseIndex(top_terms=T)
    lut.append(ids, w)
    lut.scan_variant = "pallas_lut"

    r_base = base.search(q_ids, q_w, k=20)
    r_lut = lut.search(q_ids, q_w, k=20)
    assert [r for r, _ in r_base] == [r for r, _ in r_lut]
    for (_, a), (_, b) in zip(r_base, r_lut):
        assert a == b

    # batched: rows and scores identical to the single-query LUT path
    qb = np.stack([q_ids, np.roll(q_ids, 5)])
    qwb = np.stack([q_w, q_w * 0.5])
    batch = lut.search_batch(qb, qwb, k=10)
    for i in range(2):
        single = lut.search(qb[i], qwb[i], k=10)
        assert batch[i] == single


def test_pallas_lut_collisions_and_overflow():
    """Query terms sharing a hash slot (id ≡ id' mod 4096) flow into the
    static residual slots; overflow beyond LUT_RESIDUALS falls back to the
    compare-unroll kernel — both must score exactly."""
    from automative_rag_tpu.index.sparse import SparseIndex
    from automative_rag_tpu.ops.sparse_scan import (
        LUT_RESIDUALS, build_query_lut)

    T = 48
    width = 4096
    n = 300
    rng = np.random.default_rng(3)
    # corpus rows each hold one of the colliding terms
    collide = np.array([100 + j * width for j in range(LUT_RESIDUALS + 2)],
                       np.int32)
    ids = np.full((n, T), -1, np.int32)
    w = np.zeros((n, T), np.float32)
    ids[:, 0] = collide[rng.integers(0, len(collide), size=n)]
    w[:, 0] = 1.0

    # 1 table slot + LUT_RESIDUALS residuals: builds
    q_ok = collide[: LUT_RESIDUALS + 1]
    built = build_query_lut(q_ok, np.ones(len(q_ok), np.float32), width)
    assert built is not None
    tab_i, _, r_ids, _ = built
    assert tab_i[0, 100] == 100
    assert sorted(r_ids[0].tolist()) == sorted(q_ok[1:].tolist())

    # one more collision overflows → build returns None
    assert build_query_lut(
        collide, np.ones(len(collide), np.float32), width) is None

    # and the index path still answers exactly via the fallback
    idx = SparseIndex(top_terms=T)
    idx.append(ids, w)
    idx.scan_variant = "pallas_lut"
    q_w = np.linspace(1.0, 2.0, len(collide)).astype(np.float32)
    hits = idx.search(collide, q_w, k=10)
    oracle = _score_rows_np(ids, w, collide, q_w)
    top = np.argsort(-oracle, kind="stable")[:10]
    assert {r for r, _ in hits} <= set(np.where(oracle > 0)[0].tolist())
    assert hits[0][1] == oracle[top[0]]


def test_query_width_bucketing_is_exact():
    """Pad/zero-weight terms contribute exactly 0, so trimming the query
    to a power-of-two bucket must not change any score; interspersed pads
    compact forward."""
    from automative_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(11)
    n, T = 800, 48
    ids = rng.integers(0, 40_000, size=(n, T)).astype(np.int32)
    w = rng.random((n, T)).astype(np.float32)
    idx = SparseIndex(top_terms=T)
    idx.append(ids, w)

    # 5 real terms scattered through a 32-wide padded query
    q_ids = np.full(32, -1, np.int32)
    q_w = np.zeros(32, np.float32)
    slots = [0, 7, 13, 21, 30]
    for i, s in enumerate(slots):
        q_ids[s] = ids[i, 0]
        q_w[s] = 1.0 + i
    # plus a zero-weight real id that must also trim away
    q_ids[3] = ids[9, 0]

    t_ids, t_w = SparseIndex._trim_query_width(q_ids, q_w)
    assert t_ids.shape == (1, 8)  # 5 valid terms -> bucket 8
    assert (t_ids[0] >= 0).sum() == 5

    full = idx.search(q_ids, q_w, k=10)
    # scores must be identical to the untrimmed evaluation (search trims
    # internally; compare against the numpy oracle on the raw query)
    oracle = _score_rows_np(ids, w, q_ids, q_w)
    for r, v in full:  # bf16 slab weights bound the score error
        assert abs(v - oracle[r]) <= 4e-3 * max(abs(oracle[r]), 1e-6), (
            r, v, oracle[r])

    # batch path: rows with different term counts share the max bucket
    qb = np.stack([q_ids, q_ids])
    qwb = np.stack([q_w, q_w * 0.5])
    batch = idx.search_batch(qb, qwb, k=10)
    assert batch[0] == full
