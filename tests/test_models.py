"""Encoder/embedder/reranker tests with tiny configs (weightless)."""

import numpy as np
import pytest

from automative_rag_tpu.documents import Document
from automative_rag_tpu.models import (
    ColBERTEncoder,
    DenseEmbedder,
    EncoderConfig,
    HashTokenizer,
)
from automative_rag_tpu.rerank import LateInteractionReranker


@pytest.fixture(scope="module")
def embedder():
    return DenseEmbedder(config=EncoderConfig.tiny(), max_length=64, batch_size=4)


@pytest.fixture(scope="module")
def colbert():
    return ColBERTEncoder(config=EncoderConfig.tiny(), max_query_length=16, max_doc_length=32)


def test_hash_tokenizer_cjk_and_latin():
    tok = HashTokenizer(vocab_size=1024)
    toks = tok.tokenize("宝马X5 2023款 0-100加速")
    assert "宝" in toks and "马" in toks and "x" in toks and "2023" in toks
    ids, mask = tok.encode_batch(["宝马X5", ""], max_length=8)
    assert ids.shape == (2, 8)
    assert mask[0].sum() > 2 and mask[1].sum() == 2  # empty text = CLS+SEP
    ids2, _ = tok.encode_batch(["宝马X5"], max_length=8)
    np.testing.assert_array_equal(ids[0], ids2[0])  # deterministic


def test_embedder_shapes_and_norm(embedder):
    vecs = embedder.embed_texts(["宝马5系加速很快", "Tesla Model 3 range", "丰田凯美瑞"])
    assert vecs.shape == (3, embedder.dim)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)


def test_embedder_deterministic(embedder):
    a = embedder.embed_query("宝马X5 2023")
    b = embedder.embed_query("宝马X5 2023")
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_embedder_padding_invariance(embedder):
    """Embedding must not depend on how much padding the batch carries —
    i.e. attention masking is correct."""
    alone = embedder.embed_texts(["短文本"])[0]
    with_long = embedder.embed_texts(["短文本", "这是一段长得多的文本 " * 10])[0]
    np.testing.assert_allclose(alone, with_long, rtol=1e-3, atol=1e-5)


def test_embedder_batch_larger_than_batch_size(embedder):
    texts = [f"doc number {i}" for i in range(10)]
    vecs = embedder.embed_texts(texts)
    assert vecs.shape == (10, embedder.dim)
    single = embedder.embed_texts([texts[7]])[0]
    np.testing.assert_allclose(vecs[7], single, rtol=1e-3, atol=1e-5)


def test_colbert_masks(colbert):
    emb, scoring = colbert.encode_queries(["宝马X5怎么样"])
    assert emb.shape[0] == 1 and emb.shape[1] == 16
    assert not scoring[0, 0]  # [CLS] excluded
    n_real = scoring[0].sum()
    assert 0 < n_real < 16  # content tokens only
    d_emb, d_mask = colbert.encode_documents(["宝马X5 2023款 SUV"])
    assert d_emb.shape[1] == 32
    assert d_mask[0, 0] and not d_mask[0, -1]


def test_reranker_orders_by_relevance(colbert):
    """With a weightless encoder we can't test semantics, but ordering and
    plumbing must hold: identical doc text should outscore unrelated text."""
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    query = "宝马X5 2023 加速"
    docs = [
        Document(page_content="完全无关的文字 apples bananas"),
        Document(page_content="宝马X5 2023 加速"),
    ]
    ranked = reranker.rerank(query, docs)
    assert ranked[0][0].page_content == "宝马X5 2023 加速"
    assert ranked[0][1] > ranked[1][1]


def test_reranker_hybrid_combine(colbert):
    calls = {}

    def second(query, texts):
        calls["n"] = len(texts)
        return np.arange(len(texts), dtype=np.float64)  # prefers last doc

    reranker = LateInteractionReranker(
        colbert, colbert_weight=0.0, second_weight=1.0, second_scorer=second, use_pallas=False
    )
    docs = [Document(page_content=f"doc {i}") for i in range(4)]
    ranked = reranker.rerank("any query", docs, top_k=2)
    assert calls["n"] == 4
    assert ranked[0][0].page_content == "doc 3"
    assert ranked[0][1] == pytest.approx(1.0)  # min-max normalized top


def test_reranker_batch_shares_docs(colbert):
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    docs = [Document(page_content=f"样本 {i}") for i in range(5)]
    out = reranker.rerank_batch(["查询一", "查询二"], docs, top_k=3)
    assert len(out) == 2 and all(len(r) == 3 for r in out)


def test_reranker_empty_docs(colbert):
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    assert reranker.rerank("q", []) == []
    assert reranker.rerank_batch(["a", "b"], []) == [[], []]


def test_explanations(colbert):
    reranker = LateInteractionReranker(colbert, use_pallas=False)
    doc = Document(page_content="宝马X5 2023款 SUV 加速很快")
    result = reranker.explain("宝马X5 加速", doc, top_matches=3)
    assert result["query_content_tokens"] > 0
    assert len(result["matches"]) <= 3
    for m in result["matches"]:
        assert {"query_token", "doc_token", "similarity"} <= set(m)


def test_cross_encoder_scorer():
    from automative_rag_tpu.models.cross_encoder import CrossEncoderScorer
    from automative_rag_tpu.models import EncoderConfig

    scorer = CrossEncoderScorer(config=EncoderConfig.tiny(), max_length=64, batch_size=2)
    scores = scorer("宝马X5怎么样", ["宝马X5评测", "苹果手机发布", "特斯拉续航"])
    assert scores.shape == (3,)
    # deterministic
    again = scorer("宝马X5怎么样", ["宝马X5评测", "苹果手机发布", "特斯拉续航"])
    np.testing.assert_allclose(scores, again, rtol=1e-5)


def test_cross_encoder_plugs_into_hybrid(colbert):
    from automative_rag_tpu.models.cross_encoder import CrossEncoderScorer
    from automative_rag_tpu.models import EncoderConfig
    from automative_rag_tpu.documents import Document

    scorer = CrossEncoderScorer(config=EncoderConfig.tiny(), max_length=64)
    reranker = LateInteractionReranker(
        colbert, colbert_weight=0.8, second_weight=0.2,
        second_scorer=scorer, use_pallas=False,
    )
    docs = [Document(page_content=f"文本{i}") for i in range(4)]
    ranked = reranker.rerank("查询", docs, top_k=4)
    assert len(ranked) == 4
    scores = [s for _, s in ranked]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)  # min-max combined range


def test_lexical_embedder_retrieval_quality():
    """Weightless dense retrieval must be lexically meaningful: overlapping
    text scores higher than unrelated text."""
    emb = DenseEmbedder(config=EncoderConfig.tiny(), max_length=64, batch_size=4)
    assert emb.mode == "lexical"
    vecs = emb.embed_texts([
        "宝马X5 2023款百公里加速5.5秒",
        "宝马X5的加速测试成绩",
        "今天的天气多云转晴",
    ])
    sim_related = float(vecs[0] @ vecs[1])
    sim_unrelated = float(vecs[0] @ vecs[2])
    assert sim_related > sim_unrelated + 0.1


def test_transformer_mode_still_available():
    emb = DenseEmbedder(config=EncoderConfig.tiny(), max_length=32, mode="transformer")
    vecs = emb.embed_texts(["测试"])
    assert vecs.shape == (1, emb.dim)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)


def test_native_tokenizer_matches_python():
    """The C hot loop and the Python fallback must produce identical ids."""
    from automative_rag_tpu.models.tokenizer import HashTokenizer, _native

    if _native() is None:
        pytest.skip("native/libfasttok.so not built")
    native = HashTokenizer(vocab_size=4096, use_native=True)
    python = HashTokenizer(vocab_size=4096, use_native=False)
    assert native._lib is not None and python._lib is None
    samples = [
        "宝马X5 2023款 0-100加速6.9秒，售价72.5万元！",
        "Tesla Model 3 Long Range, 629km CLTC",
        "混动SUV对比：RAV4 vs CR-V（2022）",
        "",
        "  spaces\tand\nnewlines  ",
        "ABC123def456.789xyz",
    ]
    for text in samples:
        a, am = native.encode_batch([text], 64)
        b, bm = python.encode_batch([text], 64)
        np.testing.assert_array_equal(a, b, err_msg=text)
        np.testing.assert_array_equal(am, bm)


def test_native_tokenizer_speedup():
    from automative_rag_tpu.models.tokenizer import HashTokenizer, _native

    if _native() is None:
        pytest.skip("native/libfasttok.so not built")
    import time

    text = "宝马X5 2023款百公里加速5.5秒，最高时速250公里。" * 40
    native = HashTokenizer(use_native=True)
    python = HashTokenizer(use_native=False)
    t0 = time.perf_counter()
    for _ in range(200):
        native.encode_batch([text], 512)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        python.encode_batch([text], 512)
    t_python = time.perf_counter() - t0
    assert t_native < t_python  # the C loop must actually be faster


def test_encoder_data_parallel_matches_single_device():
    """DP-placed encoders must produce identical embeddings (params are
    replicated; only batch placement changes)."""
    import jax

    from automative_rag_tpu.models.bge_m3 import DenseEmbedder
    from automative_rag_tpu.models.colbert import ColBERTEncoder
    from automative_rag_tpu.models.encoder import EncoderConfig
    from automative_rag_tpu.parallel import make_mesh

    cfg = EncoderConfig.tiny()
    texts = [f"宝马X{i} 测试文本内容 {i}" for i in range(16)]

    plain = DenseEmbedder(config=cfg, mode="transformer", seed=3)
    dp = DenseEmbedder(config=cfg, mode="transformer", seed=3)
    dp.data_parallel(make_mesh(8))
    np.testing.assert_allclose(dp.embed_texts(texts), plain.embed_texts(texts),
                               rtol=1e-5, atol=1e-6)
    # B=1 (not divisible by 8) falls back to unsharded placement
    np.testing.assert_allclose(dp.embed_query(texts[0]), plain.embed_query(texts[0]),
                               rtol=1e-5, atol=1e-6)

    cb_plain = ColBERTEncoder(config=cfg, max_query_length=16, max_doc_length=32)
    cb_dp = ColBERTEncoder(config=cfg, max_query_length=16, max_doc_length=32)
    cb_dp.data_parallel(make_mesh(8))
    a, am = cb_plain.encode_documents(texts)
    b, bm = cb_dp.encode_documents(texts)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(bm, am)
