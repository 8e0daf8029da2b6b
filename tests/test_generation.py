"""Generation-layer tests: context builder budgets/format, prompt templates,
fact checker, answer pipeline scoring."""

from automative_rag_tpu.config.mode_config import QueryMode, estimate_token_count
from automative_rag_tpu.documents import Document
from automative_rag_tpu.generation import (
    SimpleFactChecker,
    build_prompt,
    format_documents_with_relevance_scores,
)
from automative_rag_tpu.generation.context import documents_in_context_order
from automative_rag_tpu.generation.llm import AnswerGenerator, StubLLM


def _doc(text, score, **md):
    return (Document(page_content=text, metadata=md), score)


def test_context_empty():
    assert "No relevant documents" in format_documents_with_relevance_scores([])


def test_context_ordering_ids_and_indicators():
    docs = [
        _doc("低分文档", 0.3, source="text", title="低"),
        _doc("高分文档", 0.9, source="pdf", title="高", manufacturer="宝马"),
        _doc("中分文档", 0.7, source="youtube", title="中"),
    ]
    ctx = format_documents_with_relevance_scores(docs)
    # relevance order: DOC_1 = highest
    assert ctx.index("DOC_1") < ctx.index("DOC_2") < ctx.index("DOC_3")
    assert "🔥" in ctx and "⭐" in ctx and "📄" in ctx
    assert "(PDF - '高') - 宝马" in ctx
    assert "(YouTube - '中')" in ctx
    order = documents_in_context_order(docs)
    assert order[0][1].page_content == "高分文档"
    assert order[0][0] == "DOC_1"


def test_context_budget_and_truncation():
    long_doc = _doc("这是一段很长的内容。" * 300, 0.95, source="text", title="长")
    other = _doc("短内容。", 0.9, source="text", title="短")
    ctx = format_documents_with_relevance_scores([long_doc, other], max_token_budget=500)
    # high-relevance overflow gets truncated, not dropped
    assert "[截断]" in ctx
    assert estimate_token_count(ctx) < 800


def test_context_doc_cap():
    docs = [_doc(f"文档{i}。", 0.9 - i * 0.01, source="text") for i in range(20)]
    ctx = format_documents_with_relevance_scores(docs)
    assert "DOC_12" in ctx and "DOC_13" not in ctx  # 12-doc hard cap


def test_prompts_carry_citation_contract():
    for mode in QueryMode:
        prompt = build_prompt(mode, context="CTX_SENTINEL", question="Q_SENTINEL")
        assert "【来源：DOC_X】" in prompt
        assert "CTX_SENTINEL" in prompt and "Q_SENTINEL" in prompt
    assert "优点/缺点" in build_prompt("tradeoffs", "c", "q")
    assert "观点" in build_prompt("debate", "c", "q")
    assert "quotes" in build_prompt("quotes", "c", "q").lower() or "引用" in build_prompt("quotes", "c", "q") or "quote" in build_prompt("quotes", "c", "q").lower()


def test_fact_checker():
    checker = SimpleFactChecker()
    context = "宝马X5百公里加速5.5秒，最高时速250公里。"
    good = checker.simple_quality_check("加速5.5秒【来源：DOC_1】", context)
    assert good["quality_score"] == 100 and not good["has_issues"]

    bad = checker.simple_quality_check("百公里加速0.3秒，最高时速900公里", context)
    assert bad["has_issues"]
    assert bad["quality_score"] < 100
    assert bad["recommendation"] == "review_answer"


def test_answer_pipeline_confidence_and_sources():
    gen = AnswerGenerator(StubLLM())
    docs = [
        _doc("特斯拉Model 3百公里加速5.6秒。", 0.9, source="text", source_id="a"),
        _doc("无关内容。", 0.5, source="text", source_id="b"),
    ]
    out = gen.answer("特斯拉加速", docs, mode="facts")
    assert 0 < out["confidence"] <= 100
    assert out["sources"][0]["doc_id"] == "DOC_1"
    assert any(s["cited"] for s in out["sources"])
    assert out["mode"] == "facts"
    assert "5.6" in out["answer"]


def test_think_tag_stripping():
    class ThinkLLM:
        name = "thinker"

        def generate(self, prompt, params):
            return "<think>internal musing</think>最终答案【来源：DOC_1】"

    gen = AnswerGenerator(ThinkLLM())
    out = gen.answer("q", [_doc("内容", 0.9)], mode="facts")
    assert out["answer"] == "最终答案【来源：DOC_1】"
    assert "musing" not in out["answer"]


def test_answer_batch_stub_fallback():
    """answer_batch over the stub backend (no generate_batch) must match
    per-query answers."""
    from automative_rag_tpu.generation.llm import AnswerGenerator

    gen = AnswerGenerator()
    docs_a = [(Document(page_content="2023款宝马X5的百公里加速是5.5秒。"), 0.9)]
    docs_b = [(Document(page_content="特斯拉Model Y的续航是660公里。"), 0.8)]
    batch = gen.answer_batch(["宝马X5加速是多少", "Model Y续航多少"],
                             [docs_a, docs_b], mode="facts")
    solo = [gen.answer("宝马X5加速是多少", docs_a, mode="facts"),
            gen.answer("Model Y续航多少", docs_b, mode="facts")]
    assert [b["answer"] for b in batch] == [s["answer"] for s in solo]
    assert all("来源" in b["answer"] for b in batch)


def test_answer_batch_jax_backend():
    """answer_batch routes through the jax backend's batched generation."""
    from automative_rag_tpu.generation.llm import AnswerGenerator, JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text[:48]]}

        def decode(self, ids, skip_special_tokens=True):
            return "答案" + "".join(chr(97 + (t % 26)) for t in ids)

    gen = AnswerGenerator(JaxCausalLM("", config=Qwen2Config.tiny_test(),
                                      tokenizer=FakeTok()))
    docs = [(Document(page_content="文档内容。"), 0.9)]
    out = gen.answer_batch(["问题一", "问题二"], [docs, docs], mode="facts")
    assert len(out) == 2
    assert all(o["llm"].startswith("jax-qwen2") for o in out)
    assert all(isinstance(o["answer"], str) and o["answer"] for o in out)


def test_two_layer_sections_parsed():
    """Complex-mode answers with 【实证分析】/【策略推理】 markers split into
    structured sections (reference 智能查询.py:184-223 two-layer display —
    whose backend never actually produced the keys; here it does)."""
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator

    class SectionLLM:
        name = "fake"

        def generate(self, prompt, params):
            return ("【实证分析】X5百公里加速5.5秒【来源：DOC_1】。\n"
                    "【策略推理】适合追求动力的用户。")

    gen = AnswerGenerator(SectionLLM())
    doc = Document(page_content="X5百公里加速5.5秒", metadata={})
    out = gen.answer("X5加速", [(doc, 0.9)], mode="features")
    sections = out["structured"]["sections"]
    assert sections["【实证分析】"].startswith("X5百公里加速")
    assert "推理" not in sections["【实证分析】"]
    assert sections["【策略推理】"] == "适合追求动力的用户。"


def test_sections_absent_without_markers():
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator

    class PlainLLM:
        name = "fake"

        def generate(self, prompt, params):
            return "X5百公里加速5.5秒【来源：DOC_1】。"

    gen = AnswerGenerator(PlainLLM())
    doc = Document(page_content="X5百公里加速5.5秒", metadata={})
    out = gen.answer("X5加速", [(doc, 0.9)], mode="features")
    assert "sections" not in out["structured"]


# ---------------------------------------------------------------------------
# Streaming partial answers (serving on_token → AnswerGenerator on_text →
# tracker partial_answer → polling API/UI)
# ---------------------------------------------------------------------------

def test_stub_llm_streams_single_update():
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator

    gen = AnswerGenerator()
    doc = Document(page_content="2023款宝马X5的百公里加速是5.5秒。")
    seen = []
    out = gen.answer("X5加速", [(doc, 0.9)], mode="facts",
                     on_text=seen.append)
    assert len(seen) == 1
    assert seen[0]  # extractive one-shot update
    assert "5.5秒" in out["answer"]


def test_serving_llm_streams_growing_partials():
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator, JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text[:48]]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    llm = JaxCausalLM("", config=Qwen2Config.tiny_test(),
                      tokenizer=FakeTok())
    eng = llm.enable_serving(max_slots=2, max_len=96, burst=4)
    try:
        gen = AnswerGenerator(llm)
        doc = Document(page_content="文档内容。")
        seen = []
        out = gen.answer("问题", [(doc, 0.9)], mode="facts",
                         on_text=seen.append)
        assert len(seen) >= 2  # admission token + ≥1 burst
        # each partial is a prefix of the next; the last is the full text
        for a, b in zip(seen, seen[1:]):
            assert b.startswith(a)
        assert out["answer"]  # finalize still works
    finally:
        eng.stop()


def test_tracker_partial_answer_roundtrip():
    from automative_rag_tpu.orchestration.job_tracker import JobTracker

    tr = JobTracker(persist_path=None)
    job_id = tr.create_job("llm_inference")
    tr.set_partial_answer(job_id, "部分答案")
    job = tr.get_job(job_id)
    assert job["partial_answer"] == "部分答案"
    tr.set_partial_answer("missing-id", "x")  # no-op, no raise


def test_app_health_reports_serving_stats():
    """health() exposes engine stats when serving is enabled and None
    otherwise; app.warmup() warms the engine when present."""
    from automative_rag_tpu.generation.llm import AnswerGenerator, JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text[:48]]}

        def decode(self, ids, skip_special_tokens=True):
            return "x" * len(ids)

    class FakeApp:
        from automative_rag_tpu.app import RAGApplication as _R
        health = _R.health

        def __init__(self, llm):
            import time as _t
            self.started_at = _t.time()
            self.generator = AnswerGenerator(llm)
            self.index = type("I", (), {"stats": lambda s: {}})()
            self.queue_manager = type(
                "Q", (), {"get_queue_status": lambda s: {},
                          "worker_health": lambda s: {}})()
            self.tracker = type("T", (), {"get_job_counts": lambda s: {}})()
            self.sparse_index = None

    llm = JaxCausalLM("", config=Qwen2Config.tiny_test(),
                      tokenizer=FakeTok())
    assert FakeApp(llm).health()["llm_serving"] is None
    eng = llm.enable_serving(max_slots=2, max_len=96, burst=4)
    try:
        eng.warmup()
        h = FakeApp(llm).health()
        assert h["llm_serving"]["prefills"] >= 1
        assert "slots_busy" in h["llm_serving"]
    finally:
        eng.stop()


def test_answer_batch_routes_through_serving_engine():
    """With serving enabled, batch answers join continuous batching (and
    stay identical to the non-serving ragged path)."""
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator, JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text[:48]]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    import dataclasses

    # both paths must share one generation budget: the plain path runs to
    # max_positions, the engine to its pool length
    cfg = dataclasses.replace(Qwen2Config.tiny_test(), max_positions=4096)
    plain = JaxCausalLM("", config=cfg, tokenizer=FakeTok())
    served = JaxCausalLM("", config=cfg, tokenizer=FakeTok())
    served.model = plain.model  # same weights
    eng = served.enable_serving(max_slots=4, max_len=1024, burst=8)
    try:
        docs = [(Document(page_content="文档内容。"), 0.9)]
        queries = ["问题一", "问题二", "问题三"]
        want = AnswerGenerator(plain).answer_batch(
            queries, [docs] * 3, mode="facts")
        before = eng.stats["requests_completed"]
        got = AnswerGenerator(served).answer_batch(
            queries, [docs] * 3, mode="facts")
        assert eng.stats["requests_completed"] >= before + 3
        assert [g["answer"] for g in got] == [w["answer"] for w in want]
    finally:
        eng.stop()


def test_long_prompts_bypass_serving_instead_of_truncating():
    """Prompts beyond the largest serving bucket must keep the whole-loop
    path's full budget — silent head-truncation would drop the system
    header and most retrieved context."""
    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class LongTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    cfg = Qwen2Config.tiny_test()
    plain = JaxCausalLM("", config=cfg, tokenizer=LongTok())
    served = JaxCausalLM("", config=cfg, tokenizer=LongTok())
    served.model = plain.model
    eng = served.enable_serving(max_slots=2, max_len=96,
                                burst=4)  # buckets (64,)
    try:
        long_prompt = "x" * 70  # 70 tokens > bucket 64
        short_prompt = "y" * 10
        params = {"max_tokens": 6, "temperature": 0.0,
                  "speculative": False}
        assert served.generate(long_prompt, params) == plain.generate(
            long_prompt, params)
        assert eng.stats["requests_completed"] == 0  # bypassed
        # mixed batch: long row keeps ragged path, short row joins engine
        got = served.generate_batch([long_prompt, short_prompt], params)
        want = plain.generate_batch([long_prompt, short_prompt], params)
        assert got == want
        assert eng.stats["requests_completed"] == 1
    finally:
        eng.stop()


def test_serving_geometry_covers_every_mode():
    """Auto-sized serving geometry: every mode's full prompt (context
    budget + header + question) fits a bucket, with generation room."""
    from automative_rag_tpu.app import serving_geometry
    from automative_rag_tpu.config.mode_config import mode_config

    max_len, buckets = serving_geometry(0)
    for m in mode_config.all_modes():
        need = mode_config.get_context_params(m)["max_context_tokens"] + 400
        assert any(b >= need for b in buckets), (m, need, buckets)
        # room to generate the mode's answer after the largest prompt
        assert max_len - max(buckets) >= \
            mode_config.get_llm_params(m)["max_tokens"]
    # explicit override respected
    max_len2, _ = serving_geometry(2048)
    assert max_len2 == 2048


def test_enable_serving_clamps_to_model_positions():
    """Pool length may never outrun the rope table — cache columns past
    max_positions would rotate with garbage angles."""
    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class Tok:
        def __call__(self, text):
            return {"input_ids": [5, 6, 7]}

        def decode(self, ids, skip_special_tokens=True):
            return "x"

    llm = JaxCausalLM("", config=Qwen2Config.tiny_test(),  # positions 128
                      tokenizer=Tok())
    eng = llm.enable_serving(max_slots=2, max_len=5376,
                             prompt_buckets=(64, 128, 256, 512, 4512))
    try:
        assert eng.max_len == 128
        assert eng.prompt_buckets[-1] < 128
        req = eng.submit([5, 6, 7], max_new_tokens=4)
        assert req.result(timeout=60)
    finally:
        eng.stop()


def test_overlong_prompt_whole_loop_returns_nonempty_answer():
    """Prompts beyond max_positions tail-truncate (rope-table reality)
    but must still produce generated tokens — not an empty slice from a
    stale pre-truncation length."""
    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    class LongTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    llm = JaxCausalLM("", config=Qwen2Config.tiny_test(),  # positions 128
                      tokenizer=LongTok())
    params = {"max_tokens": 6, "temperature": 0.0, "speculative": False}
    out = llm.generate("x" * 300, params)  # 300 tokens >> 128
    assert out  # previously empty: out[len(ids):] with stale len(ids)
    outs = llm.generate_batch(["y" * 300, "z" * 10], params)
    assert all(o for o in outs)


def test_fullwidth_comma_citations_credit_all_sources():
    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.generation.llm import AnswerGenerator

    class TwoSourceLLM:
        name = "fake"

        def generate(self, prompt, params):
            return "加速时间为5.5秒【来源：DOC_1，DOC_2】。"

    docs = [(Document(page_content="a"), 0.9),
            (Document(page_content="b"), 0.8)]
    out = AnswerGenerator(TwoSourceLLM()).answer("q", docs, mode="facts")
    assert all(s["cited"] for s in out["sources"]), out["sources"]


def test_stub_llm_concurrent_queries_keep_their_own_context():
    """N llm-queue workers share one AnswerGenerator; a query must never
    answer from another query's documents (StubLLM context rides in
    params, not instance state)."""
    import threading

    gen = AnswerGenerator(StubLLM())
    docs_a = [(Document(page_content="宝马X5的百公里油耗是8.9升",
                        metadata={"model": "X5"}), 0.9)]
    docs_b = [(Document(page_content="奔驰GLE的百公里油耗是9.3升",
                        metadata={"model": "GLE"}), 0.9)]
    errors = []

    def worker(query, docs, expect, reps=30):
        for _ in range(reps):
            out = gen.answer(query, docs, QueryMode.FACTS)
            if expect not in out["answer"]:
                errors.append(out["answer"])
                return

    threads = [
        threading.Thread(target=worker, args=("宝马X5油耗多少？", docs_a, "8.9升")),
        threading.Thread(target=worker, args=("奔驰GLE油耗多少？", docs_b, "9.3升")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:2]


def test_extractive_value_tie_break_prefers_spec_sentence():
    """Metric questions pick the value-carrying sentence over a
    higher-scored opinion review (EVAL_r04 --hard paraphrase 0.8: right
    doc retrieved, review sentence quoted); opinion questions still lead
    with the opinion sentence."""
    from automative_rag_tpu.documents.schema import Document

    # the injected metadata header (【year:2023】 digits!) glues to the
    # first sentence of every ingested chunk — it must not make opinion
    # prose read as a value sentence (caught live: the review doc led the
    # answer because its header digits passed the numeral check)
    hdr = "【brand:比亚迪】【model:汉】【year:2023】\n\n"
    spec = Document(
        page_content=hdr + "2023款比亚迪汉EV的CLTC续航里程为715公里。",
        metadata={})
    review = Document(
        page_content=hdr + "比亚迪汉的续航表现非常不错，开起来很安心，值得推荐。",
        metadata={})
    ctx = [("DOC_1", review, 0.95), ("DOC_2", spec, 0.90)]
    llm = StubLLM()
    out = llm.generate("", {"_stub_context": ctx,
                            "_stub_question": "比亚迪汉充一次电能跑多远"})
    assert "715" in out.split("。")[0]
    out2 = llm.generate("", {"_stub_context": ctx,
                             "_stub_question": "大家觉得比亚迪汉开起来怎么样 值得推荐吗"})
    assert "推荐" in out2.split("。")[0]
