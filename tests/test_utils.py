"""Direct tests for the utils layer: unicode repair, text helpers, the
automotive quality library (reference src/utils/* parity)."""

import json

from automative_rag_tpu.documents import Document
from automative_rag_tpu.utils import (
    clean_text,
    clean_unicode_escapes,
    decode_unicode_escapes,
    extract_metadata_from_text,
    extract_year_from_text,
    quality,
    safe_json_dumps,
)


# ------------------------------------------------------------------ unicode
def test_decode_unicode_escapes():
    assert decode_unicode_escapes(r"宝马X5") == "宝马X5"
    assert decode_unicode_escapes(r"\x41\x42") == "AB"
    assert decode_unicode_escapes("普通文本") == "普通文本"
    assert decode_unicode_escapes(r"broken \uZZZZ stays") == r"broken \uZZZZ stays"


def test_clean_unicode_escapes_recursive():
    data = {
        r"品牌": [r"宝马", {"x": r"五"}],
        "plain": 42,
        "tuple": (r"一",),
    }
    cleaned = clean_unicode_escapes(data)
    assert cleaned["品牌"][0] == "宝马"
    assert cleaned["品牌"][1]["x"] == "五"
    assert cleaned["plain"] == 42
    assert cleaned["tuple"] == ("一",)


def test_safe_json_dumps_keeps_cjk():
    out = safe_json_dumps({"brand": "宝马"})
    assert "宝马" in out
    assert json.loads(out)["brand"] == "宝马"


# --------------------------------------------------------------------- text
def test_clean_text():
    assert clean_text("  a\t\tb\n\nc  ") == "a b c"
    assert clean_text("控制\x00字符\x1f") == "控制字符"
    assert clean_text("") == ""


def test_extract_year():
    assert extract_year_from_text("2023款宝马X5") == 2023
    assert extract_year_from_text("bought in 1998") == 1998
    assert extract_year_from_text("no year here") is None
    assert extract_metadata_from_text("2022款")["year"] == 2022


# ------------------------------------------------------------------ quality
def test_key_terms_and_matching():
    terms = quality.extract_key_terms("宝马X5的百公里加速是多少？")
    assert any("宝马" in t for t in terms)
    assert any("加速" in t for t in terms)
    assert "是多少" not in terms
    assert quality.term_matches("百公里加速", "该车百公里加速为6.9秒")
    assert not quality.term_matches("百公里加速", "今天天气不错")


def test_numerical_and_garbled_detection():
    assert quality.has_numerical_data("百公里加速6.9秒")
    assert not quality.has_numerical_data("动力不错")
    assert quality.has_garbled_content("锟斤拷锟斤拷")
    assert quality.has_garbled_content("")
    assert not quality.has_garbled_content("正常的中文评测内容，马力252匹。")


def test_plausibility_checks():
    assert quality.check_acceleration_claims("百公里加速0.5秒") != []
    assert quality.check_acceleration_claims("百公里加速6.9秒") == []
    warnings = quality.check_numerical_specs_realistic(
        "最高时速900公里，油耗50L，续航里程3000公里"
    )
    assert len(warnings) >= 3


def test_fact_check_documents_demotes_garbage():
    good = Document(page_content="宝马X5 百公里加速5.5秒，马力340匹。")
    garbled = Document(page_content="锟斤拷锟斤拷锟斤拷锟斤拷")
    ranked = quality.automotive_fact_check_documents([(good, 0.8), (garbled, 0.9)])
    assert ranked[0][0] is good  # garbage demoted below despite higher raw score


def test_fact_check_answer_and_formatting():
    docs = [Document(page_content="最高时速250公里，加速5.5秒。")]
    good = quality.automotive_fact_check_answer("最高时速250公里。", docs)
    assert good["confidence"] == 100 and not good["warnings"]
    bad = quality.automotive_fact_check_answer(
        "最高时速999公里，马力9999匹，油耗77L，加速0.1秒，续航9000公里。", docs
    )
    assert bad["confidence"] < 60
    formatted = quality.format_automotive_warnings_for_user(bad)
    assert "质量提示" in formatted and "可信度评分" in formatted
    assert quality.format_automotive_warnings_for_user(good) == ""


def test_validation_summary():
    docs = [
        Document(page_content="正常文档 马力340匹。"),
        Document(page_content="锟斤拷锟斤拷"),
    ]
    summary = quality.get_automotive_validation_summary(docs)
    assert summary["total_documents"] == 2
    assert summary["garbled_documents"] == 1
    assert summary["documents_with_numerical_data"] >= 1
    assert 0 < summary["quality_ratio"] < 1


def test_metric_synonyms_expand_terms():
    """Colloquial metric phrasings append the canonical spec term so
    paraphrased questions match spec-sheet sentences (domain lexicon)."""
    from automative_rag_tpu.utils.quality import extract_key_terms, term_matches

    terms = extract_key_terms("汉充一次电能跑多远？")
    assert "续航里程" in terms
    assert any(term_matches(t, "汉 2021款 续航里程为660公里") for t in terms)

    terms = extract_key_terms("Model 3零百要几秒？")
    assert "百公里加速" in terms
    # no false expansion without a synonym
    assert "续航里程" not in extract_key_terms("X5的轴距多少")


def test_expand_query_synonyms_for_retrieval():
    """Retrieval-side expansion appends canonical spec terms (the lexical
    bridge from colloquial phrasings to spec-sheet docs) and is identity
    when the query already carries them."""
    from automative_rag_tpu.utils.quality import expand_query_synonyms

    out = expand_query_synonyms("Model 3功率有多强？")
    assert out.startswith("Model 3功率有多强？")
    assert "马力" in out
    # canonical already present -> no duplicate append
    assert expand_query_synonyms("汉的续航里程是多少") == "汉的续航里程是多少"
    # 轴距多长 is a synonym key but 轴距 itself is already in the query
    assert expand_query_synonyms("X5的轴距多长") == "X5的轴距多长"
    # no synonyms at all -> identity
    assert expand_query_synonyms("你好") == "你好"
    # two synonyms of the same canonical append it once
    out = expand_query_synonyms("极速多少 最快能开多快")
    assert out.count("最高时速") == 1
