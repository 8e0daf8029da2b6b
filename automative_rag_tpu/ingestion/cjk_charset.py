"""Automotive-domain CJK character set for the glyph-atlas OCR engine.

The reference reads scanned Chinese spec sheets with PaddleOCR
(``src/core/ingestion/loaders/pdf_loader.py:75-170``), whose recognizer
covers ~6600 simplified characters. A template atlas that size is wasteful
for this domain; instead the charset is derived in-image, no egress needed:

- **frequency core**: jieba's ``dict.txt`` (shipped in the image) aggregates
  per-character corpus frequency over ~350K words — the top-N characters by
  summed word frequency cover general Chinese text,
- **domain guarantee**: every character of the ingestion catalogs
  (manufacturers, models, categories, engine types — ``metadata.py``) and of
  the automotive unit/measurement vocabulary is force-included, so a spec
  sheet's load-bearing tokens can never fall outside the atlas,
- **CJK punctuation** used in machine-printed documents.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

#: always-included domain vocabulary: units, measurements, spec-sheet
#: phrasing (百公里加速/续航/马力/扭矩...), dates
_DOMAIN_TEXT = (
    "年月日款型号版本参数配置表规格单位数据测试标准工信部综合工况"
    "百公里加速续航里程最高时速油耗电耗快充慢充充电功率峰值扭矩马力"
    "千瓦牛米升毫米米吨公斤千克秒分钟小时公里容量电池电机发动机变速"
    "箱前后驱动四轮悬架制动刹车轮胎尺寸轴距车身长宽高整备质量座位数"
    "排量气缸涡轮增压自然吸气混合动力纯电动插电式燃油汽油柴油氢能源"
    "新能源智能辅助驾驶自动泊车定速巡航车道保持预警碰撞安全气囊天窗"
    "空调座椅加热通风按摩方向盘中控屏幕仪表盘价格万元起售上市发布会"
)

#: CJK punctuation + fullwidth forms common in printed spec sheets
_CJK_PUNCT = "。，、：；！？（）【】《》「」·—％￥"


@lru_cache(maxsize=None)
def _jieba_char_freq():
    """{char: summed word frequency} over jieba's dictionary; empty dict if
    jieba is absent (the charset then degrades to domain + punct)."""
    try:
        import os

        import jieba

        path = os.path.join(os.path.dirname(jieba.__file__), "dict.txt")
        freq: dict = {}
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 2:
                    continue
                try:
                    count = int(parts[1])
                except ValueError:
                    continue
                for ch in parts[0]:
                    if _is_cjk(ch):
                        freq[ch] = freq.get(ch, 0) + count
        return freq
    except Exception:  # noqa: BLE001 — optional dependency
        return {}


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _domain_chars() -> List[str]:
    """Characters the domain can't afford to miss: catalogs + unit text."""
    chars = set(c for c in _DOMAIN_TEXT if _is_cjk(c))
    try:
        from .metadata import MANUFACTURER_ALIASES, MODEL_CATALOG

        for name in list(MODEL_CATALOG) + list(MANUFACTURER_ALIASES):
            chars.update(c for c in str(name) if _is_cjk(c))
        for info in MODEL_CATALOG.values():
            for value in info.values():
                chars.update(c for c in str(value) if _is_cjk(c))
    except Exception:  # noqa: BLE001 — catalogs are a bonus, not a dep
        pass
    return sorted(chars)


def cjk_charset(size: int = 2000) -> str:
    """The atlas charset: domain chars + punctuation + frequency top-up to
    ``size`` CJK characters (punctuation not counted)."""
    chars = _domain_chars()
    have = set(chars)
    freq = _jieba_char_freq()
    for ch in sorted(freq, key=freq.get, reverse=True):
        if len(chars) >= size:
            break
        if ch not in have:
            chars.append(ch)
            have.add(ch)
    return "".join(chars) + _CJK_PUNCT
