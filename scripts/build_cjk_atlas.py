#!/usr/bin/env python3
"""Build the CJK glyph atlas for the built-in OCR engine from any TTF/OTF.

The image ships no CJK font (checked exhaustively: DejaVu + STIX only), so
the atlas is built at Docker-image build time from a downloaded font
(``Dockerfile`` fetches Noto Sans SC) — or from any font you have:

    python scripts/build_cjk_atlas.py --font NotoSansSC-Regular.otf \
        --out data/cjk_atlas.npz [--size 2000]

The charset is the automotive-domain set (``ingestion/cjk_charset.py``):
catalog + unit vocabulary guaranteed, topped up with jieba-frequency-ranked
common characters. Each character renders at two sizes into 32×32 unit-norm
patches; the OCR engine scores scan glyphs against the atlas with one
cosine matmul (``ingestion/ocr.py``). Counterpart of the reference's
PaddleOCR recognizer for zh scans (pdf_loader.py:75-170).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automative_rag_tpu.ingestion.cjk_charset import cjk_charset  # noqa: E402
from automative_rag_tpu.ingestion.ocr import (  # noqa: E402
    CJK_PATCH,
    _normalize_patch,
    _render_glyph,
)


def build_atlas(font_path: str, charset: str, sizes=(28, 44)) -> dict:
    from PIL import ImageFont

    vectors, labels, aspects = [], [], []
    skipped = []
    for size in sizes:
        font = ImageFont.truetype(font_path, size)
        for char in charset:
            crop = _render_glyph(font, char)
            if crop is None:
                if size == sizes[0]:
                    skipped.append(char)
                continue
            vec, aspect = _normalize_patch(crop, patch=CJK_PATCH)
            vectors.append(vec)
            labels.append(char)
            aspects.append(aspect)
    if not vectors:
        raise SystemExit(f"font {font_path!r} rendered no glyphs")
    if skipped:
        print(f"[build_cjk_atlas] {len(skipped)} chars missing from font "
              f"(first few: {''.join(skipped[:10])})", file=sys.stderr)
    return {
        "patches": np.stack(vectors).astype(np.float32),
        "labels": np.array(labels),
        "aspects": np.asarray(aspects, np.float32),
        "patch": np.int32(CJK_PATCH),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--font", required=True)
    parser.add_argument("--out", default="data/cjk_atlas.npz")
    parser.add_argument("--size", type=int, default=2000,
                        help="CJK charset size (domain chars always included)")
    parser.add_argument("--chars", default="",
                        help="explicit charset override (testing)")
    args = parser.parse_args()

    charset = args.chars or cjk_charset(args.size)
    atlas = build_atlas(args.font, charset)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **atlas)
    print(f"[build_cjk_atlas] {len(atlas['labels'])} templates "
          f"({len(set(atlas['labels'].tolist()))} chars) → {out} "
          f"({out.stat().st_size // 1024} KiB)")


if __name__ == "__main__":
    main()
