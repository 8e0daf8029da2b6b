"""PDF ingestion processor.

Parity target: reference ``PDFLoader``/``PDFProcessor``
(``src/core/ingestion/loaders/pdf_loader.py``): text extraction with an OCR
fallback when a page yields <100 chars. Extraction here is the from-scratch
parser in ``pdf_text.py`` (the environment ships no PDF libraries); the OCR
path is interface-gated (no OCR engine in the image — inject one via
``ocr_engine`` when available).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

from ..utils.text import clean_text
from .base import BaseIngestionProcessor
from .pdf_text import extract_pdf_text

# an OCR engine is a callable: path -> extracted text
OCREngine = Callable[[str], str]

OCR_MIN_CHARS = 100  # below this, the reference tries OCR (pdf_loader.py:75-170)


class PDFProcessor(BaseIngestionProcessor):
    source_type = "pdf"

    def __init__(self, ocr_engine: Optional[OCREngine] = None, **kwargs):
        super().__init__(**kwargs)
        if ocr_engine is None:
            # built-in glyph-atlas engine (Latin/digits; ingestion/ocr.py).
            # Inject a CJK-capable engine here when one is available.
            from .ocr import default_ocr_engine

            ocr_engine = default_ocr_engine()
        self.ocr_engine = ocr_engine

    def validate_source(self, source: Any) -> Tuple[bool, str]:
        path = source.get("path") if isinstance(source, dict) else source
        if not isinstance(path, str) or not path.lower().endswith(".pdf"):
            return False, "expected a .pdf path"
        if not os.path.exists(path):
            return False, f"file not found: {path}"
        return True, ""

    def extract_raw_content(self, source: Any) -> Tuple[str, Dict[str, Any]]:
        metadata: Dict[str, Any] = {}
        path = source
        if isinstance(source, dict):
            metadata = {k: v for k, v in source.items() if k != "path"}
            path = source["path"]

        text, info = extract_pdf_text(path)
        used_ocr = False
        if len(text.strip()) < OCR_MIN_CHARS and self.ocr_engine is not None:
            text = self.ocr_engine(path)
            used_ocr = True

        metadata.setdefault("title", os.path.basename(path))
        metadata["pages"] = info.get("pages", 0)
        metadata["used_ocr"] = used_ocr
        return clean_text(text), metadata

    def extract_tables(self, path: str) -> list:
        """Heuristic table extraction from the PDF's text layer (reference
        ``pdf_loader.py:402-443`` pulls tables via PyMuPDF; no PDF library
        ships here, so tables are recovered from column-aligned text).

        A table is ≥2 consecutive lines that split into the same number of
        ≥2 cells on ``|``, tabs, or runs of ≥2 spaces. Returns
        ``[{"rows": [[cell, ...], ...], "n_columns": int}, ...]``.
        """
        import re

        text, _ = extract_pdf_text(path)
        tables: list = []
        current: list = []

        def _cells(line: str) -> list:
            if "|" in line:
                parts = [c.strip() for c in line.split("|")]
            else:
                parts = [c.strip() for c in re.split(r"\t| {2,}", line)]
            return [c for c in parts if c]

        def _flush():
            if len(current) >= 2:
                tables.append({"rows": list(current),
                               "n_columns": len(current[0])})
            current.clear()

        for line in text.splitlines():
            cells = _cells(line)
            if len(cells) >= 2 and (not current or len(cells) == len(current[0])):
                current.append(cells)
            else:
                _flush()
                if len(cells) >= 2:
                    current.append(cells)
        _flush()
        return tables

    def get_pdf_info(self, path: str) -> Dict[str, Any]:
        text, info = extract_pdf_text(path)
        return {
            "path": path,
            "pages": info.get("pages", 0),
            "objects": info.get("objects", 0),
            "extracted_chars": len(text),
            "needs_ocr": len(text.strip()) < OCR_MIN_CHARS,
        }
