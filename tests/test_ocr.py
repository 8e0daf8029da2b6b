"""Built-in glyph-atlas OCR engine (ingestion/ocr.py) — the reference's
scanned-PDF fallback (pdf_loader.py:75-170) rebuilt without PaddleOCR:
synthetic scanned PDFs (rendered text → JPEG → image XObject) must OCR back
to the rendered text through the production PDFProcessor path."""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageDraw, ImageFont

from automative_rag_tpu.ingestion.ocr import GlyphAtlasOCR, default_ocr_engine
from automative_rag_tpu.ingestion.pdf_text import extract_pdf_images


def _render_page(lines, size=36, width=1100):
    font = ImageFont.truetype("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size)
    img = Image.new("L", (width, 60 + 70 * len(lines)), 255)
    draw = ImageDraw.Draw(img)
    for i, line in enumerate(lines):
        draw.text((40, 30 + 70 * i), line, fill=0, font=font)
    return img


def _scanned_pdf(img: Image.Image) -> bytes:
    """Minimal one-page scanned PDF: the page is a JPEG image XObject."""
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    jpeg = buf.getvalue()
    content = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n%s\nendstream"
        % (img.width, img.height, len(jpeg), jpeg),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    ]
    out = [b"%PDF-1.4"]
    for i, body in enumerate(objs, start=1):
        out.append(b"%d 0 obj\n%s\nendobj" % (i, body))
    out.append(b"%%EOF")
    return b"\n".join(out)


@pytest.fixture(scope="module")
def engine():
    eng = default_ocr_engine()
    assert eng is not None, "DejaVu fonts + PIL are in this image"
    return eng


def test_ocr_clean_rendered_line(engine):
    img = _render_page(["BMW X5 2023"])
    text = engine.ocr_image(img)
    assert "BMW" in text.replace(" ", "") or "BMW" in text
    assert "2023" in text


def test_ocr_numbers_and_units(engine):
    img = _render_page(["0-100 kmh 6.9s", "Power 250 kW"])
    text = engine.ocr_image(img)
    flat = text.replace(" ", "")
    assert "6.9" in flat
    assert "250" in flat
    assert len(text.splitlines()) == 2  # line grouping held


def test_ocr_word_spacing(engine):
    text = engine.ocr_image(_render_page(["ENGINE TYPE V8"]))
    # word gaps must be preserved as spaces
    assert len([w for w in text.split() if w]) >= 3


def test_extract_pdf_images_roundtrip(tmp_path):
    img = _render_page(["TEST 123"])
    path = tmp_path / "scan.pdf"
    path.write_bytes(_scanned_pdf(img))
    images = extract_pdf_images(str(path))
    assert len(images) == 1
    got = np.asarray(images[0], np.float32)
    want = np.asarray(img, np.float32)
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 3.0  # JPEG-lossy but close


def test_pdf_processor_ocr_fallback_end_to_end(tmp_path, engine):
    """A scanned PDF (no text layer) must flow through the OCR fallback in
    the production processor and yield indexable text."""
    from automative_rag_tpu.ingestion.pdf_processor import PDFProcessor

    img = _render_page(["BMW 530Li ACCELERATION 6.9s", "TOP SPEED 250 kmh"])
    path = tmp_path / "scan.pdf"
    path.write_bytes(_scanned_pdf(img))

    processor = PDFProcessor(ocr_engine=engine)
    text, metadata = processor.extract_raw_content(str(path))
    assert metadata["used_ocr"] is True
    flat = text.replace(" ", "")
    assert "6.9" in flat and "250" in flat


def test_ocr_empty_and_blank_images(engine):
    blank = Image.new("L", (200, 100), 255)
    assert engine.ocr_image(blank) == ""


def test_bitonal_scan_is_not_dropped(engine):
    """Perfectly clean {0,255} bitonal scans put the Otsu split at 0 —
    the inclusive mask must keep the ink (was: empty page)."""
    img = _render_page(["Torque 250 Nm"])
    arr = np.asarray(img, np.uint8)
    bitonal = np.where(arr < 128, 0, 255).astype(np.uint8)
    out = engine.ocr_image(Image.fromarray(bitonal))
    assert "250" in out, out


def test_table_rule_does_not_swallow_text_line(engine):
    """A horizontal rule under a text line x-overlaps every glyph; the
    merge step must not collapse the line into the rule."""
    img = _render_page(["Torque 250"])
    draw = ImageDraw.Draw(img)
    y = 78  # a few px under the text baseline
    draw.line((35, y, 1050, y), fill=0, width=2)
    out = engine.ocr_image(img)
    assert "250" in out, out


def test_lowercase_line_not_forced_uppercase(engine):
    """A line whose tallest glyphs are x-height has no casing evidence —
    same-shape letters must keep their atlas casing."""
    out = engine.ocr_image(_render_page(["success"]))
    assert "SUCC" not in out, out
    assert "success" in out.lower()


def test_malformed_cjk_atlas_rejected(tmp_path, engine):
    bad = tmp_path / "bad_atlas.npz"
    np.savez(bad, patches=np.zeros((5, 99), np.float32),
             labels=np.array(list("abcde")),
             aspects=np.zeros((5,), np.float32), patch=24)
    probe = GlyphAtlasOCR()
    assert probe.load_cjk_atlas(str(bad)) is False
    # label/aspect length mismatch also rejected
    np.savez(bad, patches=np.zeros((5, 576), np.float32),
             labels=np.array(list("abc")),
             aspects=np.zeros((5,), np.float32), patch=24)
    assert probe.load_cjk_atlas(str(bad)) is False


def test_oversized_image_is_bounded(engine):
    """A huge noise page must decimate instead of stalling the worker."""
    import time as _time

    rng = np.random.default_rng(0)
    noise = (rng.random((4000, 4000)) > 0.995).astype(np.uint8) * 255
    t0 = _time.time()
    engine.ocr_image(Image.fromarray(255 - noise))
    assert _time.time() - t0 < 60


def test_png_predictor_vectorized_parity():
    """The vectorized PNG unfiltering must be byte-identical to the scalar
    reference across every filter type (0-4) and pixel stride — it runs on
    every FlateDecode scan before OCR, where a wrong byte becomes indexed
    gibberish."""
    import numpy as np

    from automative_rag_tpu.ingestion.pdf_text import (
        _undo_png_predictor,
        _undo_png_predictor_scalar_row,
    )

    def scalar_oracle(raw, width, height, px):
        stride = width * px
        out = bytearray()
        prev = bytearray(stride)
        pos = 0
        for _ in range(height):
            ftype = raw[pos]
            row = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += stride + 1
            if not _undo_png_predictor_scalar_row(row, prev, ftype, px):
                return None
            out += row
            prev = row
        return bytes(out)

    rng = np.random.default_rng(7)
    for px, w, h in [(1, 37, 23), (3, 17, 29), (1, 96, 48)]:
        stride = w * px
        raw = bytearray()
        for _ in range(h):
            raw.append(int(rng.integers(0, 5)))
            raw.extend(rng.integers(0, 256, stride, dtype=np.uint8).tobytes())
        got = _undo_png_predictor(bytes(raw), w, h, px)
        want = scalar_oracle(bytes(raw), w, h, px)
        assert got == want

    # malformed inputs degrade to None, never raise
    assert _undo_png_predictor(b"\x09" + b"\x00" * 10, 10, 1, 1) is None
    assert _undo_png_predictor(b"", 10, 10, 1) is None


def test_components_scipy_matches_python_oracle():
    """The C labeling path must produce the same 4-connected boxes as the
    pure-Python union-find it replaced."""
    import numpy as np

    from automative_rag_tpu.ingestion.ocr import GlyphAtlasOCR

    rng = np.random.default_rng(11)
    for shape, density in [((60, 80), 0.2), ((40, 40), 0.5), ((16, 16), 0.05)]:
        ink = rng.random(shape) < density
        got = sorted(GlyphAtlasOCR._components(ink))
        want = sorted(GlyphAtlasOCR._components_py(ink))
        assert got == want
    assert GlyphAtlasOCR._components(np.zeros((8, 8), bool)) == []


def _scanned_pdf_pages(imgs) -> bytes:
    """Multi-page scanned PDF: one JPEG image XObject per page."""
    kids = b" ".join(b"%d 0 R" % (3 + i * 3) for i in range(len(imgs)))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % len(imgs),
    ]
    content = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
    for i, img in enumerate(imgs):
        base = 3 + i * 3
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        jpeg = buf.getvalue()
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im0 %d 0 R >> >> /Contents %d 0 R >>"
            % (base + 1, base + 2))
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n%s\nendstream"
            % (img.width, img.height, len(jpeg), jpeg))
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
    out = [b"%PDF-1.4"]
    for i, body in enumerate(objs, start=1):
        out.append(b"%d 0 obj\n%s\nendobj" % (i, body))
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_ocr_pdf_process_pool_matches_serial(tmp_path, engine):
    """Pooled page OCR (spawn workers, r05 item 10) must produce exactly
    the serial output, in page order."""
    imgs = [_render_page([f"PAGE {i} BMW X5", f"POWER {200 + i} KW"])
            for i in range(4)]
    path = tmp_path / "multi.pdf"
    path.write_bytes(_scanned_pdf_pages(imgs))
    serial = engine.ocr_pdf(str(path), workers=0)
    pooled = engine.ocr_pdf(str(path), workers=3)
    assert pooled == serial
    assert "PAGE" in pooled.replace(" ", "") or "PAGE" in pooled
    assert "203" in pooled  # last page made it
