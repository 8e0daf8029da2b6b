#!/usr/bin/env python3
"""Wall-clock proof for pooled page OCR (r05 item 10): a multi-page
scanned PDF through ``GlyphAtlasOCR.ocr_pdf`` serial vs process-pool.

Matches the reference's CPU-worker topology (docker-compose.yml:161-192
runs a dedicated parsing process pool) — page OCR is GIL-bound Python +
numpy, so thread workers can't scale it; spawn processes do.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_pdf(n_pages: int) -> bytes:
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 30)
    imgs = []
    for p in range(n_pages):
        img = Image.new("L", (1100, 900), 255)
        draw = ImageDraw.Draw(img)
        for i in range(10):
            draw.text((40, 30 + 85 * i),
                      f"PAGE {p} LINE {i} POWER {200 + p} KW RANGE "
                      f"{600 + i} KM", fill=0, font=font)
        imgs.append(img)
    kids = b" ".join(b"%d 0 R" % (3 + i * 3) for i in range(n_pages))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages,
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
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter "
            b"/DCTDecode /Length %d >>\nstream\n%s\nendstream"
            % (img.width, img.height, len(jpeg), jpeg))
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
    out = [b"%PDF-1.4"]
    for i, body in enumerate(objs, start=1):
        out.append(b"%d 0 obj\n%s\nendobj" % (i, body))
    out.append(b"%%EOF")
    return b"\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--out", default="BENCH_OCR_POOL_r05.json")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from automative_rag_tpu.ingestion.ocr import default_ocr_engine

    engine = default_ocr_engine()
    assert engine is not None

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as fh:
        fh.write(build_pdf(args.pages))
        path = fh.name

    engine.ocr_pdf(path, workers=0)  # warm the atlas + jax compile
    t0 = time.perf_counter()
    serial = engine.ocr_pdf(path, workers=0)
    serial_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pooled_cold = engine.ocr_pdf(path, workers=args.workers)
    cold_s = time.perf_counter() - t0  # includes one-time worker startup
    t0 = time.perf_counter()
    pooled = engine.ocr_pdf(path, workers=args.workers)
    pooled_s = time.perf_counter() - t0  # the steady-state service cost

    report = {
        "bench": "ocr_process_pool",
        "pages": args.pages,
        "workers": args.workers,
        "serial_s": round(serial_s, 2),
        "pooled_cold_s": round(cold_s, 2),
        "pooled_warm_s": round(pooled_s, 2),
        "speedup_warm": round(serial_s / max(pooled_s, 1e-9), 2),
        "identical_output": pooled == serial and pooled_cold == serial,
        "chars": len(serial),
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
