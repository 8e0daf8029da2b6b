"""Minimal from-scratch PDF text extraction (no third-party PDF libs).

The environment has no pypdf/fitz, and the reference's PDF path is a library
call (``src/core/ingestion/loaders/pdf_loader.py`` uses PyPDFLoader); this
module implements the needed subset directly: object/xref parsing,
FlateDecode, page-tree walk, and Tj/TJ/' text operators from content
streams, with UTF-16BE and PDFDocEncoding string handling. Handles the
common "simple text PDF" class (which is also what the reference's loader
handles without OCR); scanned PDFs need the OCR path (gated).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TEXT_SHOW_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"  # literal string shows
    rb"|<(?P<hex>[0-9A-Fa-f\s]+)>\s*(?:Tj|')"  # hex string shows
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"  # array shows
    rb"|(?P<nl>(?:-?[\d.]+\s+-?[\d.]+\s+(?:Td|TD))|T\*)",  # line moves
    re.DOTALL,
)
_ARR_ITEM_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]+)>")
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                digits = raw[i + 1 : i + 4]
                span = 1
                while span < 3 and span < len(digits) and digits[:span + 1].isdigit():
                    span += 1
                out.append(int(digits[:span], 8) & 0xFF)
                i += 1 + span
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="ignore")
        except UnicodeDecodeError:
            pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1", errors="ignore")


def _inflate(data: bytes) -> Optional[bytes]:
    for candidate in (data, data.strip(b"\r\n")):
        try:
            return zlib.decompress(candidate)
        except zlib.error:
            continue
    return None


class _Obj:
    def __init__(self, header: bytes, stream: Optional[bytes]):
        self.header = header
        self.stream = stream


def _parse_objects(data: bytes) -> Dict[int, _Obj]:
    objects: Dict[int, _Obj] = {}
    for match in _OBJ_RE.finditer(data):
        num = int(match.group(1))
        body = match.group(3)
        stream_match = _STREAM_RE.search(body)
        stream = stream_match.group(1) if stream_match else None
        header = body[: stream_match.start()] if stream_match else body
        objects[num] = _Obj(header, stream)
    return objects


def _undo_png_predictor_scalar_row(row: bytearray, prev, ftype: int,
                                   px: int) -> bool:
    """Reverse one PNG-filtered row in place (reference implementation for
    the sequential filters Average/Paeth and the parity oracle in tests)."""
    stride = len(row)
    if ftype == 1:  # Sub
        for i in range(px, stride):
            row[i] = (row[i] + row[i - px]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(stride):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(stride):
            left = row[i - px] if i >= px else 0
            row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(stride):
            a = row[i - px] if i >= px else 0
            b = p_up = int(prev[i])
            c = int(prev[i - px]) if i >= px else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - p_up), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row[i] = (row[i] + pred) & 0xFF
    elif ftype != 0:
        return False
    return True


def _undo_png_predictor(raw: bytes, width: int, height: int,
                        px: int) -> Optional[bytes]:
    """Reverse PNG row filters (PDF /Predictor >= 10): each row of
    ``width·px`` bytes is prefixed by a filter byte (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) applied byte-wise with pixel stride ``px``.

    Vectorized: mod-256 addition is associative, so Sub is a per-channel
    prefix sum within the row and a RUN of Up rows is a column-wise prefix
    sum — one numpy op per run instead of a Python loop per byte (an A4
    300-dpi gray scan is ~8.7M bytes; the byte loop cost ~1.5 s per page
    before OCR even started). Average/Paeth carry output-dependent floors
    and fall back to the scalar row (rare in scan encoders)."""
    import numpy as np

    stride = width * px
    if stride <= 0 or len(raw) < height * (stride + 1):
        return None
    data = np.frombuffer(raw, np.uint8, count=height * (stride + 1))
    data = data.reshape(height, stride + 1)
    ftypes = data[:, 0]
    if int(ftypes.max(initial=0)) > 4:
        return None
    deltas = data[:, 1:]
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint32)
    y = 0
    while y < height:
        f = int(ftypes[y])
        if f == 0 or f == 2:
            end = y + 1
            while end < height and ftypes[end] == f:
                end += 1
            if f == 0:
                out[y:end] = deltas[y:end]
            else:
                # ≤2^16 rows of ≤255 fit uint32; mask to mod-256 at the end
                cum = np.cumsum(deltas[y:end].astype(np.uint32), axis=0)
                out[y:end] = ((cum + prev) & 0xFF).astype(np.uint8)
            prev = out[end - 1].astype(np.uint32)
            y = end
        elif f == 1:
            cum = np.cumsum(
                deltas[y].astype(np.uint32).reshape(width, px), axis=0
            )
            out[y] = (cum & 0xFF).astype(np.uint8).reshape(stride)
            prev = out[y].astype(np.uint32)
            y += 1
        else:  # Average / Paeth: output-dependent, sequential in x
            row = bytearray(deltas[y].tobytes())
            if not _undo_png_predictor_scalar_row(row, prev, f, px):
                return None
            out[y] = np.frombuffer(bytes(row), np.uint8)
            prev = out[y].astype(np.uint32)
            y += 1
    return out.tobytes()


def extract_pdf_images(path: str) -> List[object]:
    """Embedded raster images (scanned pages), decoded to PIL images.

    Walks the object table for ``/Subtype /Image`` XObjects: DCTDecode
    streams are JPEG bytes PIL opens directly; FlateDecode streams are raw
    samples rebuilt from /Width /Height /BitsPerComponent /ColorSpace.
    Returns images in object order (scanned PDFs carry one per page).
    Reference OCRs scanned pages via PyMuPDF render + PaddleOCR
    (pdf_loader.py:75-170); this is the no-dependency acquisition path."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:  # pragma: no cover - PIL ships in this image
        return []

    with open(path, "rb") as fh:
        data = fh.read()
    images: List[object] = []
    for _num, obj in sorted(_parse_objects(data).items()):
        if obj.stream is None or not re.search(rb"/Subtype\s*/Image", obj.header):
            continue
        try:
            if re.search(rb"/Filter\s*/DCTDecode", obj.header):
                images.append(Image.open(BytesIO(obj.stream)).convert("L"))
                continue
            if re.search(rb"/Filter\s*/FlateDecode", obj.header):
                raw = _inflate(obj.stream)
                if raw is None:
                    continue
                width = int(re.search(rb"/Width\s+(\d+)", obj.header).group(1))
                height = int(re.search(rb"/Height\s+(\d+)", obj.header).group(1))
                gray = re.search(rb"/DeviceGray", obj.header) is not None
                mode, px = ("L", 1) if gray else ("RGB", 3)
                pred = re.search(rb"/Predictor\s+(\d+)", obj.header)
                if pred and int(pred.group(1)) >= 10:
                    # PNG predictors: each row is prefixed with a filter
                    # byte; undoing them here instead of skipping prevents
                    # row-shifted noise being OCR'd into gibberish and
                    # silently indexed (common output of PDF writers)
                    raw = _undo_png_predictor(raw, width, height, px)
                    if raw is None:
                        continue
                if len(raw) < width * height * px:
                    continue
                img = Image.frombytes(mode, (width, height),
                                      raw[: width * height * px])
                images.append(img.convert("L"))
        except Exception:  # noqa: BLE001 — skip undecodable images
            continue
    return images


def _content_streams(objects: Dict[int, _Obj]) -> List[bytes]:
    """Page-order-ish content streams: walk /Page objects' /Contents refs;
    fall back to every Flate stream that yields text operators."""
    streams: List[bytes] = []
    page_objs = [o for o in objects.values() if re.search(rb"/Type\s*/Page\b", o.header)]
    ref_re = re.compile(rb"/Contents\s+(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", re.DOTALL)
    seen = set()
    for page in page_objs:
        match = ref_re.search(page.header)
        if not match:
            continue
        refs = (
            [int(n) for n in re.findall(rb"(\d+)\s+\d+\s+R", match.group(1))]
            if match.group(1)
            else [int(match.group(2))]
        )
        for ref in refs:
            obj = objects.get(ref)
            if obj is None or obj.stream is None or ref in seen:
                continue
            seen.add(ref)
            raw = obj.stream
            if re.search(rb"/Filter\s*/FlateDecode", obj.header):
                raw = _inflate(raw) or b""
            streams.append(raw)
    if streams:
        return streams
    # fallback: any stream containing text-show operators
    for num, obj in objects.items():
        if obj.stream is None:
            continue
        raw = obj.stream
        if re.search(rb"/Filter\s*/FlateDecode", obj.header):
            raw = _inflate(raw) or b""
        if b"Tj" in raw or b"TJ" in raw:
            streams.append(raw)
    return streams


def _extract_from_stream(stream: bytes) -> str:
    pieces: List[str] = []
    for match in _TEXT_SHOW_RE.finditer(stream):
        if match.group("nl") is not None:
            # Td/TD/T* line moves delimit rows — preserved so downstream
            # structure recovery (table extraction) sees real lines
            if pieces and not pieces[-1].endswith("\n"):
                pieces.append("\n")
        elif match.group("lit") is not None:
            pieces.append(_decode_pdf_string(_unescape_literal(match.group("lit"))))
        elif match.group("hex") is not None:
            hexstr = re.sub(rb"\s", b"", match.group("hex"))
            if len(hexstr) % 2:
                hexstr += b"0"
            pieces.append(_decode_pdf_string(bytes.fromhex(hexstr.decode("ascii"))))
        else:
            for item in _ARR_ITEM_RE.finditer(match.group("arr")):
                if item.group("lit") is not None:
                    pieces.append(_decode_pdf_string(_unescape_literal(item.group("lit"))))
                else:
                    hexstr = re.sub(rb"\s", b"", item.group("hex"))
                    if len(hexstr) % 2:
                        hexstr += b"0"
                    pieces.append(_decode_pdf_string(bytes.fromhex(hexstr.decode("ascii"))))
    return "".join(pieces)


def extract_pdf_text(path: str) -> Tuple[str, Dict[str, int]]:
    """→ (text, info) where info carries page/object counts."""
    with open(path, "rb") as f:
        data = f.read()
    objects = _parse_objects(data)
    n_pages = sum(1 for o in objects.values() if re.search(rb"/Type\s*/Page\b", o.header))
    parts = []
    for stream in _content_streams(objects):
        text = _extract_from_stream(stream)
        if text.strip():
            parts.append(text)
    return "\n".join(parts), {"pages": n_pages, "objects": len(objects)}


# ------------------------------------------------------------------ writer
def write_simple_pdf(path: str, lines: List[str]) -> None:
    """Tiny single-page PDF writer (test fixture support — latin-1 text)."""
    content = b"BT /F1 12 Tf 50 750 Td " + b" ".join(
        b"(" + line.encode("latin-1", errors="replace")
        .replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        + b") Tj 0 -16 Td"
        for line in lines
    ) + b" ET"
    stream = zlib.compress(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" /Filter /FlateDecode >>\nstream\n"
        + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF"
    ).encode()
    with open(path, "wb") as f:
        f.write(bytes(out))
