"""Video ingestion: platform detection, download, transcription.

Parity target: reference ``VideoTranscriber``
(``src/core/ingestion/loaders/video_transcriber.py``): YouTube/Bilibili
platform detection + video-id extraction, yt-dlp download with per-video-id
caching, metadata fetch, faster-whisper transcription, traditional→simplified
conversion. This environment ships neither yt-dlp nor an ASR model, so the
downloader and transcriber are injectable interfaces: production wires real
ones (yt-dlp subprocess / a whisper-class ASR), tests and weightless deploys
use mocks — the same strategy the reference's own test suite uses
(tests/conftest.py:102-137 MockVideoTranscriber).
"""

from __future__ import annotations

import re
import shutil
import subprocess
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

from ..config.settings import settings
from .base import BaseIngestionProcessor

# downloader: url -> (audio_path, video_metadata dict)
Downloader = Callable[[str], Tuple[str, Dict[str, Any]]]
# transcriber: audio_path -> {"text": ..., "language": ..., "segments": [...]}
Transcriber = Callable[[str], Dict[str, Any]]

_YT_PATTERNS = (
    re.compile(r"(?:youtube\.com/watch\?v=|youtu\.be/)([A-Za-z0-9_-]{6,})"),
    re.compile(r"youtube\.com/shorts/([A-Za-z0-9_-]{6,})"),
)
_BILI_PATTERNS = (
    re.compile(r"bilibili\.com/video/(BV[A-Za-z0-9]+)"),
    re.compile(r"b23\.tv/([A-Za-z0-9]+)"),
)


def detect_platform(url: str) -> Optional[str]:
    if any(p.search(url) for p in _YT_PATTERNS):
        return "youtube"
    if any(p.search(url) for p in _BILI_PATTERNS):
        return "bilibili"
    return None


def extract_video_id(url: str) -> Optional[str]:
    for pattern in (*_YT_PATTERNS, *_BILI_PATTERNS):
        match = pattern.search(url)
        if match:
            return match.group(1)
    return None


def validate_video_url(url: str) -> Tuple[bool, str]:
    if not isinstance(url, str) or not url.startswith(("http://", "https://")):
        return False, "not an http(s) URL"
    if detect_platform(url) is None:
        return False, "unsupported platform (expected YouTube or Bilibili)"
    if extract_video_id(url) is None:
        return False, "could not extract a video id"
    return True, ""


def make_ytdlp_downloader(cache_dir: Optional[str] = None) -> Downloader:
    """yt-dlp subprocess downloader with per-video-id caching (reference
    video_transcriber.py:152-230). Raises at call time if yt-dlp is absent."""
    cache = Path(cache_dir or settings.media_cache_dir)

    def download(url: str) -> Tuple[str, Dict[str, Any]]:
        if shutil.which("yt-dlp") is None:
            raise RuntimeError("yt-dlp is not installed on this host")
        cache.mkdir(parents=True, exist_ok=True)
        video_id = extract_video_id(url) or "unknown"
        audio_path = cache / f"{video_id}.m4a"
        if not audio_path.exists():
            subprocess.run(
                ["yt-dlp", "-f", "bestaudio[ext=m4a]/bestaudio", "-o", str(audio_path), url],
                check=True, capture_output=True, timeout=600,
            )
        import json as _json

        meta_raw = subprocess.run(
            ["yt-dlp", "--dump-json", "--skip-download", url],
            check=True, capture_output=True, timeout=120,
        ).stdout
        info = _json.loads(meta_raw)
        return str(audio_path), {
            "title": info.get("title"),
            "author": info.get("uploader"),
            "views": info.get("view_count"),
            "duration": info.get("duration"),
            "description": info.get("description"),
            "url": url,
        }

    return download


def to_simplified_chinese(text: str) -> str:
    """Traditional→simplified conversion hook. The reference uses OpenCC
    (video_transcriber.py:58-64); absent here, so this covers the most
    common characters and passes everything else through."""
    pairs = {
        "車": "车", "馬": "马", "來": "来", "時": "时", "間": "间", "説": "说",
        "話": "话", "對": "对", "開": "开", "關": "关", "東": "东", "買": "买",
        "賣": "卖", "點": "点", "為": "为", "無": "无", "電": "电", "動": "动",
        "機": "机", "體": "体", "後": "后", "裡": "里", "國": "国", "語": "语",
        "氣": "气", "壓": "压", "顯": "显", "驅": "驱", "輛": "辆", "駛": "驶",
        "續": "续", "航": "航", "錶": "表", "鐘": "钟", "萬": "万", "優": "优",
        "壞": "坏", "環": "环", "載": "载", "內": "内", "價": "价", "級": "级",
    }
    return text.translate(str.maketrans(pairs))


class VideoProcessor(BaseIngestionProcessor):
    source_type = "video"

    def __init__(
        self,
        downloader: Optional[Downloader] = None,
        transcriber: Optional[Transcriber] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.downloader = downloader
        self.transcriber = transcriber

    def validate_source(self, source: Any) -> Tuple[bool, str]:
        url = source.get("url") if isinstance(source, dict) else source
        return validate_video_url(url if isinstance(url, str) else "")

    def extract_raw_content(self, source: Any) -> Tuple[str, Dict[str, Any]]:
        url = source.get("url") if isinstance(source, dict) else source
        if self.downloader is None or self.transcriber is None:
            raise RuntimeError(
                "video ingestion needs a downloader and a transcriber "
                "(none available in this environment; inject mocks or wire "
                "yt-dlp + an ASR backend)"
            )
        audio_path, video_metadata = self.downloader(url)
        result = self.transcriber(audio_path)
        text = to_simplified_chinese(result.get("text", ""))
        metadata = dict(video_metadata)
        metadata["url"] = url
        metadata["source"] = detect_platform(url)
        metadata["language"] = result.get("language")
        metadata["segments"] = len(result.get("segments", []) or [])
        return text, metadata
