"""ASR transcriber on the TPU-native Whisper model.

Implements the ``Transcriber`` interface of ``video_processor`` (audio path →
{"text", "language", "segments"}), replacing the reference's faster-whisper
call (``video_transcriber.py:300-332``). Audio arrives as 16 kHz mono wav
(the downloader's job, as ffmpeg was in the reference's); 30 s chunks run
batched through the encoder-decoder with greedy decoding.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..models.audio import (
    CHUNK_SAMPLES,
    CHUNK_SECONDS,
    SAMPLE_RATE,
    chunk_audio,
    load_wav,
    log_mel_spectrogram,
    mel_filterbank,
    trim_silence,
)
from ..models.whisper import WhisperConfig, WhisperModel


def _config_from_hf(path: str) -> Optional[WhisperConfig]:
    cfg_file = Path(path) / "config.json"
    if not cfg_file.exists():
        return None
    raw = json.loads(cfg_file.read_text())
    return WhisperConfig(
        n_mels=raw.get("num_mel_bins", 80),
        d_model=raw.get("d_model", 512),
        encoder_layers=raw.get("encoder_layers", 6),
        decoder_layers=raw.get("decoder_layers", 6),
        n_heads=raw.get("encoder_attention_heads", 8),
        vocab_size=raw.get("vocab_size", 51865),
        max_source_positions=raw.get("max_source_positions", 1500),
        max_target_positions=raw.get("max_target_positions", 448),
        eos_token=raw.get("eos_token_id", 50257),
        sot_token=raw.get("decoder_start_token_id", 50258),
    )


class WhisperTranscriber:
    def __init__(
        self,
        model_path: str = "",
        config: Optional[WhisperConfig] = None,
        language: str = "auto",
        batch_chunks: int = 4,
        timestamps: bool = False,
        beam_size: int = 1,
        vad: bool = False,
    ):
        if config is None:
            config = _config_from_hf(model_path) if model_path else None
        self.config = config or WhisperConfig.base()
        self.model = WhisperModel(self.config, weights_path=model_path)
        self.language = language
        self.batch_chunks = batch_chunks
        self.timestamps = timestamps
        self.beam_size = beam_size
        self.vad = vad
        self._mel_bank = jnp.asarray(mel_filterbank(self.config.n_mels))
        self._tokenizer = None
        if model_path and Path(model_path).exists():
            try:
                from transformers import AutoTokenizer

                self._tokenizer = AutoTokenizer.from_pretrained(
                    model_path, local_files_only=True
                )
            except Exception:
                self._tokenizer = None

    def _decode_rows(self, token_rows: np.ndarray) -> list:
        if self._tokenizer is None:
            # weightless mode: no meaningful text exists; emit nothing rather
            # than garbage (the pipeline stays exercisable via mocks)
            return ["" for _ in token_rows]
        texts = []
        for row in token_rows:
            ids = [t for t in row.tolist() if t < self.config.sot_token]
            texts.append(self._tokenizer.decode(ids, skip_special_tokens=True))
        return texts

    def _build_segments(self, tokens: np.ndarray, texts: list) -> list:
        """Per-chunk segments; with ``timestamps=True`` each chunk is further
        split at the model's timestamp tokens (absolute times = chunk offset
        + in-window time), matching faster-whisper's segment output shape."""
        if self.timestamps:
            from ..models.whisper import segments_from_tokens

            segments = []
            for i, row in enumerate(tokens):
                offset = i * CHUNK_SECONDS
                for seg in segments_from_tokens(row, self.config):
                    text = (
                        self._tokenizer.decode(seg["token_ids"],
                                               skip_special_tokens=True)
                        if self._tokenizer is not None else ""
                    )
                    segments.append({
                        "start": offset + seg["start"],
                        "end": offset + seg["end"],
                        "tokens": len(seg["token_ids"]),
                        "text": text,
                    })
            if segments:
                return segments
            # model emitted no timestamp tokens: fall through to chunk grain
        return [
            {"start": i * CHUNK_SECONDS, "end": (i + 1) * CHUNK_SECONDS,
             "tokens": int((row != self.config.eos_token).sum()),
             "text": texts[i]}
            for i, row in enumerate(tokens)
        ]

    def transcribe_array(self, audio: np.ndarray) -> Dict[str, Any]:
        audio = np.asarray(audio, np.float32)
        if self.vad:
            # drop silence before chunking: encoder FLOPs go to speech only
            # (reference runs faster-whisper with vad_filter=True; note
            # reported segment times are then in *trimmed* time)
            audio = trim_silence(audio)
        chunks = chunk_audio(audio)
        mels = jnp.stack(
            [log_mel_spectrogram(jnp.asarray(c), self._mel_bank, self.config.n_mels)
             for c in chunks]
        )
        language = self.language
        if language == "auto":
            language = self.model.detect_language(mels[:1])
        token_rows = []
        for i in range(0, mels.shape[0], self.batch_chunks):
            token_rows.append(self.model.transcribe_tokens(
                mels[i : i + self.batch_chunks], language=language,
                timestamps=self.timestamps, beam_size=self.beam_size,
            ))
        tokens = np.concatenate(token_rows)
        texts = self._decode_rows(tokens)
        segments = self._build_segments(tokens, texts)
        # the final chunk is zero-padded to 30 s; clamp reported times to the
        # real audio duration (faster-whisper reports true durations)
        duration = len(audio) / SAMPLE_RATE
        for seg in segments:
            seg["end"] = min(seg["end"], duration)
            seg["start"] = min(seg["start"], duration)
        return {
            "text": "".join(texts),
            "language": language,
            "segments": segments,
            "pretrained": self.model.pretrained,
        }

    def transcribe_stream(self, audio_iter) -> "Iterator[Dict[str, Any]]":
        """Incremental transcription: consume an iterable of float32 sample
        arrays (any granularity), yield one result per completed 30 s window
        as soon as its audio is available — first text arrives ~30 s into a
        live feed instead of after the whole file (the reference's
        faster-whisper path is strictly offline). The trailing partial window
        is flushed (zero-padded) when the iterator ends."""
        buffer = np.zeros(0, np.float32)
        index = 0

        def _emit(chunk: np.ndarray, index: int) -> Dict[str, Any]:
            out = self.transcribe_array(chunk)
            offset = index * CHUNK_SECONDS
            for seg in out["segments"]:
                seg["start"] += offset
                seg["end"] += offset
            out["chunk_index"] = index
            return out

        for piece in audio_iter:
            buffer = np.concatenate([buffer, np.asarray(piece, np.float32)])
            while len(buffer) >= CHUNK_SAMPLES:
                yield _emit(buffer[:CHUNK_SAMPLES], index)
                buffer = buffer[CHUNK_SAMPLES:]
                index += 1
        if len(buffer):
            yield _emit(buffer, index)

    def __call__(self, audio_path: str) -> Dict[str, Any]:
        return self.transcribe_array(load_wav(audio_path))
