"""Audio frontend: log-mel spectrograms (Whisper-compatible).

The reference delegates transcription to faster-whisper's CTranslate2 CUDA
backend (``src/core/ingestion/loaders/video_transcriber.py:300-332``); here
the whole ASR path is TPU-native, starting with this frontend: framing + STFT
(jnp.fft on device) + mel filterbank, using Whisper's constants (16 kHz,
n_fft 400, hop 160, 80/128 mels, log10 with dynamic-range clamp).
"""

from __future__ import annotations

import wave
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30
CHUNK_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS
CHUNK_FRAMES = CHUNK_SAMPLES // HOP_LENGTH  # 3000


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_mels, n_fft//2 + 1]."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bank = np.zeros((n_mels, n_freqs), np.float32)
    for m in range(n_mels):
        lo, center, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(center - lo, 1e-10)
        down = (hi - freqs) / max(hi - center, 1e-10)
        bank[m] = np.maximum(0.0, np.minimum(up, down))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return bank * enorm[:, None]


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jax.Array, mel_bank: jax.Array, n_mels: int = 80) -> jax.Array:
    """audio [CHUNK_SAMPLES] float32 → log-mel [n_frames, n_mels].

    Whisper recipe: Hann window, |STFT|², mel projection, log10 clamped to
    (max − 8), scaled to ~[-1, 1].
    """
    window = jnp.hanning(N_FFT + 1)[:-1]
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = (padded.shape[0] - N_FFT) // HOP_LENGTH + 1
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    frames = padded[idx] * window[None, :]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # [n_frames, n_freqs]
    mel = spec @ mel_bank.T  # [n_frames, n_mels]
    log_mel = jnp.log10(jnp.maximum(mel, 1e-10))
    log_mel = jnp.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0)[: CHUNK_FRAMES]


def load_wav(path: str) -> np.ndarray:
    """Read a mono 16 kHz PCM wav (stdlib; media transcoding to this format
    is the downloader's job — the reference used yt-dlp/ffmpeg similarly)."""
    with wave.open(path, "rb") as f:
        if f.getframerate() != SAMPLE_RATE:
            raise ValueError(f"expected {SAMPLE_RATE} Hz wav, got {f.getframerate()}")
        raw = f.readframes(f.getnframes())
        width = f.getsampwidth()
        channels = f.getnchannels()
    if width == 2:
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        audio = np.frombuffer(raw, np.int32).astype(np.float32) / 2**31
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        audio = audio.reshape(-1, channels).mean(axis=1)
    return audio


def chunk_audio(audio: np.ndarray) -> np.ndarray:
    """Split/pad to 30 s chunks → [n_chunks, CHUNK_SAMPLES]."""
    n_chunks = max(1, -(-len(audio) // CHUNK_SAMPLES))
    padded = np.zeros(n_chunks * CHUNK_SAMPLES, np.float32)
    padded[: len(audio)] = audio
    return padded.reshape(n_chunks, CHUNK_SAMPLES)


def trim_silence(
    audio: np.ndarray,
    frame_ms: int = 30,
    threshold_db: float = -40.0,
    pad_frames: int = 4,
) -> np.ndarray:
    """Energy-based VAD: drop silent spans before chunking (the reference's
    faster-whisper call runs with ``vad_filter=True``,
    ``video_transcriber.py:300-332``). Frames whose RMS is below
    ``threshold_db`` relative to the loudest frame are removed, keeping
    ``pad_frames`` of context around speech so word onsets survive. Pure
    host-side preprocessing — every encoder FLOP afterwards is spent on
    speech."""
    audio = np.asarray(audio, np.float32)
    frame = SAMPLE_RATE * frame_ms // 1000
    if len(audio) < frame:
        return audio
    n_frames = len(audio) // frame
    frames = audio[: n_frames * frame].reshape(n_frames, frame)
    rms = np.sqrt((frames ** 2).mean(axis=1) + 1e-12)
    peak = rms.max()
    if peak <= 1e-8:
        return audio  # pure silence/zeros: nothing meaningful to trim
    active = 20.0 * np.log10(rms / peak) > threshold_db
    if active.all():
        return audio
    # dilate the active mask so speech edges keep context
    kernel = np.ones(2 * pad_frames + 1, bool)
    dilated = np.convolve(active, kernel, mode="same") > 0
    kept = frames[dilated].reshape(-1)
    tail = audio[n_frames * frame :] if dilated[-1] else np.zeros(0, np.float32)
    out = np.concatenate([kept, tail]) if len(tail) else kept
    return out if len(out) else audio
