"""TPU-native Whisper ASR tests: mel frontend, encoder/decoder shapes,
greedy decode mechanics, transcriber interface (tiny weightless config)."""

import wave

import numpy as np
import pytest
import jax.numpy as jnp

from automative_rag_tpu.ingestion.asr import WhisperTranscriber
from automative_rag_tpu.models.audio import (
    CHUNK_FRAMES,
    CHUNK_SAMPLES,
    SAMPLE_RATE,
    chunk_audio,
    load_wav,
    log_mel_spectrogram,
    mel_filterbank,
)
from automative_rag_tpu.models.whisper import WhisperConfig, WhisperModel


def test_mel_filterbank_shape_and_coverage():
    bank = mel_filterbank(80)
    assert bank.shape == (80, 201)
    assert (bank >= 0).all()
    # every interior filter has support
    assert (bank.sum(axis=1)[1:-1] > 0).all()


def test_log_mel_spectrogram():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=CHUNK_SAMPLES).astype(np.float32) * 0.1)
    bank = jnp.asarray(mel_filterbank(80))
    mel = log_mel_spectrogram(audio, bank)
    assert mel.shape == (CHUNK_FRAMES, 80)
    mel = np.asarray(mel)
    assert np.isfinite(mel).all()
    # Whisper normalization keeps the dynamic range within ~[-1, 1.x]
    assert mel.max() <= 1.5 and mel.min() >= -1.5


def test_chunking():
    audio = np.zeros(CHUNK_SAMPLES + 100, np.float32)
    chunks = chunk_audio(audio)
    assert chunks.shape == (2, CHUNK_SAMPLES)
    assert chunk_audio(np.zeros(10, np.float32)).shape == (1, CHUNK_SAMPLES)


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "tone.wav")
    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    tone = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(tone.tobytes())
    audio = load_wav(path)
    assert audio.shape == (SAMPLE_RATE,)
    assert abs(audio.max() - 0.3) < 0.01


@pytest.fixture(scope="module")
def tiny_model():
    return WhisperModel(WhisperConfig.tiny_test(), seed=0)


def test_greedy_decode_shapes(tiny_model):
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 3000, 80)).astype(np.float32))
    tokens = tiny_model.transcribe_tokens(mel, language="zh", max_tokens=16)
    assert tokens.shape == (2, 16)
    cfg = tiny_model.config
    np.testing.assert_array_equal(
        tokens[:, :4],
        [[cfg.sot_token, cfg.lang_zh_token, cfg.transcribe_token, cfg.no_timestamps_token]] * 2,
    )
    # deterministic greedy
    tokens2 = tiny_model.transcribe_tokens(mel, language="zh", max_tokens=16)
    np.testing.assert_array_equal(tokens, tokens2)


def test_transcriber_interface(tmp_path):
    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(np.zeros(SAMPLE_RATE, np.int16).tobytes())
    transcriber = WhisperTranscriber(config=WhisperConfig.tiny_test(), language="zh")
    out = transcriber(path)
    assert out["language"] == "zh"
    assert out["pretrained"] is False
    assert len(out["segments"]) == 1
    assert isinstance(out["text"], str)


def test_transcriber_plugs_into_video_processor(tmp_path):
    from automative_rag_tpu.ingestion import VideoProcessor

    path = str(tmp_path / "b.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(np.zeros(SAMPLE_RATE // 2, np.int16).tobytes())

    transcriber = WhisperTranscriber(config=WhisperConfig.tiny_test())

    def fake_asr(audio_path):
        out = transcriber(audio_path)
        out["text"] = out["text"] or "宝马X5 2023款测试转写"  # weightless stand-in
        return out

    vp = VideoProcessor(
        downloader=lambda url: (path, {"title": "测试视频"}),
        transcriber=fake_asr,
    )
    docs = vp.process("https://www.youtube.com/watch?v=dQw4w9WgXcQ")
    assert docs and docs[0].metadata["manufacturer"] == "宝马"


def test_cached_decode_matches_full(tiny_model):
    """KV-cached greedy decoding must produce the same tokens as the full
    re-run-per-step reference path."""
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(2, 3000, 80)).astype(np.float32))
    cfg = tiny_model.config
    start = jnp.asarray(
        [cfg.sot_token, cfg.lang_zh_token, cfg.transcribe_token, cfg.no_timestamps_token],
        jnp.int32,
    )
    cached = np.asarray(tiny_model._greedy(tiny_model.params, mel, start, 16))
    full = np.asarray(tiny_model._greedy_uncached(tiny_model.params, mel, start, 16))
    # compare up to each row's first EOS (the reference fills tails with 0,
    # the cached path with EOS)
    for row_c, row_f in zip(cached, full):
        eos_at = np.where(row_f == cfg.eos_token)[0]
        upto = int(eos_at[0]) + 1 if len(eos_at) else len(row_f)
        np.testing.assert_array_equal(row_c[:upto], row_f[:upto])


def test_language_detection(tiny_model):
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.normal(size=(1, 3000, 80)).astype(np.float32))
    lang = tiny_model.detect_language(mel)
    assert lang in ("zh", "en")
    # deterministic
    assert tiny_model.detect_language(mel) == lang


def test_transcriber_auto_language(tmp_path):
    import wave

    from automative_rag_tpu.ingestion.asr import WhisperTranscriber
    from automative_rag_tpu.models.whisper import WhisperConfig

    path = str(tmp_path / "auto.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(np.zeros(SAMPLE_RATE // 2, np.int16).tobytes())
    transcriber = WhisperTranscriber(config=WhisperConfig.tiny_test(), language="auto")
    out = transcriber(path)
    assert out["language"] in ("zh", "en")


def test_timestamp_segment_parser():
    from automative_rag_tpu.models.whisper import WhisperConfig, segments_from_tokens

    cfg = WhisperConfig.base()
    ts = cfg.timestamp_begin_token
    # <|0.00|> hello world <|1.00|><|1.50|> again <|2.00|> <eos>
    row = np.array([cfg.sot_token, cfg.lang_zh_token, cfg.transcribe_token,
                    ts + 0, 100, 200, ts + 50,
                    ts + 75, 300, ts + 100,
                    cfg.eos_token, cfg.eos_token])
    segs = segments_from_tokens(row, cfg)
    assert len(segs) == 2
    assert segs[0] == {"start": 0.0, "end": 1.0, "token_ids": [100, 200]}
    assert segs[1]["start"] == 1.5 and segs[1]["end"] == 2.0
    assert segs[1]["token_ids"] == [300]

    # unterminated trailing segment closes at the 30 s window end
    row2 = np.array([ts + 10, 42, cfg.eos_token])
    segs2 = segments_from_tokens(row2, cfg)
    assert segs2 == [{"start": 0.2, "end": 30.0, "token_ids": [42]}]

    # no timestamp tokens at all → empty (caller falls back to chunk grain)
    row3 = np.array([100, 200, cfg.eos_token])
    assert segments_from_tokens(row3, cfg) == []


def test_timestamps_prompt_decodes(tiny_model):
    """timestamps=True drops no_timestamps from the prompt; decode still
    terminates and prompt tokens are preserved."""
    cfg = tiny_model.config
    mel = jnp.zeros((1, 3000, cfg.n_mels))
    tokens = tiny_model.transcribe_tokens(mel, language="zh", max_tokens=16,
                                          timestamps=True)
    assert tokens.shape == (1, 16)
    assert tokens[0, :3].tolist() == [cfg.sot_token, cfg.lang_zh_token,
                                      cfg.transcribe_token]
    assert tokens[0, 3] != cfg.no_timestamps_token or True  # model's choice


def test_transcriber_timestamp_fallback(tmp_path):
    """Weightless tiny model emits no usable timestamps; segments fall back
    to the 30 s chunk grain instead of vanishing."""
    path = str(tmp_path / "t.wav")
    rng = np.random.default_rng(0)
    samples = (rng.normal(size=SAMPLE_RATE * 35) * 2000).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(samples.tobytes())
    transcriber = WhisperTranscriber(config=WhisperConfig.tiny_test(),
                                     language="zh", timestamps=True)
    out = transcriber(path)
    assert out["segments"]
    assert out["segments"][0]["start"] == 0.0
    assert out["segments"][-1]["end"] >= 30.0


def test_beam_size_one_matches_greedy(tiny_model):
    cfg = tiny_model.config
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(2, 3000, cfg.n_mels)).astype(np.float32))
    greedy = tiny_model.transcribe_tokens(mel, language="zh", max_tokens=12)
    beam1 = tiny_model.transcribe_tokens(mel, language="zh", max_tokens=12,
                                         beam_size=1)
    # beam_size=1 routes to the greedy path
    np.testing.assert_array_equal(beam1, greedy)
    # an explicit width-1 beam search must also reproduce greedy
    start = jnp.asarray([cfg.sot_token, cfg.lang_zh_token, cfg.transcribe_token,
                         cfg.no_timestamps_token], jnp.int32)
    forced, _ = tiny_model._beam(tiny_model.params, mel, start, 12, 1)
    np.testing.assert_array_equal(np.asarray(forced), greedy)


def test_beam_search_improves_or_matches_score(tiny_model):
    cfg = tiny_model.config
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(size=(2, 3000, cfg.n_mels)).astype(np.float32))
    start = jnp.asarray([cfg.sot_token, cfg.lang_zh_token, cfg.transcribe_token,
                         cfg.no_timestamps_token], jnp.int32)
    _, cum1 = tiny_model._beam(tiny_model.params, mel, start, 10, 1)
    tokens3, cum3 = tiny_model._beam(tiny_model.params, mel, start, 10, 3)
    tokens3 = np.asarray(tokens3)
    assert tokens3.shape == (2, 10)
    # prompt preserved on the returned best beam
    np.testing.assert_array_equal(tokens3[:, :4], np.tile(np.asarray(start), (2, 1)))
    best3 = np.asarray(cum3).max(axis=1)
    best1 = np.asarray(cum1).max(axis=1)
    assert np.all(best3 >= best1 - 1e-4), (best3, best1)
    assert np.isfinite(best3).all()


def test_transcriber_beam_size(tmp_path):
    path = str(tmp_path / "beam.wav")
    rng = np.random.default_rng(0)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes((rng.normal(size=SAMPLE_RATE * 2) * 1000).astype(np.int16).tobytes())
    transcriber = WhisperTranscriber(config=WhisperConfig.tiny_test(),
                                     language="zh", beam_size=2)
    out = transcriber(path)
    assert out["language"] == "zh" and out["segments"]


def test_trim_silence():
    from automative_rag_tpu.models.audio import trim_silence

    rng = np.random.default_rng(0)
    speech = rng.normal(size=SAMPLE_RATE).astype(np.float32) * 0.3
    silence = np.zeros(SAMPLE_RATE * 4, np.float32)
    audio = np.concatenate([silence, speech, silence])
    trimmed = trim_silence(audio)
    # most of the 8 s of silence removed, all speech energy kept
    assert len(trimmed) < len(audio) * 0.5
    assert abs((trimmed ** 2).sum() - (speech ** 2).sum()) / (speech ** 2).sum() < 0.02
    # degenerate inputs pass through
    assert len(trim_silence(np.zeros(SAMPLE_RATE, np.float32))) == SAMPLE_RATE
    assert len(trim_silence(speech)) == len(speech)
    assert len(trim_silence(np.zeros(10, np.float32))) == 10


def test_transcriber_vad(tmp_path):
    path = str(tmp_path / "vad.wav")
    rng = np.random.default_rng(1)
    speech = (rng.normal(size=SAMPLE_RATE * 2) * 8000).astype(np.int16)
    silence = np.zeros(SAMPLE_RATE * 40, np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SAMPLE_RATE)
        f.writeframes(np.concatenate([silence, speech]).tobytes())
    # 42 s of audio, 40 silent: with VAD only one 30 s window is encoded
    t = WhisperTranscriber(config=WhisperConfig.tiny_test(), language="zh", vad=True)
    out = t(path)
    assert len(out["segments"]) == 1
    t2 = WhisperTranscriber(config=WhisperConfig.tiny_test(), language="zh")
    assert len(t2(path)["segments"]) == 2


def test_transcribe_stream(tmp_path):
    t = WhisperTranscriber(config=WhisperConfig.tiny_test(), language="zh")
    rng = np.random.default_rng(2)
    # 70 s delivered in uneven pieces → 3 incremental results
    pieces = [rng.normal(size=n).astype(np.float32) * 0.1
              for n in (SAMPLE_RATE * 25, SAMPLE_RATE * 25, SAMPLE_RATE * 20)]
    results = list(t.transcribe_stream(iter(pieces)))
    assert [r["chunk_index"] for r in results] == [0, 1, 2]
    assert results[1]["segments"][0]["start"] == 30.0
    # the flushed tail window reports its true (clamped+offset) duration
    assert results[2]["segments"][-1]["end"] == 70.0
