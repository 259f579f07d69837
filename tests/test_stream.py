"""Streaming machinery: repeat detection + end-to-end streaming runs on the
tiny model, including the exact-match cache-equivalence contract
(asr_regression.py:388-513's stream-cache check)."""

import os

import numpy as np
import pytest

from smolvision_tpu.runtime.stream import tail_repeat_blocks


def test_tail_repeat_blocks():
    assert tail_repeat_blocks([], 6) == (1, 0)
    assert tail_repeat_blocks([1], 6) == (1, 0)
    assert tail_repeat_blocks([1, 2, 3], 6) == (1, 0)
    assert tail_repeat_blocks([5, 1, 1, 1], 6) == (3, 1)
    assert tail_repeat_blocks([9, 1, 2, 1, 2, 1, 2], 6) == (3, 2)
    # period larger than max_period is ignored
    seq = [1, 2, 3, 4, 5, 6, 7] * 2
    reps, period = tail_repeat_blocks(seq, 6)
    assert reps == 1
    # leading mismatch does not break trailing repetition
    assert tail_repeat_blocks([7, 8, 3, 3, 3, 3], 6) == (4, 1)


@pytest.fixture(scope="module")
def stream_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    eng.stream_max_new_tokens = 8
    eng.max_tokens = 8
    eng.past_text_conditioning = True
    return eng


def _run_stream(eng, samples):
    from smolvision_tpu.runtime import stream as stream_mod

    tokens = []
    eng.token_cb = lambda piece: tokens.append(piece)
    try:
        text = stream_mod.transcribe_stream(eng, samples)
    finally:
        eng.token_cb = None
    return text, tokens


def test_stream_runs_and_is_deterministic(stream_engine, speech_like_audio):
    text1, _ = _run_stream(stream_engine, speech_like_audio)
    text2, _ = _run_stream(stream_engine, speech_like_audio)
    assert text1 == text2


def test_stream_cache_equivalence(stream_engine, speech_like_audio):
    """Encoder window cache ON vs OFF must produce EXACTLY the same output
    (the reference's hardest streaming invariant, README.md:413)."""
    text_on, _ = _run_stream(stream_engine, speech_like_audio)
    os.environ["QWEN_STREAM_NO_ENC_CACHE"] = "1"
    try:
        text_off, _ = _run_stream(stream_engine, speech_like_audio)
    finally:
        del os.environ["QWEN_STREAM_NO_ENC_CACHE"]
    assert text_on == text_off


def test_stream_silent_shortcircuit(stream_engine, speech_like_audio):
    """--silent + file input: one full-context pass (qwen_asr.c:1418-1436)."""
    from smolvision_tpu.runtime import stream as stream_mod

    stream_engine.token_cb = None
    text = stream_mod.transcribe_stream(stream_engine, speech_like_audio)
    ref, _ = stream_engine.transcribe_segment(speech_like_audio)
    assert text == ref


@pytest.fixture(scope="module")
def windowed_stream_engine(tiny_model_dir):
    """1 s encoder windows so an 8 s stream builds + evicts cached windows
    (MAX_ENC_WINDOWS=4 -> eviction from window 5 on)."""
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32,
                 enc_window_sec=1.0)
    eng.stream_max_new_tokens = 6
    eng.past_text_conditioning = True
    return eng


def _tone(seconds, seed=11):
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    return (0.25 * np.sin(2 * np.pi * 200 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t))
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_stream_window_cache_equivalence_with_cached_windows(windowed_stream_engine):
    """3.5 s audio, 1 s windows: 3 windows get CACHED (no eviction yet); the
    cached path must match the full-recompute path.  NOTE: random tiny
    weights decode degenerately (constant tokens -> the recovery reset
    correctly suppresses emission, matching the reference's behavior for a
    degenerate model), so this equality is about the state machine; the
    content-level exactness check with real weights is
    tools/asr_regression.py --check-stream-cache."""
    eng = windowed_stream_engine
    audio = _tone(3.5)
    text_on, tok_on = _run_stream(eng, audio)
    os.environ["QWEN_STREAM_NO_ENC_CACHE"] = "1"
    try:
        text_off, tok_off = _run_stream(eng, audio)
    finally:
        del os.environ["QWEN_STREAM_NO_ENC_CACHE"]
    assert text_on == text_off
    assert tok_on == tok_off


def test_stream_window_eviction_triggers(windowed_stream_engine, capfd):
    """8 s audio, 1 s windows: windows beyond 4 must be EVICTED (monitor
    symbol on stderr).  Beyond the eviction horizon the cached path sees
    less context than a full re-encode, matching the reference's bounded
    32 s sliding window — so no ON/OFF equality is claimed here."""
    eng = windowed_stream_engine
    eng.monitor = True
    try:
        _run_stream(eng, _tone(8.0))
    finally:
        eng.monitor = False
    err = capfd.readouterr().err
    assert "⟳" in err  # eviction heartbeat
