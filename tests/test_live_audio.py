"""LiveAudio producer thread: WAV header validation, chunked append, EOF."""

import io
import struct
import threading
import time

import numpy as np

from smolvision_tpu.io.live import LiveAudio


def _wav_header(n_samples, rate=16000, channels=1, bits=16):
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, bits)
    data_len = n_samples * 2
    return (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_len))


class SlowStream(io.RawIOBase):
    """Feeds bytes in small increments to exercise the chunk loop."""

    def __init__(self, data, step=8192):
        self.data = data
        self.pos = 0
        self.step = step

    def read(self, n=-1):
        if self.pos >= len(self.data):
            return b""
        n = min(n if n >= 0 else self.step, self.step, len(self.data) - self.pos)
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


def _start(stream):
    live = LiveAudio()
    t = threading.Thread(target=live._reader, args=(stream,), daemon=True)
    t.start()
    return live, t


def test_live_wav_stream():
    samples = (np.sin(np.arange(32000) / 20.0) * 0.4 * 32767).astype("<i2")
    data = _wav_header(len(samples)) + samples.tobytes()
    live, t = _start(SlowStream(data))
    eof = live.wait_for(32000)
    t.join(timeout=10)
    off, got, eof = live.snapshot_and_reset()
    assert off == 0
    assert len(got) == 32000
    np.testing.assert_allclose(got, samples.astype(np.float32) / 32768.0, atol=1e-6)
    assert eof


def test_live_raw_s16le():
    samples = (np.ones(16000) * 0.25 * 32767).astype("<i2")
    live, t = _start(SlowStream(samples.tobytes()))
    live.wait_for(16000)
    t.join(timeout=10)
    _, got, eof = live.snapshot_and_reset()
    assert len(got) == 16000 and eof


def test_live_rejects_wrong_rate(capsys):
    samples = (np.zeros(100)).astype("<i2")
    data = _wav_header(len(samples), rate=44100) + samples.tobytes()
    live, t = _start(SlowStream(data))
    t.join(timeout=10)
    _, got, eof = live.snapshot_and_reset()
    assert eof and len(got) == 0


def test_live_incremental_consumption():
    """Consumer mirrors + resets; producer keeps appending."""
    samples = (np.arange(48000) % 100).astype("<i2")
    live, t = _start(SlowStream(samples.tobytes(), step=16000))
    total = []
    base = 0
    while True:
        eof = live.wait_for(base + 8000)
        off, got, eof = live.snapshot_and_reset()
        assert off == base
        total.extend(got.tolist())
        base = off + len(got)
        if eof and base >= 48000:
            break
    assert len(total) == 48000


def test_live_stream_end_to_end(tiny_model_dir):
    """Full live streaming through the engine with a throttled fake stream:
    exercises the live mirror buffer, consumed-sample dropping before
    full_end, and EOF termination (qwen_asr.c live path semantics)."""
    import jax.numpy as jnp
    import struct

    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32,
                 enc_window_sec=1.0)  # 1 s windows -> live buffer dropping runs
    eng.stream_max_new_tokens = 4
    eng.past_text_conditioning = True
    eng.token_cb = lambda b: None

    sr = 16000
    t = np.arange(5 * sr)
    samples = (np.sin(t / 15.0) * 0.3 * 32767).astype("<i2")
    data = _wav_header(len(samples)) + samples.tobytes()

    live, thread = _start(SlowStream(data, step=32000))
    text = stream_mod.transcribe_stream_live(eng, live)
    thread.join(timeout=10)
    assert text is not None  # ran to EOF without deadlock


def test_live_odd_trailing_byte_sets_eof():
    """A stream truncated mid-sample (odd byte count) must still terminate
    the reader and signal EOF — the final odd byte can never complete a
    sample, and looping on it would spin forever."""
    samples = (np.ones(1000) * 0.25 * 32767).astype("<i2")
    live, t = _start(SlowStream(samples.tobytes() + b"\x7f"))
    live.wait_for(1000)
    t.join(timeout=10)
    assert not t.is_alive()
    _, got, eof = live.snapshot_and_reset()
    assert len(got) == 1000 and eof
