"""WAV parsing, resampler, and mel frontend tests."""

import io
import struct

import numpy as np
import pytest

from smolvision_tpu.config import HOP_LENGTH, N_FFT
from smolvision_tpu.io.wav import parse_wav_buffer, resample_sinc
from smolvision_tpu.ops import mel as mel_mod


def make_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1)
    raw = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    return hdr + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(raw)) + raw


def test_wav_roundtrip_mono16k():
    x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32) * 0.5
    out = parse_wav_buffer(make_wav(x, 16000))
    assert out.shape == (16000,)
    assert np.max(np.abs(out - x)) < 1e-3  # 16-bit quantization


def test_wav_stereo_downmix():
    x = np.sin(2 * np.pi * 100 * np.arange(1600) / 16000).astype(np.float32) * 0.25
    out = parse_wav_buffer(make_wav(x, 16000, channels=2))
    assert out.shape == (1600,)
    assert np.max(np.abs(out - x)) < 2e-3


def test_resampler_preserves_tone():
    # A 1 kHz tone at 44.1 kHz resampled to 16 kHz must stay a 1 kHz tone.
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample_sinc(x, sr_in, 16000)
    assert len(y) == int(len(x) * 16000 // sr_in)
    # Check dominant frequency via FFT on the middle (avoid edges)
    mid = y[2000:14000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * 16000 / len(mid)
    assert abs(peak_hz - 1000) < 10
    # Amplitude preserved within a few percent
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.05


def test_resampler_antialiases():
    # 10 kHz tone at 48 kHz is above the 8 kHz output Nyquist: must vanish.
    sr_in = 48000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    y = resample_sinc(x, sr_in, 16000)
    assert np.max(np.abs(y[1000:-1000])) < 0.05


def test_mel_matches_torch_stft(speech_like_audio):
    """Cross-check the numpy mel against an independent torch.stft pipeline."""
    import torch

    x = speech_like_audio
    ours = mel_mod.log_mel(x)

    window = torch.hann_window(N_FFT)
    stft = torch.stft(torch.tensor(x), N_FFT, HOP_LENGTH, window=window,
                      return_complex=True, center=True, pad_mode="reflect")
    power = stft[..., :-1].abs() ** 2          # drop last frame
    fb = torch.tensor(mel_mod.mel_filters())    # [128, 201]
    melspec = fb @ power
    log_spec = torch.clamp(melspec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    assert ours.shape == tuple(log_spec.shape)
    assert np.max(np.abs(ours - log_spec.numpy())) < 1e-4


def test_mel_jax_matches_numpy(speech_like_audio):
    import jax.numpy as jnp

    x = speech_like_audio
    ours = mel_mod.log_mel(x)
    n_frames = ours.shape[1]
    frames_cap = n_frames + 7  # deliberately padded bucket
    padded = mel_mod.reflect_pad(x)
    need = frames_cap * HOP_LENGTH + N_FFT
    buf = np.zeros(need, np.float32)
    buf[: len(padded)] = padded
    dev = mel_mod.log_mel_jax(jnp.asarray(buf), jnp.int32(n_frames), frames_cap)
    out = np.asarray(dev)[:, :n_frames]
    assert np.max(np.abs(out - ours)) < 2e-3


def test_num_frames():
    assert mel_mod.num_frames(16000 * 11) == mel_mod.log_mel(np.zeros(16000 * 11, np.float32) + 1e-3).shape[1]


def test_wav_parser_rejects_corrupt_input_cleanly(tmp_path):
    """Truncated/garbage/hostile WAV bytes must raise ValueError (one-line
    CLI error), never an unhandled struct/index/overflow crash."""
    import struct

    from smolvision_tpu.io.wav import load_wav

    rng = np.random.default_rng(13)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    good = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + b"\0" * 8)
    cases = [
        b"",                                    # empty
        b"RIFF",                                # truncated magic
        good[:20],                              # truncated header
        good[:40],                              # truncated fmt
        b"OggS" + good[4:],                     # wrong container
        good[:8] + b"XXXX" + good[12:],         # wrong wave tag
        good.replace(b"data", b"zzzz"),         # missing data chunk
        # oversized declared chunk length
        good[:44] + struct.pack("<I", 0x7FFFFFFF) + good[48:],
        bytes(rng.integers(0, 256, 128, dtype=np.uint8)),  # garbage
    ]
    for i, blob in enumerate(cases):
        p = tmp_path / f"bad{i}.wav"
        p.write_bytes(blob)
        try:
            load_wav(str(p))
        except (ValueError, OSError):
            continue
        except Exception as e:  # noqa: BLE001 - the assertion target
            raise AssertionError(f"case {i}: raised {type(e).__name__}: {e}")
        # parsing 'successfully' is acceptable only for the oversized-length
        # case if the reader clamps; everything else must error
        assert i == 7, f"case {i}: corrupt wav parsed without error"
