"""Multi-stream serving: concurrent sessions must match solo runs exactly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ms_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    eng.stream_max_new_tokens = 6
    eng.max_tokens = 16
    return eng


def _clips():
    rng = np.random.default_rng(21)
    out = []
    for n in (3, 4, 5):
        t = np.arange(n * 16000) / 16000.0
        sig = (0.3 * np.sin(2 * np.pi * (150 + 30 * n) * t)
               + 0.02 * rng.standard_normal(len(t)))
        out.append(sig.astype(np.float32))
    return out


def test_concurrent_streams_match_solo(ms_engine):
    from smolvision_tpu.runtime import multistream as ms
    from smolvision_tpu.runtime import stream as stream_mod

    clips = _clips()

    # solo references, each on a fresh session view (chunked streaming, not
    # the silent-mode full-context shortcut)
    solo = []
    for c in clips:
        s = ms.clone_session(ms_engine)
        s.token_cb = lambda piece: None
        solo.append(stream_mod.transcribe_stream(s, c))

    pieces = {0: [], 1: [], 2: []}
    texts = ms.run_streams(ms_engine, clips,
                           on_token=lambda i, p: pieces[i].append(p))
    assert texts == solo
    # committed pieces concatenate to the final text per session
    for i, t in enumerate(texts):
        joined = b"".join(pieces[i]).decode("utf-8", errors="replace").strip()
        assert joined == t


def test_session_isolation(ms_engine):
    """A session's KV growth/callbacks must not leak into the parent."""
    from smolvision_tpu.runtime import multistream as ms

    parent_kv = ms_engine._kv
    s = ms.clone_session(ms_engine)
    s._ensure_kv(256)
    assert ms_engine._kv is parent_kv
    assert s.perf is not ms_engine.perf


def test_cli_multi_file_stream(tiny_model_dir, tmp_path):
    """-i a.wav b.wav --stream: one streaming session per file, transcripts
    in file order."""
    import struct
    import subprocess
    import sys as _sys

    sr = 16000
    t = np.arange(sr * 3) / sr
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pcm = (sig * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + b"fmt "
           + struct.pack("<I", len(fmt)) + fmt + b"data"
           + struct.pack("<I", len(pcm)) + pcm)
    p = tmp_path / "s.wav"
    p.write_bytes(wav)

    r = subprocess.run(
        [_sys.executable, "-m", "smolvision_tpu.cli", "-d", tiny_model_dir,
         "-i", str(p), str(p), "--stream", "--silent",
         "--stream-max-new-tokens", "4"],
        capture_output=True, timeout=600,
        env={**__import__("os").environ, "SMOLVISION_PLATFORM": "cpu"})
    assert r.returncode == 0, r.stderr.decode()
    lines = r.stdout.decode().splitlines()
    assert len(lines) == 2
    assert lines[0] == lines[1]  # same file -> identical sessions
