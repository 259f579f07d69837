"""CLI end-to-end smoke tests (subprocess; the regression-harness contract)."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wav_bytes(samples, rate=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory, speech_like_audio):
    # speech_like_audio is session-scoped but function-signature compatible
    p = tmp_path_factory.mktemp("wavs") / "test.wav"
    p.write_bytes(_wav_bytes(speech_like_audio))
    return str(p)


def _run_cli(args, stdin_bytes=None, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # Tests must not grab the TPU; the CLI respects SMOLVISION_PLATFORM.
    env["SMOLVISION_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "smolvision_tpu.cli"] + args,
        input=stdin_bytes, capture_output=True, timeout=timeout, env=env, cwd=REPO)


def test_cli_offline_silent(tiny_model_dir, wav_path):
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, "--silent",
                  "--max-tokens", "8"])
    assert r.returncode == 0, r.stderr.decode()
    # stdout = transcript line only (may be empty text with random weights)
    assert r.stdout.decode().count("\n") == 1
    assert b"Inference:" not in r.stdout


def test_cli_streaming_perf_contract(tiny_model_dir, wav_path):
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, "--max-tokens", "8"])
    assert r.returncode == 0, r.stderr.decode()
    err = r.stderr.decode()
    assert "Inference:" in err and "text tokens" in err
    assert "realtime)" in err


def test_cli_stdin(tiny_model_dir, speech_like_audio):
    r = _run_cli(["-d", tiny_model_dir, "--stdin", "--silent", "--max-tokens", "4"],
                 stdin_bytes=_wav_bytes(speech_like_audio))
    assert r.returncode == 0, r.stderr.decode()


def test_cli_thinker_text(tiny_model_dir):
    r = _run_cli(["-d", tiny_model_dir, "--thinker", "--text", "hello",
                  "--silent", "--max-tokens", "4", "--temperature", "0"])
    assert r.returncode == 0, r.stderr.decode()


def test_cli_multi_file_batch(tiny_model_dir, wav_path):
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, wav_path, wav_path,
                  "--silent", "--max-tokens", "6"])
    assert r.returncode == 0, r.stderr.decode()
    # one transcript line per input file
    assert r.stdout.decode().count("\n") == 3


def test_cli_multi_file_serve(tiny_model_dir, wav_path):
    """--serve N routes multi-file input through the continuous-batching
    scheduler; transcript contract identical to the one-shot batch, plus a
    Serve: TTFT/completion latency line on stderr."""
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, wav_path, wav_path,
                  "--serve", "2", "--max-tokens", "6"])
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().count("\n") == 3
    assert b"Serve: ttft p50" in r.stderr


def test_cli_multi_file_rejects_thinker(tiny_model_dir, wav_path):
    # multi-file --stream is multi-stream serving (test_multistream.py);
    # thinker mode stays single-input
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, wav_path, "--thinker"])
    assert r.returncode == 1
    assert b"only supported in plain Qwen3 ASR" in r.stderr


def test_cli_bad_language(tiny_model_dir, wav_path):
    r = _run_cli(["-d", tiny_model_dir, "-i", wav_path, "--language", "klingon"])
    assert r.returncode == 1
    assert b"Supported languages" in r.stderr


def test_cli_q25_multi_file_rejected(tiny_q25_model_dir, wav_path):
    """q25 has no batched ASR path — multi-file input must error, like the
    reference whose q25 branch (main.c:218-285) is single-input only."""
    r = _run_cli(["-d", tiny_q25_model_dir, "-i", wav_path, wav_path])
    assert r.returncode == 1
    assert b"only supported in plain Qwen3 ASR" in r.stderr


def test_cli_q25_stream_routes_to_thinker(tiny_q25_model_dir, wav_path):
    """The reference's q25 branch never consults stream_mode
    (main.c:218-285): --stream on a q25 checkpoint runs the thinker-route
    ASR pass (q25_transcribe_audio semantics), not the streaming state
    machine.  Pin that: rc 0, single transcript line, standard perf
    contract on stderr (not the streaming 'Streams:' summary)."""
    r = _run_cli(["-d", tiny_q25_model_dir, "-i", wav_path, "--stream",
                  "--max-tokens", "6", "--temperature", "0"])
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().count("\n") == 1
    err = r.stderr.decode()
    assert "Inference:" in err and "Streams:" not in err


def test_cli_f32_selects_f32_kv_cache(tiny_model_dir, monkeypatch):
    """--f32 is the C engine's arithmetic family END TO END: f32 weights
    AND an f32 KV cache (kv_cache_k/v are float*, qwen_asr_decoder.c:
    168-175).  A bf16 cache under --f32 injects ~1e-2 logit drift and
    flipped a 0.02-gap step in the 1.7B stream parity run
    (docs/PARITY_C.md) — pin the dtype wiring in-process."""
    import jax.numpy as jnp

    import smolvision_tpu.cli as cli
    import smolvision_tpu.runtime.engine as eng_mod

    seen = {}

    def fake_engine(model_dir, **kw):
        seen.update(kw)
        raise RuntimeError("probe")   # cli reports load failure, rc=1

    monkeypatch.setattr(eng_mod, "Engine", fake_engine)
    for flags, want in ((["--f32"], jnp.float32), ([], jnp.bfloat16)):
        seen.clear()
        rc = cli.main(["-d", tiny_model_dir, "-i", "/dev/null"] + flags)
        assert rc == 1 and seen, "fake Engine was not reached"
        assert seen.get("param_dtype") == want, flags
        assert seen.get("kv_dtype") == want, flags
