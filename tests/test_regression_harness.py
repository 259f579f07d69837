"""Regression-harness internals + one end-to-end harness run on tiny model."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from asr_regression import levenshtein, normalize, rates  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3


def test_normalize():
    assert normalize("Hello,  World!") == "hello world"
    assert normalize("it's a test.") == "it s a test"
    assert normalize("  A  B  ") == "a b"


def test_rates():
    exact, norm = rates("Hello world", "hello, world")
    assert norm == 0.0
    assert exact > 0.0


@pytest.mark.slow
def test_harness_runs_against_tiny_model(tiny_model_dir, speech_like_audio, tmp_path):
    """The harness must run end-to-end: tiny model produces (usually empty)
    transcripts; we generate goldens with it and then verify against itself,
    which must trivially pass."""
    import numpy as np
    import struct

    wav_dir = tmp_path / "samples"
    wav_dir.mkdir()
    pcm = (np.clip(speech_like_audio, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    (wav_dir / "a.wav").write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["SMOLVISION_PLATFORM"] = "cpu"
    binary = f"{sys.executable} -m smolvision_tpu.cli"

    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "asr_regression.py"),
         "-d", tiny_model_dir, "--samples", str(wav_dir),
         "--binary", binary, "--generate-missing"],
        capture_output=True, env=env, timeout=900, cwd=REPO)
    assert gen.returncode == 0, gen.stderr.decode()
    assert (wav_dir / "a.txt").exists()

    check = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "asr_regression.py"),
         "-d", tiny_model_dir, "--samples", str(wav_dir), "--binary", binary],
        capture_output=True, env=env, timeout=900, cwd=REPO)
    assert check.returncode == 0, check.stdout.decode() + check.stderr.decode()
    assert b"ALL PASS" in check.stdout


@pytest.mark.slow
def test_thinker_harness_text_cases_tiny_model(tiny_model_dir):
    """The thinker case table runs end-to-end against the tiny synthetic
    checkpoint: text-category cases in --lenient mode (synthetic weights
    can't pass keyword checks; plumbing, rc, max-length bounds, and the
    greedy-determinism check must all hold)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["SMOLVISION_PLATFORM"] = "cpu"
    binary = f"{sys.executable} -m smolvision_tpu.cli"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "thinker_regression.py"),
         "-d", tiny_model_dir, "--binary", binary,
         "--category", "text", "--lenient"],
        capture_output=True, env=env, timeout=1800, cwd=REPO)
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()
    assert b"ALL PASS" in r.stdout
    # all five text cases ran
    assert r.stdout.count(b"PASS [text]") == 5
