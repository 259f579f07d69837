"""CI pin of the real-weights drill glue (docs/REAL_WEIGHTS.md).

tools/real_weights_drill.py is the one-command acceptance path for the day
real Qwen checkpoints land.  No network exists here, so this runs it in
--stand-in mode against the tiny test checkpoint: every stage's plumbing
(checkpoint verify, harness spawn, ref-generation + self-consistency
compare) must work end-to-end; parity is skipped (the full parity matrix
has its own suite, test_c_parity.py).
"""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_drill_stand_in(tiny_model_dir, speech_like_audio, tmp_path):
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
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_drill.py"),
         "--model-dir", tiny_model_dir, "--stand-in", "--skip-parity",
         "--samples", str(wav_dir), "--limit", "1"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    results = json.loads(r.stdout.strip().splitlines()[-1])
    by_stage = {e["stage"]: e["status"] for e in results}
    assert by_stage["acquire"] == "PASS"
    assert by_stage["verify"] == "PASS"
    assert by_stage["parity"] == "SKIP"
    assert by_stage["quality"] == "PASS", results


def test_drill_verify_catches_missing_model(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_drill.py"),
         "--model-dir", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "acquire" in r.stdout and "FAIL" in r.stdout
