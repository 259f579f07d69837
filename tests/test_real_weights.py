"""Real-checkpoint parity tests — skip-guarded, activate the day weights land.

Set SMOLVISION_REAL_MODEL_DIR=/path/to/Qwen3-ASR-0.6B (a real safetensors
checkpoint, e.g. from tools/download_model.py) and these run in the normal
pytest sweep:
  * golden-transcript quality on the reference samples/ (normalized
    Levenshtein <= 0.20, the reference's own bar — asr_regression.py:666-676),
  * cross-binary token parity against the C engine when SMOLVISION_REF_BINARY
    points at a built qwen_asr (byte-exact stdout, offline greedy).

Until then they skip with a one-line reason; tools/cross_parity.py is the
standalone turnkey runner with the full mode matrix.
"""

import glob
import os
import subprocess
import sys

import pytest

REAL_DIR = os.environ.get("SMOLVISION_REAL_MODEL_DIR", "")
REF_BINARY = os.environ.get("SMOLVISION_REF_BINARY", "")
SAMPLES = os.environ.get("SMOLVISION_SAMPLES_DIR", "/root/reference/samples")

pytestmark = pytest.mark.skipif(
    not REAL_DIR,
    reason="set SMOLVISION_REAL_MODEL_DIR to a real checkpoint to enable")


def _run_cli(extra, binary=None):
    cmd = (list(binary) if binary else
           [sys.executable, "-m", "smolvision_tpu.cli"]) + extra
    r = subprocess.run(cmd, capture_output=True, timeout=3600)
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]
    return r.stdout.decode("utf-8", errors="replace").strip()


def _wavs_with_golden():
    out = []
    for pat in ("*.wav", "*/*.wav"):
        for wav in sorted(glob.glob(os.path.join(SAMPLES, pat))):
            txt = wav[:-4] + ".txt"
            if os.path.exists(txt):
                out.append((wav, txt))
    return out


def test_golden_transcript_quality():
    from tools.asr_regression import rates

    pairs = _wavs_with_golden()
    assert pairs, f"no golden samples under {SAMPLES}"
    worst = 0.0
    for wav, txt in pairs[:8]:
        hyp = _run_cli(["-d", REAL_DIR, "--silent", "-i", wav, "-S", "0"])
        ref = open(txt, encoding="utf-8").read().strip()
        _, norm = rates(hyp, ref)
        worst = max(worst, norm)
        assert norm <= 0.20, f"{os.path.basename(wav)}: norm-rate {norm:.3f}"
    print(f"worst norm-rate {worst:.3f}", file=sys.stderr)


@pytest.mark.skipif(not REF_BINARY,
                    reason="set SMOLVISION_REF_BINARY to the built C binary")
def test_cross_binary_exact_offline():
    pairs = _wavs_with_golden()
    for wav, _ in pairs[:4]:
        base = ["-d", REAL_DIR, "--silent", "-i", wav, "-S", "0"]
        ours = _run_cli(base)
        ref = _run_cli(base, binary=[REF_BINARY])
        assert ours == ref, (f"{os.path.basename(wav)} diverged:\n"
                             f"ours: {ours!r}\nref:  {ref!r}")
