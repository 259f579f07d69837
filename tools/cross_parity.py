#!/usr/bin/env python3
"""Cross-binary token parity: the reference C engine vs the TPU engine.

The day real Qwen weights appear (download via tools/download_model.py, or
mount a checkpoint dir), ONE command produces a parity report:

    python tools/cross_parity.py -d /path/to/Qwen3-ASR-0.6B \
        --ref-binary /root/reference/qwen_asr

It runs BOTH engines over every sample (offline -S 0, segmented -S 30,
streaming --stream) with identical flags and compares transcripts:
  * exact: byte-identical stdout (the reference's own bar for stream-cache
    equivalence, asr_regression.py:486-494),
  * normalized: punctuation/case-folded Levenshtein rate (quality bar
    <= 0.20, asr_regression.py:666-676).

Exit 0 iff every sample is exact in every mode; a per-sample table goes to
stderr either way.  Offline exactness is the expectation: both engines decode
greedily from the same weights (SURVEY.md north star: token-exact).

The pytest twin (tests/test_real_weights.py) runs automatically when
SMOLVISION_REAL_MODEL_DIR is set (and compares against the C binary too when
SMOLVISION_REF_BINARY is set) — nothing to wire up later.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.asr_regression import normalize, rates  # noqa: E402


def run(cmd, stdin_path=None, env_extra=None, timeout=3600):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    stdin = open(stdin_path, "rb") if stdin_path else subprocess.DEVNULL
    try:
        r = subprocess.run(cmd, stdin=stdin, capture_output=True, timeout=timeout,
                           env=env)
    finally:
        if stdin_path:
            stdin.close()
    if r.returncode != 0:
        raise RuntimeError(
            f"command failed ({r.returncode}): {' '.join(cmd)}\n"
            f"{r.stderr.decode(errors='replace')[-2000:]}")
    return r.stdout.decode("utf-8", errors="replace").strip()


def collect_wavs(samples_dir: str, limit: int = 0):
    wavs = sorted(glob.glob(os.path.join(samples_dir, "*.wav")))
    wavs += sorted(glob.glob(os.path.join(samples_dir, "*", "*.wav")))
    return wavs[:limit] if limit else wavs


MODES = {
    "offline": ["-S", "0"],
    "segmented": ["-S", "30", "-W", "3"],
    "stream": ["--stream"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--ref-binary", default="/root/reference/qwen_asr",
                    help="reference C binary (built from /root/reference)")
    ap.add_argument("--samples", default="/root/reference/samples")
    ap.add_argument("--modes", default="offline,segmented,stream")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--max-norm-rate", type=float, default=0.20)
    args = ap.parse_args()

    ours = [sys.executable, "-m", "smolvision_tpu.cli"]
    theirs = [args.ref_binary]
    wavs = collect_wavs(args.samples, args.limit)
    if not wavs:
        print(f"no samples under {args.samples}", file=sys.stderr)
        return 2

    n_exact = n_total = 0
    worst = 0.0
    failures = []
    for mode in args.modes.split(","):
        flags = MODES[mode.strip()]
        for wav in wavs:
            base = ["-d", args.model_dir, "--silent", "-i", wav] + flags
            try:
                a = run(ours + base)
                b = run(theirs + base)
            except RuntimeError as e:
                print(f"ERROR {mode} {os.path.basename(wav)}: {e}",
                      file=sys.stderr)
                failures.append((mode, wav, "run-error"))
                continue
            n_total += 1
            exact = a == b
            n_exact += exact
            _, norm = rates(a, b)
            worst = max(worst, norm)
            status = "EXACT" if exact else f"norm-rate {norm:.3f}"
            print(f"{mode:10s} {os.path.basename(wav):55s} {status}",
                  file=sys.stderr)
            if not exact and norm > args.max_norm_rate:
                failures.append((mode, wav, f"norm-rate {norm:.3f}"))

    print(f"\ncross-parity: {n_exact}/{n_total} exact, worst norm-rate "
          f"{worst:.3f}, {len(failures)} hard failures", file=sys.stderr)
    for mode, wav, why in failures:
        print(f"  FAIL {mode} {os.path.basename(wav)}: {why}", file=sys.stderr)
    return 0 if (n_exact == n_total and not failures) else 1


if __name__ == "__main__":
    sys.exit(main())
