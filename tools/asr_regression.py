#!/usr/bin/env python3
"""ASR regression harness: golden-transcript comparison + differential checks.

Re-implementation of the reference's test strategy (asr_regression.py,
SURVEY.md §4) for the TPU engine — binary-agnostic by design: point
``--binary`` at any command with the qwen_asr CLI contract (transcript on
stdout under --silent) and it runs unchanged, including against the original
C binary for cross-implementation parity checks.

Checks:
  * quality: per-sample transcript vs sibling golden .txt, char-level
    Levenshtein; pass if normalized rate <= 0.20 and exact rate <= 1.00,
  * conditioning: --past-text yes vs no on a long sample; FAIL if the
    conditioned word count < 0.80x unconditioned (collapse detector),
  * streaming: --stdin --stream output vs golden, same thresholds,
  * stream-cache: encoder cache ON vs QWEN_STREAM_NO_ENC_CACHE=1 must match
    EXACTLY,
  * --generate-missing / --refresh-refs: write golden .txt files.

Usage:
  python tools/asr_regression.py -d <model_dir> [--samples DIR] [--binary CMD]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shlex
import subprocess
import sys


def levenshtein(a: str, b: str) -> int:
    """Iterative char-level edit distance, O(len(a)*len(b))."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalize(text: str) -> str:
    """Punctuation -> space, lowercase, collapse whitespace."""
    text = re.sub(r"[^\w\s]", " ", text.lower(), flags=re.UNICODE)
    return re.sub(r"\s+", " ", text).strip()


def rates(hyp: str, ref: str):
    exact = levenshtein(hyp, ref) / max(len(ref), 1)
    norm = levenshtein(normalize(hyp), normalize(ref)) / max(len(normalize(ref)), 1)
    return exact, norm


def run_binary(binary: str, args, stdin_path=None, env_extra=None, timeout=3600):
    cmd = shlex.split(binary) + args
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    stdin = open(stdin_path, "rb") if stdin_path else subprocess.DEVNULL
    try:
        r = subprocess.run(cmd, stdin=stdin, capture_output=True, env=env,
                           timeout=timeout)
    finally:
        if stdin_path:
            stdin.close()
    if r.returncode != 0:
        print(r.stderr.decode(errors="replace")[-2000:], file=sys.stderr)
        raise RuntimeError(f"binary failed ({r.returncode}): {' '.join(cmd)}")
    return r.stdout.decode(errors="replace").strip()


def find_samples(samples_dir: str):
    wavs = sorted(glob.glob(os.path.join(samples_dir, "**", "*.wav"), recursive=True))
    return [(w, os.path.splitext(w)[0] + ".txt") for w in wavs]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--binary", default=f"{sys.executable} -m smolvision_tpu.cli")
    ap.add_argument("--samples", default="/root/reference/samples")
    ap.add_argument("--max-norm-rate", type=float, default=0.20)
    ap.add_argument("--max-exact-rate", type=float, default=1.00)
    ap.add_argument("--segment-sec", type=float, default=0.0)
    ap.add_argument("--generate-missing", action="store_true")
    ap.add_argument("--refresh-refs", action="store_true")
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--check-conditioning", action="store_true")
    ap.add_argument("--check-streaming", action="store_true")
    ap.add_argument("--check-stream-cache", action="store_true")
    ap.add_argument("--limit", type=int, default=0, help="max samples (0=all)")
    args = ap.parse_args()

    base = ["-d", args.model_dir, "--silent"]
    failures = 0
    samples = find_samples(args.samples)
    if args.limit:
        samples = samples[: args.limit]
    if not samples:
        print(f"no samples under {args.samples}", file=sys.stderr)
        return 2

    def transcribe(wav, extra=()):
        out = run_binary(args.binary, base + ["-i", wav, "-S", str(args.segment_sec)]
                         + list(extra))
        if not out and args.segment_sec == 0:
            # fall back to segmented decode like the reference's golden gen
            out = run_binary(args.binary, base + ["-i", wav, "-S", "20"])
        return out

    if args.generate_missing or args.refresh_refs:
        for wav, txt in samples:
            if os.path.exists(txt) and not args.refresh_refs:
                continue
            text = transcribe(wav)
            with open(txt, "w", encoding="utf-8") as f:
                f.write(text + "\n")
            print(f"wrote {txt} ({len(text)} chars)")
        return 0

    if not args.skip_quality:
        for wav, txt in samples:
            if not os.path.exists(txt):
                print(f"SKIP {os.path.basename(wav)} (no golden .txt)")
                continue
            ref = open(txt, encoding="utf-8").read().strip()
            hyp = transcribe(wav)
            exact, norm = rates(hyp, ref)
            ok = norm <= args.max_norm_rate and exact <= args.max_exact_rate
            print(f"{'PASS' if ok else 'FAIL'} {os.path.basename(wav)}: "
                  f"norm={norm:.3f} exact={exact:.3f}")
            if not ok:
                failures += 1

    if args.check_conditioning:
        # longest sample; conditioned decode must not collapse
        wav = max((w for w, _ in samples), key=os.path.getsize)
        seg = ["-S", "10"]
        with_past = run_binary(args.binary, base + ["-i", wav, "--past-text", "yes"] + seg)
        without = run_binary(args.binary, base + ["-i", wav, "--past-text", "no"] + seg)
        wc_with, wc_without = len(with_past.split()), len(without.split())
        ok = wc_with >= 0.80 * wc_without
        print(f"{'PASS' if ok else 'FAIL'} conditioning: {wc_with} vs {wc_without} words")
        failures += 0 if ok else 1

    # Streaming checks run NON-silent: in silent+file mode the engine (like
    # the reference, qwen_asr.c:1418-1436) short-circuits to one full pass,
    # so the chunked path is only exercised with token streaming on.  stdout
    # carries exactly the streamed transcript.
    stream_base = ["-d", args.model_dir]

    if args.check_streaming:
        wav, txt = samples[0]
        if os.path.exists(txt):
            ref = open(txt, encoding="utf-8").read().strip()
            hyp = run_binary(args.binary, stream_base + ["--stdin", "--stream"],
                             stdin_path=wav)
            exact, norm = rates(hyp, ref)
            ok = norm <= args.max_norm_rate
            print(f"{'PASS' if ok else 'FAIL'} streaming: norm={norm:.3f}")
            failures += 0 if ok else 1

    if args.check_stream_cache:
        wav = samples[0][0]
        on = run_binary(args.binary, stream_base + ["-i", wav, "--stream"],
                        env_extra={"QWEN_STREAM_NO_ENC_CACHE": ""})
        off = run_binary(args.binary, stream_base + ["-i", wav, "--stream"],
                         env_extra={"QWEN_STREAM_NO_ENC_CACHE": "1"})
        ok = on == off
        print(f"{'PASS' if ok else 'FAIL'} stream-cache equivalence "
              f"({len(on)} vs {len(off)} chars)")
        failures += 0 if ok else 1

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
