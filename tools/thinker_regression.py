#!/usr/bin/env python3
"""Thinker regression: keyword checks on sampled output + greedy determinism.

Re-implementation of the reference's thinker test strategy
(thinker_regression.py, SURVEY.md §4): sampling is nondeterministic, so
quality is checked by required/forbidden keywords and length bounds, plus a
greedy determinism check (temp=0 twice -> identical output).  Binary-agnostic
via --binary.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys

DEFAULT_CASES = [
    {
        "name": "arithmetic",
        "text": "What is 2+2? Answer with just the number.",
        "prompt": "You are a helpful assistant",
        "required": ["4"],
        "forbidden": [],
        "min_len": 1,
        "max_len": 2000,
    },
    {
        "name": "capital",
        "text": "What is the capital of France? One word.",
        "prompt": "You are a helpful assistant",
        "required": ["Paris"],
        "forbidden": [],
        "min_len": 1,
        "max_len": 2000,
    },
]


def run(binary, model_dir, text, prompt, temp, max_tokens=256, seed=0):
    cmd = shlex.split(binary) + [
        "-d", model_dir, "--thinker", "--silent",
        "--text", text, "--prompt", prompt,
        "--temperature", str(temp), "--max-tokens", str(max_tokens),
        "--seed", str(seed),
    ]
    r = subprocess.run(cmd, capture_output=True, timeout=3600)
    if r.returncode != 0:
        print(r.stderr.decode(errors="replace")[-2000:], file=sys.stderr)
        raise RuntimeError(f"binary failed: {' '.join(cmd)}")
    return r.stdout.decode(errors="replace").strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--binary", default=f"{sys.executable} -m smolvision_tpu.cli")
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--skip-keywords", action="store_true",
                    help="only run the greedy determinism check")
    args = ap.parse_args()

    failures = 0

    if not args.skip_keywords:
        for case in DEFAULT_CASES:
            out = run(args.binary, args.model_dir, case["text"], case["prompt"],
                      args.temperature)
            ok = (
                all(k.lower() in out.lower() for k in case["required"])
                and not any(k.lower() in out.lower() for k in case["forbidden"])
                and case["min_len"] <= len(out) <= case["max_len"]
            )
            print(f"{'PASS' if ok else 'FAIL'} {case['name']}: {out[:80]!r}")
            failures += 0 if ok else 1

    # greedy determinism: temp=0 twice must match exactly
    a = run(args.binary, args.model_dir, "Count from 1 to 5.",
            "You are a helpful assistant", 0.0, max_tokens=64)
    b = run(args.binary, args.model_dir, "Count from 1 to 5.",
            "You are a helpful assistant", 0.0, max_tokens=64)
    ok = a == b
    print(f"{'PASS' if ok else 'FAIL'} greedy determinism ({len(a)} chars)")
    failures += 0 if ok else 1

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
