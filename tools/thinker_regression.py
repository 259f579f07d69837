#!/usr/bin/env python3
"""Thinker regression: keyword/length checks on sampled output + greedy
determinism.

Re-implementation of the reference's thinker test strategy
(thinker_regression.py:69-226, SURVEY.md §4): sampling is nondeterministic,
so quality is judged by required/forbidden keywords and output-length bounds
over a case table spanning three categories — audio-prompted Q&A, text-only,
and audio+text combined — each case with its own sampling parameters.  A
greedy determinism check (temp=0 twice -> byte-identical output) closes the
run (reference :393-419).

Binary-agnostic via --binary (works against the C engine too).  Keyword
cases need REAL weights to pass; with synthetic checkpoints run
`--category text --lenient` (structure/rc/length only) or `--skip-keywords`
(determinism only) — that is what CI does (tests/test_regression_harness.py).
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from dataclasses import dataclass, field
from typing import List, Optional

SAMPLES_ROOT = "/root/reference/samples"
NOTLD = "night_of_the_living_dead_1968"


@dataclass
class Case:
    name: str
    prompt: str                      # system prompt (--prompt)
    audio: Optional[str] = None      # wav path relative to samples root
    text: Optional[str] = None       # user text (--text)
    required: List[str] = field(default_factory=list)   # all must appear
    forbidden: List[str] = field(default_factory=list)  # none may appear
    min_len: int = 5
    max_len: int = 0                 # 0 = unbounded
    temperature: float = 0.3
    repeat_penalty: float = 1.2
    top_k: int = 40
    max_tokens: int = 256
    category: str = "general"


CASES = [
    # ---- audio-prompted -------------------------------------------------
    Case("speaker_identity", "Who is the speaker, what was his job?",
         audio="jfk.wav", required=["kennedy", "president"],
         category="audio"),
    Case("speech_topic",
         "What is the main topic of this speech? Answer in one sentence.",
         audio="jfk.wav", min_len=20, max_tokens=128, category="audio"),
    Case("spoken_language",
         "What language is being spoken? Answer with just the language name.",
         audio="jfk.wav", required=["english"], temperature=0.1,
         max_tokens=32, category="audio"),
    Case("speech_sentiment",
         "Describe the tone and sentiment of this speech in 2-3 words.",
         audio="jfk.wav", min_len=3, max_tokens=64, category="audio"),
    Case("scene_description",
         "Describe what is happening in this audio clip. Who is talking "
         "and what are they saying?",
         audio=f"{NOTLD}/45s_dont_be_afraid_of_me.wav", min_len=20,
         category="audio"),
    # ---- text-only ------------------------------------------------------
    Case("math_simple", "You are a helpful assistant. Be concise.",
         text="What is 2+2?", required=["4"], min_len=1, max_tokens=64,
         category="text"),
    Case("capital_france", "You are a helpful assistant. Answer in one word.",
         text="What is the capital of France?", required=["paris"],
         temperature=0.1, max_tokens=32, category="text"),
    Case("translate_french", "You are a translator. Translate to French.",
         text="Good morning", required=["bonjour"], max_tokens=32,
         category="text"),
    Case("list_primes", "You are a math tutor. Be concise.",
         text="List the first 4 prime numbers, separated by commas.",
         required=["2", "3", "5", "7"], forbidden=["9"], min_len=1,
         max_tokens=64, category="text"),
    Case("creative_poem", "You are a creative writer.",
         text="Write a short 4-line poem about the ocean.", min_len=40,
         temperature=0.8, top_k=50, category="text"),
    # ---- audio + text combined ------------------------------------------
    Case("summarize_audio", "You are a helpful assistant.",
         audio="jfk.wav", text="Summarize this audio in one sentence.",
         min_len=20, max_tokens=128, category="combined"),
    Case("audio_outlook", "Answer the user's question based on the audio.",
         audio="jfk.wav",
         text="Is the speaker optimistic or pessimistic about the future?",
         min_len=10, max_tokens=128, category="combined"),
]


def run(binary, model_dir, case: Case, samples_root: str,
        temp_override=None, seed=0) -> str:
    cmd = shlex.split(binary) + [
        "-d", model_dir, "--thinker", "--silent",
        "--prompt", case.prompt,
        "--temperature", str(temp_override if temp_override is not None
                             else case.temperature),
        "--repeat-penalty", str(case.repeat_penalty),
        "--top-k", str(case.top_k),
        "--max-tokens", str(case.max_tokens),
        "--seed", str(seed),
    ]
    if case.audio:
        cmd += ["-i", f"{samples_root}/{case.audio}"]
    if case.text:
        cmd += ["--text", case.text]
    r = subprocess.run(cmd, capture_output=True, timeout=3600)
    if r.returncode != 0:
        print(r.stderr.decode(errors="replace")[-2000:], file=sys.stderr)
        raise RuntimeError(f"binary failed: {' '.join(cmd)}")
    return r.stdout.decode(errors="replace").strip()


def check(case: Case, out: str, lenient: bool) -> bool:
    low = out.lower()
    if not lenient:
        if not all(k.lower() in low for k in case.required):
            return False
        if any(k.lower() in low for k in case.forbidden):
            return False
    if len(out) < case.min_len and not lenient:
        return False
    if case.max_len and len(out) > case.max_len:
        return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--binary", default=f"{sys.executable} -m smolvision_tpu.cli")
    ap.add_argument("--samples", default=SAMPLES_ROOT)
    ap.add_argument("--category", default="",
                    help="run only cases in this category (audio/text/combined)")
    ap.add_argument("--temperature", type=float, default=None,
                    help="override every case's temperature")
    ap.add_argument("--lenient", action="store_true",
                    help="skip keyword/min-length checks (synthetic weights: "
                         "verifies the harness plumbing, rc, max-length only)")
    ap.add_argument("--skip-keywords", action="store_true",
                    help="only run the greedy determinism check")
    args = ap.parse_args()

    failures = 0

    if not args.skip_keywords:
        for case in CASES:
            if args.category and case.category != args.category:
                continue
            out = run(args.binary, args.model_dir, case, args.samples,
                      temp_override=args.temperature)
            ok = check(case, out, args.lenient)
            print(f"{'PASS' if ok else 'FAIL'} [{case.category}] "
                  f"{case.name}: {out[:80]!r}")
            failures += 0 if ok else 1

    # greedy determinism: temp=0 twice must match exactly (ref :393-419)
    det_case = Case("determinism", "You are a helpful assistant",
                    text="Count from 1 to 5.", max_tokens=64)
    a = run(args.binary, args.model_dir, det_case, args.samples, temp_override=0.0)
    b = run(args.binary, args.model_dir, det_case, args.samples, temp_override=0.0)
    ok = a == b
    print(f"{'PASS' if ok else 'FAIL'} greedy determinism ({len(a)} chars)")
    failures += 0 if ok else 1

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
