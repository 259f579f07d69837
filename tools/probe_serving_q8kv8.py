#!/usr/bin/env python3
"""Interleaved A/B: continuous serving devres kv8 vs q8+kv8 (VERDICT r3 #2).

Stage attribution (tools/probe_serving_stages.py, round 4) puts the 64-row
wave at prefill ~235 ms + decode ~230 ms on device; decode streams
~1.26 GB bf16 weights + ~0.6 GB int8 KV per step.  --q8 halves the weight
bytes; the known counter-evidence is (a) B=32 one-shot bf16-KV: q8 no win
(prefill MXU-bound share) and (b) B=8 multistream q8+kv8 REGRESSED (two
int8 widening casts on one VPU).  At B=64 continuous with pre-staged audio
the decode share is ~40% of device time, so the combination gets its own
interleaved test — the only honest protocol at this effect size
(docs/SERVING_ROOFLINE.md: server period variance ~±25%).

Run (TPU, serial): python tools/probe_serving_q8kv8.py [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JFK = "/root/reference/samples/jfk.wav"
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--queue", type=int, default=128)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--model", default=BENCH_DIR)
    ap.add_argument("--ab", default="q8",
                    choices=["q8", "actq"],
                    help="q8: kv8 vs q8+kv8.  actq: q8+kv8 with the int8-"
                         "activation prefill GEMM (default) vs without "
                         "(SMOLVISION_Q8_ACTQ=0 traced into arm B's jits)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import (prestage_uploads,
                                                serve_continuous)

    log(f"backend={jax.default_backend()}")
    base = load_wav(JFK)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(23)

    if args.ab == "q8":
        arms = {
            "kv8": Engine(args.model, verbose=0, kv8=True),
            "q8kv8": Engine(args.model, verbose=0, q8=True, kv8=True),
        }
    else:
        # env is read at TRACE time, i.e. during each arm's first
        # (warmup) serve_continuous call — the warm loop below flips it
        # around arm B's warmup only; timed runs reuse the cached jits
        arms = {
            "q8kv8-actq": Engine(args.model, verbose=0, q8=True, kv8=True),
            "q8kv8-noactq": Engine(args.model, verbose=0, q8=True,
                                   kv8=True),
        }
    for eng in arms.values():
        eng.max_tokens = 48
        eng.segment_sec = 0.0

    def mkclips():
        return [(base + rng.normal(0, 1e-4, len(base))).astype(np.float32)
                for _ in range(args.queue)]

    def run(eng):
        clips = mkclips()
        pre = prestage_uploads(eng, clips, encode_group=32)
        t0 = time.monotonic()
        texts = serve_continuous(eng, clips, slots=args.slots,
                                 encode_group=32, prestaged=pre)
        wall = time.monotonic() - t0
        return args.queue * audio_s / wall, texts

    # warm both arms (compiles; trace-time env per arm)
    for name, eng in arms.items():
        if name.endswith("-noactq"):
            os.environ["SMOLVISION_Q8_ACTQ"] = "0"
        t0 = time.monotonic()
        run(eng)
        log(f"warm {name}: {time.monotonic() - t0:.1f} s")
        os.environ.pop("SMOLVISION_Q8_ACTQ", None)

    results = {n: [] for n in arms}
    texts_by_arm = {}
    for rep in range(args.reps):
        for name, eng in arms.items():
            tput, texts = run(eng)
            results[name].append(tput)
            texts_by_arm[name] = texts
            log(f"rep {rep + 1} {name}: {tput:.0f} s-speech/s")

    summary = {}
    for name, vals in results.items():
        summary[name] = {"med": round(statistics.median(vals), 1),
                         "best": round(max(vals), 1),
                         "all": [round(v, 1) for v in vals]}
    # sanity: both arms produce gated text (q8 arm's tokens may differ —
    # outside the parity contract — but must not be empty/garbage-length)
    summary["text_lens"] = {n: sorted({len(t) for t in ts})[:5]
                            for n, ts in texts_by_arm.items()}
    a_name, b_name = list(arms)[1], list(arms)[0]   # treatment, control
    pairs_won = sum(1 for a, b in zip(results[a_name], results[b_name])
                    if a > b)
    summary[f"{a_name}_pairs_won"] = f"{pairs_won}/{args.reps}"
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
