#!/usr/bin/env python3
"""Serving ceiling sweep at the q8+kv8 devres config (VERDICT r4 Next #2).

The recorded 1227.6 s-speech/s sits at ~98% of the measured ~1250 zero-gap
device ceiling, so the remaining win must move the ceiling itself.  Arms
(all interleaved within one process — sequential blocks are unreliable at
10-20% effect sizes, the server period variance is ~±25%):

  --ab slots   slots 64 / 96 / 128 under q8+kv8 (the prior 128 rejection
               predates q8+kv8); one engine, per-S shape-specialized jits
  --ab chunk   decode-chunk depth 32 / 48 / 64 (engine.serve_chunk keys
               the serving jit cache); device early-exit bounds overrun
  --ab queue   queue 128 vs 256 (first-wave prefill has no decode shadow;
               deeper queues amortize it)
  --ab actq    decode-chunk GEMMs through the MXU int8xint8 mode
               (SMOLVISION_Q8_ACTQ_MIN=1 traced into arm B) vs the
               dequant-to-bf16 weight path — the B=1 rejection in
               docs/DECODE_PROFILE.md measured dequant-VPU contention that
               amortizes differently across 64 rows

Run (TPU, serial): python tools/probe_serving_ceiling.py --ab actq
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
    ap.add_argument("--chunk", type=int, default=0, help="serve_chunk for "
                    "non-chunk sweeps (0 = default 48)")
    ap.add_argument("--model", default=BENCH_DIR)
    ap.add_argument("--ab", default="slots",
                    choices=["slots", "s128", "chunk", "queue", "actq"])
    args = ap.parse_args()

    import jax
    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import (prestage_uploads,
                                                serve_continuous)

    log(f"backend={jax.default_backend()} ab={args.ab}")
    base = load_wav(JFK)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(29)

    def mkeng():
        e = Engine(args.model, verbose=0, q8=True, kv8=True)
        e.max_tokens = 48
        e.segment_sec = 0.0
        if args.chunk:
            e.serve_chunk = args.chunk
        return e

    # arm -> (engine, slots, queue, serve_chunk, warm_env)
    if args.ab == "slots":
        eng = mkeng()
        arms = {f"s{s}": (eng, s, args.queue, 0, None) for s in (64, 96, 128)}
    elif args.ab == "s128":
        # two-arm pairwise form: the 3-way sweep's per-arm medians drown in
        # server-period variance; paired reps give a sign test
        eng = mkeng()
        arms = {f"s{s}": (eng, s, args.queue, 0, None) for s in (64, 128)}
    elif args.ab == "chunk":
        eng = mkeng()
        arms = {f"c{c}": (eng, args.slots, args.queue, c, None)
                for c in (32, 48, 64)}
    elif args.ab == "queue":
        eng = mkeng()
        arms = {f"q{q}": (eng, args.slots, q, 0, None) for q in (128, 256)}
    else:  # actq — trace-time env, so each arm needs its own engine+jits
        arms = {
            "dequant": (mkeng(), args.slots, args.queue, 0, None),
            "actq-decode": (mkeng(), args.slots, args.queue, 0,
                            {"SMOLVISION_Q8_ACTQ_MIN": "1"}),
        }

    def run(name):
        eng, slots, queue, chunk, _env = arms[name]
        eng.serve_chunk = chunk if chunk else (args.chunk or 0)
        clips = [(base + rng.normal(0, 1e-4, len(base))).astype(np.float32)
                 for _ in range(queue)]
        pre = prestage_uploads(eng, clips, encode_group=32)
        t0 = time.monotonic()
        texts = serve_continuous(eng, clips, slots=slots, encode_group=32,
                                 prestaged=pre)
        wall = time.monotonic() - t0
        return queue * audio_s / wall, texts

    for name in arms:
        env = arms[name][4]
        if env:
            os.environ.update(env)
        t0 = time.monotonic()
        run(name)
        log(f"warm {name}: {time.monotonic() - t0:.1f} s")
        if env:
            for k in env:
                os.environ.pop(k, None)

    results = {n: [] for n in arms}
    texts_by_arm = {}
    for rep in range(args.reps):
        for name in arms:
            tput, texts = run(name)
            results[name].append(tput)
            texts_by_arm[name] = texts
            log(f"rep {rep + 1} {name}: {tput:.0f} s-speech/s")

    summary = {"ab": args.ab, "queue": args.queue, "slots": args.slots}
    for name, vals in results.items():
        summary[name] = {"med": round(statistics.median(vals), 1),
                         "best": round(max(vals), 1),
                         "all": [round(v, 1) for v in vals]}
    summary["text_lens"] = {n: sorted({len(t) for t in ts})[:5]
                            for n, ts in texts_by_arm.items()}
    names = list(arms)
    if len(names) == 2:
        a, b = names[1], names[0]
        summary[f"{a}_pairs_won"] = (
            f"{sum(1 for x, y in zip(results[a], results[b]) if x > y)}"
            f"/{args.reps}")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
