#!/usr/bin/env python3
"""Interleaved A/B: speculative int8-draft decoding (--spec) on the 1.7B
geometry, offline jfk.

Rationale: at 0.6B --spec measured ~91x vs ~72-78x bf16 (+~25%).  The 1.7B
decoder streams ~2.8x the weight bytes per step, so drafting with the int8
copy and verifying in one bf16 forward should pay MORE at 1.7B — the verify
matmul amortizes over deeper accepted runs while the per-step stream halves.
Protocol: interleaved run-by-run (sequential blocks are unreliable at
10-20% effect sizes — docs/SERVING_ROOFLINE.md), varied inputs (tunnel
memoization), one jax process, RUNS reps per arm.

Usage: python tools/probe_spec17.py [--runs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JFK = "/root/reference/samples/jfk.wav"
NOISE = 1e-4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from tools.engineer_checkpoint import OUT_17, ensure_engineered
    ensure_engineered(OUT_17, geom="1.7b")

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import segment as segment_mod
    from smolvision_tpu.runtime.engine import Engine

    rng = np.random.default_rng(0x17B5)
    base = load_wav(JFK)
    audio_s = len(base) / 16000.0

    def perturb():
        return (base + rng.normal(0.0, NOISE, len(base))).astype(np.float32)

    # ONE engine, spec flag toggled per arm: two resident 1.7B engines OOM
    # the chip (bf16 3.4 GB x2 + int8 draft + f32 quantize temporaries),
    # and sharing weights makes the A/B tighter anyway — the bf16 arm is
    # literally the same buffers with the draft path skipped (engine.spec
    # is consulted per dispatch, runtime/engine.py dispatch_and_fetch).
    e = Engine(OUT_17, verbose=0, spec=True)
    e.max_tokens = 48
    e.segment_sec = 0.0
    for arm, flag in (("bf16", False), ("spec", True)):
        e.spec = flag
        t0 = time.monotonic()
        segment_mod.transcribe_audio(e, perturb())
        log(f"probe_spec17: {arm} warmup {time.monotonic() - t0:.1f} s "
            f"({e.perf.text_tokens} text tokens)")

    walls = {"bf16": [], "spec": []}
    texts = {}
    for rep in range(args.runs * 2):
        arm = "bf16" if rep % 2 == 0 else "spec"
        e.spec = arm == "spec"
        clip = perturb()
        segment_mod.transcribe_audio(e, clip)
        ms = e.perf.total_ms
        walls[arm].append(round(ms, 1))
        extra = ""
        if arm == "spec" and e.perf.spec_iters:
            extra = (f" acc={e.perf.spec_tokens}/{e.perf.spec_iters}"
                     f"={e.perf.spec_tokens / e.perf.spec_iters:.2f} tok/iter")
        log(f"probe_spec17: {arm} rep{rep}: {ms:.0f} ms "
            f"= {audio_s / (ms / 1000.0):.1f}x{extra}")

    # exactness spot check on ONE shared clip (spec contract: bit-exact
    # bf16 greedy) — run both arms on the identical perturbed input
    clip = perturb()
    for arm in ("bf16", "spec"):
        e.spec = arm == "spec"
        texts[arm] = segment_mod.transcribe_audio(e, clip)
    same = texts["bf16"] == texts["spec"]

    rec = {"config": "INTERLEAVED 1.7B offline bf16-vs-spec jfk",
           "audio_s": round(audio_s, 2), "texts_equal": same}
    for a, ws in walls.items():
        rec[f"{a}_walls_ms"] = ws
        rec[f"{a}_best_x"] = round(audio_s / (min(ws) / 1000.0), 1)
        rec[f"{a}_median_x"] = round(
            audio_s / (sorted(ws)[len(ws) // 2] / 1000.0), 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
