#!/usr/bin/env python3
"""Does --spec help STREAMING (bounded ≤32-token decodes per 2 s chunk)?

Interleaves plain-bf16 and spec runs of the 45 s streaming clip in ONE
process (the axon server's ±25% period variance makes sequential blocks
unreliable — docs/SERVING_ROOFLINE.md).  Usage:
  python tools/probe_spec_stream.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIP_45S = os.path.join("/root/reference/samples",
                        "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
NOISE = 1e-4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    from tools.engineer_checkpoint import ensure_engineered
    ensure_engineered(BENCH_DIR)

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    rng = np.random.default_rng(0xBEEF)
    base = load_wav(CLIP_45S)
    audio_s = len(base) / 16000.0

    def perturb():
        return (base + rng.normal(0.0, NOISE, len(base))).astype(np.float32)

    engines = {}
    for tag, kw in (("bf16", {}), ("spec", {"spec": True})):
        e = Engine(BENCH_DIR, verbose=0, **kw)
        e.segment_sec = 0.0
        e.past_text_conditioning = True
        e.token_cb = lambda piece: None
        engines[tag] = e
        t0 = time.monotonic()
        stream_mod.transcribe_stream(e, perturb())
        log(f"probe_spec_stream: {tag} warmup {time.monotonic() - t0:.1f} s")

    walls = {"bf16": [], "spec": []}
    for rep in range(args.runs * 2):
        tag = "bf16" if rep % 2 == 0 else "spec"
        clip = perturb()
        t0 = time.monotonic()
        stream_mod.transcribe_stream(engines[tag], clip)
        w = time.monotonic() - t0
        walls[tag].append(round(w, 3))
        log(f"probe_spec_stream: {tag} rep{rep}: {w:.2f} s "
            f"= {audio_s / w:.1f}x realtime")
    rec = {"audio_s": audio_s}
    for tag, ws in walls.items():
        rec[f"{tag}_walls_s"] = ws
        rec[f"{tag}_best_rtf"] = round(audio_s / min(ws), 2)
        rec[f"{tag}_median_rtf"] = round(audio_s / sorted(ws)[len(ws) // 2], 2)
    p = engines["spec"].perf
    if p.spec_iters:
        rec["spec_tokens_per_iter"] = round(p.spec_tokens / p.spec_iters, 2)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
