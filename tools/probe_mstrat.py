#!/usr/bin/env python3
"""Stratified reset-row prefill A/B: multistream N sessions, strat on/off.

INTERLEAVED arms (the only honest protocol at 10-20% effect sizes over the
axon server's ±25% period variance — docs/SERVING_ROOFLINE.md): the two
arms alternate run-by-run in one process so drift hits both equally.

Context: docs/MULTISTREAM.md round-3 attribution found S = 0 every round
at N=16 — some row is always freshly reset, pinning the batch-uniform
delta start to 0 and re-prefilling the full prompt width for ALL rows
(~225 ms/round of the ~520 ms round).  The stratified path
(multistream._strat_jit) gives the reset rows their own small-batch full
prefill and lets S follow the non-reset majority.

Run alone — never alongside another jax process.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

from smolvision_tpu.io.wav import load_wav
from smolvision_tpu.runtime import multistream as ms
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
CLIP = ("/root/reference/samples/night_of_the_living_dead_1968/"
        "45s_dont_be_afraid_of_me.wav")
N = int(os.environ.get("SMOLVISION_MS_N", "16"))
REPS = int(os.environ.get("SMOLVISION_MS_REPS", "4"))   # per arm


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tools.engineer_checkpoint import ensure_engineered

    ensure_engineered(BENCH_DIR)
    log(f"backend={jax.default_backend()} N={N}")
    eng = Engine(BENCH_DIR, verbose=0)
    eng.past_text_conditioning = True
    base = load_wav(CLIP)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(0)

    def clips():
        return [base + rng.normal(0, 1e-4, len(base)).astype(np.float32)
                for _ in range(N)]

    def set_arm(a):
        if a == "on":
            os.environ["SMOLVISION_MSTREAM_STRAT"] = "1"
        else:
            os.environ.pop("SMOLVISION_MSTREAM_STRAT", None)

    walls = {"on": [], "off": []}
    for a in ("on", "off"):                     # warm both program ladders
        set_arm(a)
        t0 = time.monotonic()
        ms.run_streams(eng, clips())
        log(f"probe_mstrat: warm {a}: {time.monotonic() - t0:.1f} s")
    for rep in range(REPS * 2):
        a = "on" if rep % 2 == 0 else "off"
        set_arm(a)
        cs = clips()
        n0 = getattr(eng, "_strat_round_count", 0)
        t0 = time.monotonic()
        ms.run_streams(eng, cs)
        w = time.monotonic() - t0
        walls[a].append(round(w, 3))
        fired = getattr(eng, "_strat_round_count", 0) - n0
        log(f"probe_mstrat: {a} rep{rep}: {w:.2f} s = "
            f"{N * audio_s / w:.1f} s-speech/s (strat rounds {fired})")
    set_arm("off")   # restore the default (strat is opt-in)
    rec = {"config": f"INTERLEAVED mstream-strat on-vs-off N={N}"}
    for a, ws in walls.items():
        rec[f"{a}_walls_s"] = ws
        rec[f"{a}_best"] = round(N * audio_s / min(ws), 1)
        rec[f"{a}_median"] = round(N * audio_s / sorted(ws)[len(ws) // 2], 1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
