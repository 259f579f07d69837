#!/usr/bin/env python3
"""Multi-stream streaming throughput: batched coordinator vs thread-per-session.

Measures, on the real TPU with the synthetic 0.6B checkpoint, N=8 concurrent
45 s streaming sessions (the VERDICT r1 'phase 2' target: aggregate
streaming throughput scaling >= 4x over phase 1):
  * phase 1 (threaded): SMOLVISION_BATCH_STREAMS=0, one host thread per
    session — dispatch-serialized singles,
  * phase 2 (batched): shared-clock rounds, one batched prefill + decode
    dispatch per round for all sessions.

Inputs vary per repetition (the axon tunnel memoizes identical dispatches).
Run alone — never alongside another jax process.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if jax.default_backend() == "cpu":  # axon deserialized-exec first-run is ~5x a fresh compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from smolvision_tpu.io.wav import load_wav
from smolvision_tpu.runtime import multistream as ms
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.environ.get(
    "SMOLVISION_MS_MODEL",
    os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng"))
CLIP = "/root/reference/samples/night_of_the_living_dead_1968/45s_dont_be_afraid_of_me.wav"
N = int(os.environ.get("SMOLVISION_MS_N", "8"))
REPS = int(os.environ.get("SMOLVISION_MS_REPS", "2"))
# comma-separated subset of {batched,threaded}
MODES = os.environ.get("SMOLVISION_MS_MODES", "batched,threaded")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"backend={jax.default_backend()}")
    eng = Engine(BENCH_DIR, verbose=0,
                 q8=os.environ.get("SMOLVISION_Q8", "") == "1",
                 kv8=os.environ.get("SMOLVISION_KV8", "") == "1")
    eng.past_text_conditioning = True
    base = load_wav(CLIP)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(0)

    def clips():
        return [base + rng.normal(0, 1e-4, len(base)).astype(np.float32)
                for _ in range(N)]

    # stage attribution for the batched coordinator: encoder+prompt side
    # (begin_chunk) vs the batched model middle
    import time as _time

    from smolvision_tpu.runtime import stream as _stream

    stage = {"begin": 0.0, "middle": 0.0}
    _orig_begin = _stream.StreamState.begin_chunk
    _orig_mid = ms._run_batched_chunks

    def _begin(self):
        t0 = _time.monotonic()
        w = _orig_begin(self)
        stage["begin"] += _time.monotonic() - t0
        return w

    def _mid(*a, **k):
        t0 = _time.monotonic()
        _orig_mid(*a, **k)
        stage["middle"] += _time.monotonic() - t0

    _stream.StreamState.begin_chunk = _begin
    ms._run_batched_chunks = _mid

    results = {}
    mode_list = [m for m in MODES.split(",") if m]
    for mode, env in (("batched", None), ("threaded", "0")):
        if mode not in mode_list:
            continue
        if env is None:
            os.environ.pop("SMOLVISION_BATCH_STREAMS", None)
        else:
            os.environ["SMOLVISION_BATCH_STREAMS"] = env
        ms.run_streams(eng, clips())  # warmup (compiles)
        best = float("inf")
        for _ in range(REPS):
            cs = clips()
            stage["begin"] = stage["middle"] = 0.0
            t0 = time.monotonic()
            ms.run_streams(eng, cs)
            took = time.monotonic() - t0
            if took < best:
                best = took
                if mode == "batched":
                    log(f"  begin_chunk(enc+prompt) {stage['begin']:.1f} s, "
                        f"batched middle {stage['middle']:.1f} s, "
                        f"other {took - stage['begin'] - stage['middle']:.1f} s")
        tput = N * audio_s / best
        results[mode] = tput
        log(f"{mode:9s}: {best:6.1f} s for {N} x {audio_s:.0f} s "
            f"-> {tput:6.1f} s-speech/s ({tput / audio_s:.1f} streams realtime)")
    os.environ.pop("SMOLVISION_BATCH_STREAMS", None)
    if "batched" in results and "threaded" in results:
        log(f"scaling batched/threaded: "
            f"{results['batched'] / results['threaded']:.2f}x")


if __name__ == "__main__":
    main()
