#!/usr/bin/env python3
"""Benchmark: offline transcription realtime factor on samples/jfk.wav.

Headline metric (BASELINE.md): the reference C engine decodes jfk.wav (11.0 s)
with Qwen3-ASR-0.6B at 7.99x realtime on an Apple M3 Max (`-S 0`, BLAS).
North star: >= 50x realtime on one TPU v5e chip.

Real Qwen weights are not downloadable in this environment, so the bench uses
a synthetic checkpoint with the exact 0.6B geometry (identical FLOPs/bytes;
random values).  Greedy decode on random weights never emits EOS, so decode
length is capped at 48 tokens — the reference emits ~40 tokens for jfk.wav,
so per-run work matches the real workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_RTF = 7.99  # README.md:398-402 (jfk.wav, 0.6B, -S 0, M3 Max)
JFK = "/root/reference/samples/jfk.wav"
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")
MAX_TOKENS = 48
RUNS = 5


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


def ensure_model() -> str:
    marker = os.path.join(BENCH_DIR, "model.safetensors")
    if not os.path.exists(marker):
        log("bench: generating synthetic 0.6B checkpoint (one-time)...")
        from tools.make_tiny_model import build

        build("0.6b", BENCH_DIR, seed=7, dtype="bf16")
    return BENCH_DIR


def main() -> int:
    model_dir = ensure_model()

    import jax

    # persistent compile cache: first-bucket compiles survive across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log(f"bench: backend={jax.default_backend()} devices={jax.devices()}")

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime import segment as segment_mod

    samples = load_wav(JFK)
    audio_s = len(samples) / 16000.0
    log(f"bench: jfk.wav {audio_s:.1f} s")

    t0 = time.monotonic()
    eng = Engine(model_dir, verbose=0)
    eng.max_tokens = MAX_TOKENS
    eng.segment_sec = 0.0
    log(f"bench: model loaded in {time.monotonic() - t0:.1f} s")

    # Warmup (compiles every bucket this workload touches)
    t0 = time.monotonic()
    segment_mod.transcribe_audio(eng, samples)
    log(f"bench: warmup (incl. compiles) {time.monotonic() - t0:.1f} s; "
        f"decoded {eng.perf.text_tokens} text tokens")

    best_ms = float("inf")
    for i in range(RUNS):
        segment_mod.transcribe_audio(eng, samples)
        ms = eng.perf.total_ms
        log(f"bench: run {i + 1}: {ms:.0f} ms "
            f"(mel+enc {eng.perf.encode_ms:.0f}, dec {eng.perf.decode_ms:.0f})")
        best_ms = min(best_ms, ms)

    rtf = audio_s / (best_ms / 1000.0)
    result = {
        "metric": "jfk.wav offline realtime factor (Qwen3-ASR-0.6B geometry, -S 0)",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
