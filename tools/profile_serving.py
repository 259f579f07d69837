#!/usr/bin/env python3
"""Serving-path profiler: where does the B=32 batch plateau come from?

Measures, on the real TPU with the synthetic 0.6B checkpoint:
  * end-to-end batched transcription throughput (s-speech/s) at several B,
  * isolated batched decode-chunk cost (weights are read once per step for
    the whole batch; KV reads scale with B x Kcap — the suspected limiter),
  * isolated batched prefill cost.

Inputs vary per repetition (the axon tunnel memoizes identical dispatches).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() == "cpu":  # axon deserialized-exec first-run is ~5x a fresh compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from smolvision_tpu.io.wav import load_wav
from smolvision_tpu.parallel import batch as pbatch
from smolvision_tpu.runtime import batch_segments as bs
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")
JFK = "/root/reference/samples/jfk.wav"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"backend={jax.default_backend()}")
    eng = Engine(BENCH_DIR, verbose=0)
    eng.max_tokens = 48
    cfg = eng.cfg
    base = load_wav(JFK)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(0)

    for B in (8, 32):
        clips = [base + rng.normal(0, 1e-4, len(base)).astype(np.float32)
                 for _ in range(B)]
        # warmup (compiles)
        eng.perf.reset()
        bs.transcribe_segments_batched(eng, clips)
        best = float("inf")
        best_enc = best_dec = 0.0
        for rep in range(3):
            clips = [base + rng.normal(0, 1e-4, len(base)).astype(np.float32)
                     for _ in range(B)]
            eng.perf.reset()
            t0 = time.monotonic()
            bs.transcribe_segments_batched(eng, clips)
            ms = (time.monotonic() - t0) * 1000.0
            if ms < best:
                best, best_enc, best_dec = ms, eng.perf.encode_ms, eng.perf.decode_ms
        tput = B * audio_s / (best / 1000.0)
        log(f"B={B:3d} e2e {best:7.0f} ms  enc {best_enc:6.0f}  dec+prefill "
            f"{best_dec:6.0f}  -> {tput:7.1f} s-speech/s ({tput / audio_s:.0f}x rt)")

    # ---- isolated batched decode chunk ---------------------------------
    from smolvision_tpu.runtime.buckets import bucket128

    for B in (8, 32):
        tcap = 512  # typical jfk prompt bucket (~360 tokens -> 512)
        kcap = bucket128(tcap + 64 + 64)
        kv = pbatch.make_batched_kv(cfg, B, kcap, jnp.bfloat16)
        CH = 64
        dec = jax.jit(
            lambda p, t, pos, k, off, km: pbatch.batched_decode_chunk(
                p, cfg, t, pos, k, CH, rope_offset=off, kv_min=km),
            donate_argnums=(3,))
        toks = jnp.zeros((B,), jnp.int32)
        off = jnp.zeros((B,), jnp.int32)
        km = jnp.zeros((B,), jnp.int32)
        buf, cnt, last, kv = dec(eng.dec_params, toks, jnp.int32(tcap), kv, off, km)
        _ = np.asarray(jax.device_get(buf))
        best = float("inf")
        for rep in range(3):
            toks = jnp.full((B,), rep + 3, jnp.int32)
            t0 = time.monotonic()
            buf, cnt, last, kv = dec(eng.dec_params, toks, jnp.int32(tcap), kv, off, km)
            _ = np.asarray(jax.device_get(buf))
            best = min(best, (time.monotonic() - t0) * 1000.0)
        kv_gb = (B * cfg.dec_layers * 2 * kcap * cfg.dec_kv_heads
                 * cfg.dec_head_dim * 2) / 1e9
        step = best / CH
        log(f"B={B:3d} decode chunk kcap={kcap}: {step:6.2f} ms/step "
            f"({step / B * 1000:6.0f} us/token)  KV resident {kv_gb:.2f} GB "
            f"(weights 1.19 GB + KV {kv_gb:.2f} GB -> SoL "
            f"{(1.19 + kv_gb) / 0.6:.1f} ms/step @600GB/s)")

    # ---- isolated batched prefill ---------------------------------------
    # NOTE: embeds are built ON DEVICE in the real path; here they upload
    # ~67 MB/call over the tunnel, so time the device work via a second call
    # on device-resident embeds derived from the previous output.
    for B in (8, 32):
        for mode, label in (("", "pallas"), ("0", "2part ")):
            if mode:
                os.environ["SMOLVISION_PALLAS"] = mode
            else:
                os.environ.pop("SMOLVISION_PALLAS", None)
            tcap = 512
            kcap = bucket128(tcap + 128)
            kv = pbatch.make_batched_kv(cfg, B, kcap, jnp.bfloat16)
            pf = jax.jit(
                lambda p, e, k, rs, km: pbatch.batched_prefill(
                    p, cfg, e, k, rope_start=rs, kv_min=km, greedy=True),
                donate_argnums=(2,))
            base_e = jnp.asarray(
                rng.normal(0, 0.1, (B, tcap, cfg.dec_hidden)).astype(np.float32))
            z = jnp.zeros((B,), jnp.int32)
            first, kv = pf(eng.dec_params, base_e, kv, z, z)
            _ = np.asarray(jax.device_get(first))
            best = float("inf")
            for rep in range(3):
                e = base_e * (1.0 + (rep + 1) * 1e-3) + first[:, None, None] * 1e-9
                t0 = time.monotonic()
                first, kv = pf(eng.dec_params, e, kv, z, z)
                _ = np.asarray(jax.device_get(first))
                best = min(best, (time.monotonic() - t0) * 1000.0)
            fl = 2 * 0.44e9 * tcap * B
            log(f"B={B:3d} prefill[{label}] tcap={tcap}: {best:7.0f} ms  "
                f"({fl / best / 1e9:.1f} TFLOP/s of ~110 peak)")
    os.environ.pop("SMOLVISION_PALLAS", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
