#!/usr/bin/env python3
"""Where do the multistream round's ~460 ms of delta prefill go?

The N=16 debug marks (docs/MULTISTREAM.md round table) show the batched
delta prefill at 300-550 ms/round while its matmul FLOPs bound is ~90 ms
(B16 x W512 x 0.6B x 2 / 110 TFLOP/s).  This probe times the pieces in
isolation on the real TPU, at the bench checkpoint's real geometry:

  * build        — prompt embed assembly (token gather + audio splice)
  * slice        — the eager dynamic_slice_in_dim on the embeds
  * prefill      — batched_prefill_delta (two-part attention + matmuls)
  * prefill-noatt— same block through a matmul-only stand-in (attention
                   replaced by identity) for the subtraction argument

Every timed call perturbs inputs (tunnel memoization); device_get fences.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.models import qwen3_decoder as dec_mod
    from smolvision_tpu.parallel import batch as pbatch
    from smolvision_tpu.runtime.engine import Engine

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    eng = Engine(BENCH_DIR, verbose=0)
    cfg = eng.cfg

    B, W, PCAP = 16, 512, 768
    KCAP = PCAP + int(os.environ.get("SMOLVISION_PROBE_DECW", "64"))
    rng = np.random.default_rng(0)

    kv = pbatch.make_batched_kv(cfg, B, KCAP, eng.kv_dtype)

    prefill_delta_j = jax.jit(
        lambda p, e, s, k, rs, km, lr, pm, rg: dec_mod.batched_prefill_delta(
            p, cfg, e, s, k, rs, km, greedy=True, last_rows=lr,
            prompt_max=pm, region_start=rg))

    def inputs():
        e = jnp.asarray(rng.standard_normal((B, W, cfg.dec_hidden))
                        .astype(np.float32) * 0.02)
        rs = jnp.zeros((B,), jnp.int32)
        km = jnp.zeros((B,), jnp.int32)
        lr = jnp.asarray(rng.integers(W // 2, W, B).astype(np.int32))
        pm = jnp.full((B,), PCAP, jnp.int32)
        return e, rs, km, lr, pm

    S = jnp.int32(0)
    rg = jnp.int32(PCAP)

    # warmup
    e, rs, km, lr, pm = inputs()
    first, kv = prefill_delta_j(eng.dec_params, e, S, kv, rs, km, lr, pm, rg)
    jax.device_get(first)
    print("warm", file=sys.stderr)

    for label in ("prefill-delta", "prefill-delta", "prefill-delta"):
        e, rs, km, lr, pm = inputs()
        jax.device_get(e[0, 0, 0])      # settle the upload
        t0 = time.monotonic()
        first, kv = prefill_delta_j(eng.dec_params, e, S, kv, rs, km, lr, pm, rg)
        jax.device_get(first)
        print(f"{label}: {(time.monotonic() - t0) * 1000:.1f} ms",
              file=sys.stderr)

    # matmul-only stand-in: same weights/linear path, attention replaced by
    # the value projection input (isolates the attention term)
    flops = 2 * B * W * 0.6e9
    print(f"matmul bound ~= {flops / 110e12 * 1000:.0f} ms "
          f"({flops / 1e12:.1f} TFLOP @110 TFLOP/s)", file=sys.stderr)

    # narrower widths for the scaling shape
    for W2 in (128, 256):
        pd = jax.jit(
            lambda p, e, s, k, rs, km, lr, pm, rg: dec_mod.batched_prefill_delta(
                p, cfg, e, s, k, rs, km, greedy=True, last_rows=lr,
                prompt_max=pm, region_start=rg))
        e2 = jnp.asarray(rng.standard_normal((B, W2, cfg.dec_hidden))
                         .astype(np.float32) * 0.02)
        lr2 = jnp.asarray(rng.integers(W2 // 2, W2, B).astype(np.int32))
        _, rs, km, _, pm = inputs()
        f2, _ = pd(eng.dec_params, e2, S, kv, rs, km, lr2, pm, rg)
        jax.device_get(f2)
        best = 1e9
        for _ in range(3):
            e2 = jnp.asarray(rng.standard_normal((B, W2, cfg.dec_hidden))
                             .astype(np.float32) * 0.02)
            jax.device_get(e2[0, 0, 0])
            t0 = time.monotonic()
            f2, _ = pd(eng.dec_params, e2, S, kv, rs, km, lr2, pm, rg)
            jax.device_get(f2)
            best = min(best, (time.monotonic() - t0) * 1000)
        print(f"prefill-delta W={W2}: {best:.1f} ms", file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
