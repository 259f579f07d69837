#!/usr/bin/env python3
"""Decode-step time attribution on real TPU.

Measures the per-token cost of the greedy decode step and ablations of it
(no lm_head, no attention, matvec chain only) to locate the gap between the
observed ~3.3 ms/token and the ~1.5 ms HBM speed-of-light for the 0.6B
geometry (1.2 GB of bf16 weights per step at ~819 GB/s on v5e).

Landmines honored (CLAUDE.md): single process, varied inputs per dispatch
(the axon tunnel memoizes identical dispatches), chunked while_loop timing
(N steps per dispatch so the ~27 ms RTT amortizes out), block_until_ready
once per dispatch.
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

from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.ops.quant import embed_rows, proj, wdtype
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")
STEPS = 64          # decode steps per dispatch
REPS = 4            # timed dispatches per variant (min taken)
KCAP = 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed_loop(name, step_fn, kv, params, cfg, extra_state=None):
    """Run STEPS sequential steps of `step_fn` inside one jitted while_loop
    dispatch; report ms/step.  step_fn(params, tok, pos, kv) -> (tok, kv)."""

    def chunk(p, tok, pos, kv):
        def body(c):
            i, t, pos_, kv_ = c
            t, kv_ = step_fn(p, t, pos_, kv_)
            return (i + 1, t, pos_ + 1, kv_)

        def cond(c):
            return c[0] < STEPS

        i, t, pos, kv = jax.lax.while_loop(cond, body, (jnp.int32(0), tok, pos, kv))
        return t, kv

    jfn = jax.jit(chunk, donate_argnums=(3,))
    pos0 = jnp.int32(256)
    # warmup/compile
    tok = jnp.int32(11)
    tok, kv = jfn(params, tok, pos0, kv)
    _ = int(jax.device_get(tok))  # real host sync (block_until_ready is not
    # a reliable fence over the axon tunnel)
    best = float("inf")
    for r in range(REPS):
        tok = jnp.int32(13 + r)  # varied input defeats tunnel memoization
        t0 = time.monotonic()
        tok, kv = jfn(params, tok, pos0, kv)
        _ = int(jax.device_get(tok))
        ms = (time.monotonic() - t0) * 1000.0
        best = min(best, ms)
    log(f"{name:34s} {best / STEPS:7.3f} ms/step   ({best:.0f} ms / {STEPS})")
    return kv


def main():
    log(f"backend={jax.default_backend()}")
    eng = Engine(BENCH_DIR, verbose=0, q8=os.environ.get("SMOLVISION_Q8") == "1")
    cfg = eng.cfg
    params = eng.dec_params
    log(f"model: {cfg.name} layers={cfg.dec_layers} hidden={cfg.dec_hidden} "
        f"inter={cfg.dec_intermediate} vocab={cfg.vocab_size}")

    # bf16 bytes touched per step
    lp = params["layers"]
    wbytes = 1 if os.environ.get("SMOLVISION_Q8") == "1" else 2
    per_layer = sum(int(np.prod(lp[k].shape[1:])) for k in
                    ("wqkv", "wo", "w_gate_up", "w_down") if lp.get(k) is not None)
    lm = int(np.prod(params["lm_head"].shape))
    tot = per_layer * cfg.dec_layers + lm
    log(f"weights/step: layers {per_layer * cfg.dec_layers * wbytes / 1e9:.2f} GB + "
        f"lm_head {lm * wbytes / 1e9:.2f} GB = {tot * wbytes / 1e9:.2f} GB "
        f"-> SoL ~{tot * wbytes / 819e6:.2f} ms/step @819GB/s")

    kv = dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)

    # 1. full step (greedy argmax)
    def full(p, t, pos, kv):
        return dec_mod.decode_step(p, cfg, t, pos, kv, greedy=True)

    kv = timed_loop("full step (argmax)", full, kv, params, cfg)

    # 2. no lm_head: feed hidden sum back as a token surrogate
    def no_lm(p, t, pos, kv):
        embed = embed_rows(p["embed"], t)[None]
        hidden, kv = dec_mod.decoder_forward(p, cfg, embed, pos, jnp.int32(1), kv)
        return (jnp.sum(hidden) > 0).astype(jnp.int32) + t, kv

    kv = timed_loop("layers only (no lm_head)", no_lm, kv, params, cfg)

    # 3. lm_head only
    def lm_only(p, t, pos, kv):
        h = embed_rows(p["embed"], t)
        logits = proj("h,vh->v", h.astype(wdtype(p["lm_head"])), p["lm_head"])
        return jnp.argmax(logits).astype(jnp.int32), kv

    kv = timed_loop("lm_head argmax only", lm_only, kv, params, cfg)

    # 4. matvec chain only (no attention/norm/rope): qkv, o, gate_up, down
    def mv_only(p, t, pos, kv):
        h = embed_rows(p["embed"], t)[None]

        def layer(h, lp):
            wdt = wdtype(lp["wqkv"])
            qkv = proj("th,oh->to", h.astype(wdt), lp["wqkv"])
            attn = qkv[:, : cfg.dec_heads * cfg.dec_head_dim]
            h = h + proj("ta,oa->to", attn.astype(wdt), lp["wo"])
            gu = proj("th,ih->ti", h.astype(wdt), lp["w_gate_up"])
            I = gu.shape[-1] // 2
            act = (jax.nn.silu(gu[:, :I]) * gu[:, I:]).astype(wdt)
            h = h + proj("ti,hi->th", act, lp["w_down"])
            return h, None

        h, _ = jax.lax.scan(layer, h, p["layers"])
        return (jnp.sum(h) > 0).astype(jnp.int32) + t, kv

    kv = timed_loop("matvec chain only", mv_only, kv, params, cfg)

    # 5. attention only (pallas decode kernel in-loop, KV untouched rows)
    from smolvision_tpu.kernels import use_pallas
    from smolvision_tpu.kernels.flash_attention import decode_flash_attention

    if use_pallas():
        def attn_only(p, t, pos, kv):
            def layer(h, kv_layer):
                q = jnp.broadcast_to(h, (cfg.dec_heads, cfg.dec_head_dim))
                kn = q[: cfg.dec_kv_heads]
                out = decode_flash_attention(
                    q, kn, kn, kv_layer[0], kv_layer[1], pos,
                    gqa_groups=cfg.dec_heads // cfg.dec_kv_heads)
                return h + jnp.sum(out) * 0.0, None

            h0 = jnp.zeros((cfg.dec_head_dim,), jnp.float32) + t
            h, _ = jax.lax.scan(layer, h0, kv)
            return (jnp.sum(h) > 0).astype(jnp.int32) + t, kv

        kv = timed_loop("attention only (pallas)", attn_only, kv, params, cfg)

    return 0


if __name__ == "__main__":
    sys.exit(main())
