#!/usr/bin/env python3
"""Stage-A decode experiments: attention formulation + lm_head variants.

Follow-up to profile_decode.py which measured (Kcap=512):
  full 2.68 ms | matvecs 1.87 | lm_head 0.84 | pallas attn 0.78  (SoL 1.46)

Questions:
  1. is the jnp two-part attention faster than the Pallas decode kernel at
     decode time (28 tiny kernel launches)?
  2. can lm_head argmax run closer to its 0.38 ms SoL with a transposed
     layout or a Pallas fused argmax-matvec?
"""

from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if jax.default_backend() == "cpu":  # axon deserialized-exec first-run is ~5x a fresh compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")
STEPS = 64
REPS = 4
KCAP = 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, jfn, *args, divide=STEPS):
    try:
        return _timed(name, jfn, *args, divide=divide)
    except Exception as e:
        log(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None


def _timed(name, jfn, *args, divide=STEPS):
    # donation-aware: if the fn returns (tok, kv), thread the fresh kv back
    # into the last positional arg for the next call
    args = list(args)

    def call():
        out = jfn(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(jax.device_get(first))
        if isinstance(out, tuple) and len(out) == 2:
            args[-1] = out[1]
        return out

    res = call()
    best = float("inf")
    for r in range(REPS):
        t0 = time.monotonic()
        res = call()
        ms = (time.monotonic() - t0) * 1000.0
        best = min(best, ms)
    log(f"{name:40s} {best / divide:7.3f} ms/it   ({best:.1f} ms / {divide})")
    return res


def chunk_loop(step_fn, steps=STEPS):
    def chunk(p, tok, pos, kv):
        def body(c):
            i, t, pos_, kv_ = c
            t, kv_ = step_fn(p, t, pos_, kv_)
            return (i + 1, t, pos_ + 1, kv_)

        i, t, pos, kv = jax.lax.while_loop(
            lambda c: c[0] < steps, body, (jnp.int32(0), tok, pos, kv))
        return t, kv

    return jax.jit(chunk, donate_argnums=(3,))


# ---------------------------------------------------------------------------
# Pallas fused argmax-matvec over lm_head (the reference's streaming argmax,
# TPU-shaped): grid over vocab tiles; each tile computes h @ W_tile^T on the
# MXU and folds a running (max, argmax) in SMEM scratch.
# ---------------------------------------------------------------------------

def _argmax_kernel(h_ref, w_ref, out_ref, best_ref, *, bv, v_real):
    vb = pl.program_id(0)

    @pl.when(vb == 0)
    def _():
        best_ref[0] = jnp.float32(-3.4e38)
        best_ref[1] = jnp.float32(0.0)

    h = h_ref[:, :]                                   # [1, H] bf16
    w = w_ref[:, :]                                   # [BV, H] bf16
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [1, BV]
    cols = vb * bv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < v_real, s, -3.4e38)
    m = jnp.max(s)
    idx = jnp.argmax(s[0]).astype(jnp.float32) + vb * bv

    @pl.when(m > best_ref[0])
    def _():
        best_ref[0] = m
        best_ref[1] = idx

    @pl.when(vb == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = best_ref[1].astype(jnp.int32)


def pallas_argmax_matvec(h, w_pad, v_real, block_v=1024):
    """argmax over the first v_real rows of w_pad [Vp, H] bf16 (Vp % block_v
    == 0) without materializing logits in HBM."""
    Vp, H = w_pad.shape
    assert Vp % block_v == 0
    h2 = h.reshape(1, H).astype(w_pad.dtype)
    return pl.pallas_call(
        functools.partial(_argmax_kernel, bv=block_v, v_real=v_real),
        grid=(Vp // block_v,),
        in_specs=[
            pl.BlockSpec((1, H), lambda v: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, H), lambda v: (v, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(h2, w_pad)[0]


def main():
    log(f"backend={jax.default_backend()}")
    eng = Engine(BENCH_DIR, verbose=0)
    cfg = eng.cfg
    params = eng.dec_params
    kv = dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)

    # --- 1. attention formulation inside the full step -------------------
    def full(p, t, pos, kv):
        return dec_mod.decode_step(p, cfg, t, pos, kv, greedy=True)

    os.environ.pop("SMOLVISION_PALLAS", None)
    jfn = chunk_loop(full)
    r = timed("full step / pallas attn", jfn, params, jnp.int32(3),
              jnp.int32(256), kv)
    kv = r[1] if r is not None else dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)

    os.environ["SMOLVISION_PALLAS"] = "0"
    # rebuild jit so use_pallas() re-evaluates
    jfn2 = chunk_loop(lambda p, t, pos, kv_:
                      dec_mod.decode_step(p, cfg, t, pos, kv_, greedy=True))
    r = timed("full step / jnp two-part attn", jfn2, params, jnp.int32(4),
              jnp.int32(256), kv)
    kv = r[1] if r is not None else dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)
    os.environ.pop("SMOLVISION_PALLAS", None)

    # --- 2. lm_head variants ---------------------------------------------
    W = params["lm_head"]                     # [V, H] bf16
    Wt = jnp.asarray(np.ascontiguousarray(np.asarray(W).T))  # [H, V]
    h_base = params["embed"][123].astype(jnp.float32)

    def lm_cur(W, h, i):
        h = h + i * 1e-6
        return jnp.argmax(jnp.einsum("h,vh->v", h.astype(W.dtype), W,
                                     preferred_element_type=jnp.float32))

    def lm_T(Wt, h, i):
        h = h + i * 1e-6
        return jnp.argmax(jnp.einsum("h,hv->v", h.astype(Wt.dtype), Wt,
                                     preferred_element_type=jnp.float32))

    V = W.shape[0]
    Vp = ((V + 1023) // 1024) * 1024
    Wp = jnp.pad(W, ((0, Vp - V), (0, 0)))

    def lm_pallas(Wp, h, i):
        h = h + i * 1e-6
        return pallas_argmax_matvec(h.astype(Wp.dtype), Wp, V)

    def loop_lm(fn, W):
        def run(W, h0):
            def body(c):
                i, _ = c
                return (i + 1, fn(W, h0, i.astype(jnp.float32)))

            return jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                                      (jnp.int32(0), jnp.int32(0)))[1]

        return jax.jit(run)

    timed("lm_head argmax [V,H] einsum", loop_lm(lm_cur, W), W, h_base)
    timed("lm_head argmax [H,V] einsum", loop_lm(lm_T, Wt), Wt, h_base)
    timed("lm_head argmax pallas fused", loop_lm(lm_pallas, Wp), Wp, h_base)
    # correctness
    a = int(jax.device_get(lm_cur(W, h_base, jnp.float32(0))))
    b = int(jax.device_get(lm_T(Wt, h_base, jnp.float32(0))))
    c = int(jax.device_get(lm_pallas(Wp, h_base, jnp.float32(0))))
    log(f"argmax agreement: einsum={a} transposed={b} pallas={c}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
