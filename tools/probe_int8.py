#!/usr/bin/env python3
"""Can int8 weights beat the bf16 decode speed-of-light (2.45 ms/token)?

docs/DECODE_PROFILE.md closed the bf16 path at ~485 GB/s effective — the
remaining lever is halving the bytes.  This probe measures, on the real
chip, the lm_head-shaped matvec+argmax (the largest single stream) and the
gate_up-shaped matvec under:

  1. bf16 einsum (round-2 reference: ~0.95 ms, 336 GB/s)
  2. int8 weights, XLA: einsum(h_bf16, q.astype(bf16)) * scale
     — tests whether XLA fuses the convert into the dot operand fetch or
     materializes a bf16 copy (which would READ+WRITE 3x the int8 bytes)
  3. int8 x int8: dynamic per-vector activation quant, int32 accumulate
  4. Pallas int8 matvec+argmax: int8 tile -> in-register bf16 -> MXU dot,
     per-row scale folded into the argmax merge

Same discipline as profile_decode3.py: per-iteration scalar folded into
every result (nothing hoistable / tunnel-memoizable), fetch fences.
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

if jax.default_backend() == "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "jax_cache"))

STEPS = 64
REPS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, jfn, *args, bytes_per_it=None):
    def call(i):
        out = jfn(*args, jnp.float32(i))
        return np.asarray(jax.device_get(out))

    call(0)
    best = float("inf")
    for r in range(REPS):
        t0 = time.monotonic()
        call(r + 1)
        ms = (time.monotonic() - t0) * 1000.0
        best = min(best, ms)
    per = best / STEPS
    bw = (f"  {bytes_per_it / per / 1e6:6.0f} GB/s" if bytes_per_it else "")
    log(f"{name:46s} {per:7.3f} ms/it{bw}")


def loop(fn):
    def run(*args):
        *arrs, i0 = args

        def body(c):
            k, acc = c
            return (k + 1, fn(*arrs, i0 + k.astype(jnp.float32)))

        return jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                                  (jnp.int32(0), jnp.float32(0)))[1]

    return jax.jit(run)


# --- Pallas int8 matvec+argmax --------------------------------------------

def _mv_q8_kernel(h_ref, w_ref, s_ref, o_ref, best_ref, *, bv, v_real):
    vb = pl.program_id(0)

    @pl.when(vb == 0)
    def _():
        best_ref[0] = jnp.float32(-3.4e38)
        best_ref[1] = jnp.float32(0.0)

    h = h_ref[...]                                    # [8, H] bf16 (row-rep)
    w = w_ref[...].astype(jnp.bfloat16)               # [BV, H] int8 -> bf16
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [8, BV]
    srow = s[:1] * s_ref[...]                          # [1, BV] scaled
    cols = vb * bv + jax.lax.broadcasted_iota(jnp.int32, (1, srow.shape[1]), 1)
    srow = jnp.where(cols < v_real, srow, -3.4e38)
    m = jnp.max(srow)
    idx = jnp.argmax(srow[0]).astype(jnp.float32) + vb * bv

    @pl.when(m > best_ref[0])
    def _():
        best_ref[0] = m
        best_ref[1] = idx

    @pl.when(vb == pl.num_programs(0) - 1)
    def _():
        o_ref[0] = best_ref[1].astype(jnp.int32)


def mv_q8_argmax(h, wq, scale, v_real, block_v):
    Vp, H = wq.shape
    hq = jnp.broadcast_to(h.reshape(1, H), (8, H)).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_mv_q8_kernel, bv=block_v, v_real=v_real),
        grid=(Vp // block_v,),
        in_specs=[
            pl.BlockSpec((8, H), lambda v: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, H), lambda v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda v: (0, v), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(hq, wq, scale.reshape(1, Vp))[0]


def main():
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    V, H, I = 151936, 1024, 3072
    Vp = (V + 4095) // 4096 * 4096
    W = jax.random.normal(key, (Vp, H), jnp.bfloat16) * 0.02
    Wg = jax.random.normal(jax.random.PRNGKey(1), (2 * I, H), jnp.bfloat16) * 0.02
    h = jax.random.normal(jax.random.PRNGKey(2), (H,), jnp.float32)
    bf = Vp * H * 2
    qb = Vp * H          # int8 bytes
    gbf = 2 * I * H * 2
    gqb = 2 * I * H

    def quant(w):
        wf = np.asarray(w, np.float32)
        s = np.abs(wf).max(axis=1) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(wf / s[:, None]), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s, jnp.float32)

    Wq, Ws = quant(W)
    Gq, Gs = quant(Wg)

    # 1. bf16 reference
    timed("lm_head bf16 einsum argmax",
          loop(lambda W, h, i: jnp.argmax(
              jnp.einsum("h,vh->v", (h + i * 1e-6).astype(W.dtype), W,
                         preferred_element_type=jnp.float32)).astype(jnp.float32)),
          W, h, bytes_per_it=bf)

    # 2. int8 weights via XLA convert
    timed("lm_head XLA int8->bf16 einsum argmax",
          loop(lambda Wq, Ws, h, i: jnp.argmax(
              jnp.einsum("h,vh->v", (h + i * 1e-6).astype(jnp.bfloat16),
                         Wq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) * Ws
          ).astype(jnp.float32)),
          Wq, Ws, h, bytes_per_it=qb)

    # 3. int8 x int8 (dynamic activation quant)
    def q8q8(Wq, Ws, h, i):
        hv = h + i * 1e-6
        sx = jnp.max(jnp.abs(hv)) / 127.0
        hq = jnp.clip(jnp.round(hv / sx), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("h,vh->v", hq, Wq, preferred_element_type=jnp.int32)
        return jnp.argmax(acc.astype(jnp.float32) * (Ws * sx)).astype(jnp.float32)

    timed("lm_head XLA int8xint8 argmax", loop(q8q8), Wq, Ws, h,
          bytes_per_it=qb)

    # 4. Pallas int8 kernel
    for bv in (2048, 4096):  # 8192 int8 double-buffered = 16 MB > VMEM scoped limit
        timed(f"lm_head pallas int8 mv+argmax bv={bv}",
              loop(lambda Wq, Ws, h, i, bv=bv: mv_q8_argmax(
                  h + i * 1e-6, Wq, Ws, V, bv).astype(jnp.float32)),
              Wq, Ws, h, bytes_per_it=qb)

    # gate_up shape: bf16 vs int8 XLA vs pallas
    timed("gate_up bf16 matvec",
          loop(lambda Wg, h, i: jnp.sum(
              jnp.einsum("h,ih->i", (h + i * 1e-6).astype(Wg.dtype), Wg,
                         preferred_element_type=jnp.float32))),
          Wg, h, bytes_per_it=gbf)
    timed("gate_up XLA int8->bf16 matvec",
          loop(lambda Gq, Gs, h, i: jnp.sum(
              jnp.einsum("h,ih->i", (h + i * 1e-6).astype(jnp.bfloat16),
                         Gq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) * Gs)),
          Gq, Gs, h, bytes_per_it=gqb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
