#!/usr/bin/env python3
"""Stage-B decode experiments: how fast can Pallas stream the decode weights?

profile_decode/2 measured (v5e, 0.6B): matvec chain 470 GB/s effective,
lm_head matvec 370 GB/s, vs 819 GB/s HBM peak.  Is that an XLA matvec
limitation or the chip's real matvec ceiling?

  1. DMA roofline: stream lm_head [V,H] bf16 through VMEM doing a max()
     only — the fastest possible "read everything" kernel.
  2. matvec+argmax with different block_v (q row-replicated to 8 for MXU
     sublane alignment).
  3. gate_up-shaped matvec [2I,H] for comparison.

Every kernel folds a per-iteration scalar into its result so the loop body
is not hoistable and no dispatch is tunnel-memoizable; the weights are
never copied.
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
    log(f"{name:44s} {per:7.3f} ms/it{bw}")


def loop(fn):
    """STEPS sequential iterations inside one jit; fn sees a per-iteration
    scalar so nothing is loop-invariant."""

    def run(*args):
        *arrs, i0 = args

        def body(c):
            k, acc = c
            return (k + 1, fn(*arrs, i0 + k.astype(jnp.float32)))

        return jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                                  (jnp.int32(0), jnp.float32(0)))[1]

    return jax.jit(run)


# --- 1. DMA roofline: max over all tiles + iteration scalar --------------

def _read_kernel(s_ref, x_ref, o_ref, acc_ref, *, n_b):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc_ref[0] = jnp.float32(-3.4e38)

    m = jnp.max(x_ref[...].astype(jnp.float32))
    acc_ref[0] = jnp.maximum(acc_ref[0], m)

    @pl.when(b == n_b - 1)
    def _():
        o_ref[0] = acc_ref[0] + s_ref[0]


def read_all(x, s, block_rows):
    R, H = x.shape
    n_b = R // block_rows
    return pl.pallas_call(
        functools.partial(_read_kernel, n_b=n_b),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_b,),
            in_specs=[pl.BlockSpec((block_rows, H), lambda b, *r: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.reshape(s, (1,)), x)[0]


# --- 2. matvec+argmax variants ------------------------------------------

def _mv_kernel(h_ref, w_ref, o_ref, best_ref, *, bv, v_real):
    vb = pl.program_id(0)

    @pl.when(vb == 0)
    def _():
        best_ref[0] = jnp.float32(-3.4e38)
        best_ref[1] = jnp.float32(0.0)

    h = h_ref[...]                                    # [8, H] bf16 (row-rep)
    w = w_ref[...]                                    # [BV, H] bf16
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [8, BV]
    cols = vb * bv + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
    srow = jnp.where(cols < v_real, s[:1], -3.4e38)
    m = jnp.max(srow)
    idx = jnp.argmax(srow[0]).astype(jnp.float32) + vb * bv

    @pl.when(m > best_ref[0])
    def _():
        best_ref[0] = m
        best_ref[1] = idx

    @pl.when(vb == pl.num_programs(0) - 1)
    def _():
        o_ref[0] = best_ref[1].astype(jnp.int32)


def mv_argmax(h, w_pad, v_real, block_v):
    Vp, H = w_pad.shape
    hq = jnp.broadcast_to(h.reshape(1, H), (8, H)).astype(w_pad.dtype)
    return pl.pallas_call(
        functools.partial(_mv_kernel, bv=block_v, v_real=v_real),
        grid=(Vp // block_v,),
        in_specs=[
            pl.BlockSpec((8, H), lambda v: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, H), lambda v: (v, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(hq, w_pad)[0]


def main():
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    V, H, I = 151936, 1024, 3072
    Vp = (V + 4095) // 4096 * 4096
    W = jax.random.normal(key, (Vp, H), jnp.bfloat16) * 0.02
    Wg = jax.random.normal(key, (2 * I, H), jnp.bfloat16) * 0.02
    h = jax.random.normal(key, (H,), jnp.float32)
    wb = Vp * H * 2
    gb = 2 * I * H * 2

    for br in (512, 1024, 4096):
        timed(f"read-all lm_head block={br}",
              loop(lambda W, i, br=br: read_all(W, i, br)), W,
              bytes_per_it=wb)

    # XLA reference matvec (h varies per iteration)
    timed("xla einsum argmax",
          loop(lambda W, h, i: jnp.argmax(
              jnp.einsum("h,vh->v", (h + i * 1e-6).astype(W.dtype), W,
                         preferred_element_type=jnp.float32)).astype(jnp.float32)),
          W, h, bytes_per_it=wb)

    for bv in (1024, 2048, 4096):
        timed(f"pallas mv+argmax bv={bv}",
              loop(lambda W, h, i, bv=bv: mv_argmax(
                  h + i * 1e-6, W, V, bv).astype(jnp.float32)),
              W, h, bytes_per_it=wb)

    # gate_up-shaped matvec: XLA vs pallas read
    timed("xla gate_up matvec",
          loop(lambda Wg, h, i: jnp.sum(
              jnp.einsum("h,ih->i", (h + i * 1e-6).astype(Wg.dtype), Wg,
                         preferred_element_type=jnp.float32))),
          Wg, h, bytes_per_it=gb)
    timed("read-all gate_up block=512",
          loop(lambda Wg, i: read_all(Wg, i, 512)), Wg,
          bytes_per_it=gb)
    return 0




def split_main():
    """Experiment: k parallel matvec streams over lm_head halves/quarters."""
    log(f"backend={jax.default_backend()} (split-k)")
    key = jax.random.PRNGKey(0)
    V, H = 151936, 1024
    Vp = (V + 4095) // 4096 * 4096
    W = jax.random.normal(key, (Vp, H), jnp.bfloat16) * 0.02
    h = jax.random.normal(key, (H,), jnp.float32)
    wb = Vp * H * 2

    for k in (2, 4, 8):
        parts = [jnp.asarray(W[i * (Vp // k):(i + 1) * (Vp // k)]) for i in range(k)]

        def fn(*args, k=k):
            *ps, hh, i = args
            hh = (hh + i * 1e-6).astype(jnp.bfloat16)
            outs = [jnp.einsum("h,vh->v", hh, p,
                               preferred_element_type=jnp.float32) for p in ps]
            return jnp.argmax(jnp.concatenate(outs)).astype(jnp.float32)

        timed(f"xla split-k argmax k={k}", loop(fn), *parts, h, bytes_per_it=wb)

    # interleaved rows: [Vp/8, 8*H] layout, one einsum with wider rows
    W8 = jnp.asarray(W.reshape(Vp // 8, 8 * H))
    timed("xla rowpacked [V/8,8H] matvec",
          loop(lambda W8, h, i: jnp.argmax(
              jnp.einsum("h,vh->v",
                         jnp.tile((h + i * 1e-6).astype(jnp.bfloat16), 8)[:8 * H] * 0
                         + jnp.tile((h + i * 1e-6).astype(jnp.bfloat16), 8),
                         W8, preferred_element_type=jnp.float32)).astype(jnp.float32)),
          W8, h, bytes_per_it=wb)
    return 0


if __name__ == "__main__":
    sys.exit(split_main() if os.environ.get("SPLITK") else main())
