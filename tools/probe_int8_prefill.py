#!/usr/bin/env python3
"""Does int8xint8 MXU matmul beat bf16 at the SERVING PREFILL shapes?

Round-3's tools/probe_int8.py found int8 no faster for DECODE (bandwidth-
bound matvecs — the int8 win there is bytes, already taken by --q8).  The
round-4 serving stage profile (tools/probe_serving_stages.py) shows the
64-row wave PREFILL is the largest device term (~235 ms at ~57-70% of the
bf16 MXU peak) and prefill is COMPUTE-bound — the regime where the v5e
MXU's 2x int8 throughput could pay.  This microprobe times, at the exact
prefill GEMM shapes (12288 collapsed tokens x 0.6B dims):

  a. bf16 x bf16 dot (the current path)
  b. int8 x int8 dot -> int32 (XLA dot_general, per-token activation
     quant + per-channel rescale — the full cost int8 must carry)
  c. int8 weights dequantized to bf16 then bf16 dot (the current --q8
     prefill path)

Measurement discipline: activations are generated ON DEVICE per rep from
a varying PRNG key (a host upload of 24 MB/rep swamps the ~1 ms matmul
over the ~43-85 MB/s tunnel — the first version of this probe measured
exactly that); device_get fences; best-of-reps.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    shapes = [
        ("qkv 12288x1024x2048", (12288, 1024, 2048)),
        ("gate_up 12288x1024x6144", (12288, 1024, 6144)),
        ("down 12288x3072x1024", (12288, 3072, 1024)),
    ]
    for name, (M, K, N) in shapes:
        w = rng.normal(0, 1, (N, K)).astype(np.float32)
        w_bf16 = jnp.asarray(w, jnp.bfloat16)
        scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
        w_i8 = jnp.asarray(np.round(w / scale).clip(-127, 127), jnp.int8)
        w_scale = jnp.asarray(scale[:, 0], jnp.float32)

        # ITERS dots per dispatch: a single op is invisible under the
        # ~27 ms tunnel RTT floor.  Each iteration's input depends on the
        # previous output (no DCE / no ILP overlap-cheating).
        ITERS = 64

        def chain(body):
            def run(key):
                x0 = jax.random.normal(key, (M, K), jnp.bfloat16)

                def step(x, _):
                    y = body(x)                      # [M, N] f32
                    # fold output back into the next input (cheap slice)
                    nxt = (x + y[:, :1].astype(jnp.bfloat16)
                           * jnp.bfloat16(1e-6))
                    return nxt, y[0, 0]

                _, ys = jax.lax.scan(step, x0, None, length=ITERS)
                return ys

            return jax.jit(run)

        def body_bf16(x, w=w_bf16):
            return jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        def body_int8(x, w=w_i8, s=w_scale):
            xs = (jnp.max(jnp.abs(x), axis=1, keepdims=True)
                  .astype(jnp.float32) / 127.0)
            xq = jnp.round(x.astype(jnp.float32) / xs).clip(-127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * xs * s[None, :]

        def body_dequant(x, w=w_i8, s=w_scale):
            wb = w.astype(jnp.bfloat16) * s[:, None].astype(jnp.bfloat16)
            return jax.lax.dot_general(
                x, wb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        tflop = 2 * M * K * N / 1e12
        out = [name]
        for label, body in (("bf16", body_bf16), ("int8xint8", body_int8),
                            ("int8-dequant", body_dequant)):
            fn = chain(body)
            jax.device_get(fn(jax.random.PRNGKey(0)))   # compile
            best = float("inf")
            for i in range(1, 6):
                t0 = time.monotonic()
                jax.device_get(fn(jax.random.PRNGKey(i)))
                best = min(best, (time.monotonic() - t0) * 1000.0)
            per = best / ITERS
            out.append(f"{label} {per:.3f} ms/dot "
                       f"({tflop / per * 1e3:.0f} TFLOP/s)")
        print(" | ".join(out), flush=True)


if __name__ == "__main__":
    main()
