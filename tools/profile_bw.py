#!/usr/bin/env python3
"""Measure the real memory-bandwidth / FLOPs roofline of this TPU.

The decode-path analysis assumed v5e's nominal 819 GB/s HBM; the measured
components (matvec chain 470 GB/s, lm_head 363 GB/s) suggest the effective
ceiling over the axon tunnel is lower.  Pin it empirically.
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

ITERS = 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, jfn, args, bytes_per_iter=None, flops_per_iter=None):
    out = jfn(*args, jnp.float32(0.0))
    _ = np.asarray(jax.device_get(out))
    best = float("inf")
    for r in range(3):
        t0 = time.monotonic()
        out = jfn(*args, jnp.float32(r + 1))
        _ = np.asarray(jax.device_get(out))
        best = min(best, (time.monotonic() - t0) * 1000.0)
    per = best / ITERS
    extra = ""
    if bytes_per_iter:
        extra += f"  {bytes_per_iter / per / 1e6:.0f} GB/s"
    if flops_per_iter:
        extra += f"  {flops_per_iter / per / 1e9:.1f} TFLOP/s"
    log(f"{name:34s} {per:8.3f} ms/iter{extra}")


def loop(body):
    def run(*args):
        x0 = body(*args[:-1], args[-1])

        def f(c):
            i, acc = c
            return (i + 1, body(*args[:-1], args[-1] + i.astype(jnp.float32)) + acc * 0)

        return jax.lax.while_loop(lambda c: c[0] < ITERS,
                                  f, (jnp.int32(0), x0))[1]

    return jax.jit(run)


def main():
    log(f"backend={jax.default_backend()} device={jax.devices()[0]}")

    NB = 256 * 1024 * 1024  # 256 MB bf16 buffer
    n = NB // 2
    x = jnp.arange(n, dtype=jnp.int32).astype(jnp.bfloat16).reshape(-1, 1024)
    rows = x.shape[0]

    # read-only: row-sum reduce (reads NB, writes 4*rows)
    timed("reduce sum [256MB bf16]",
          loop(lambda x, s: jnp.sum(x.astype(jnp.float32), axis=1)[0] + s),
          (x,), bytes_per_iter=NB)

    # read+write: scale copy
    timed("elementwise x*s [256MB r + 256MB w]",
          loop(lambda x, s: (x * s.astype(jnp.bfloat16))[0, 0].astype(jnp.float32)),
          (x,), bytes_per_iter=2 * NB)

    # matvec: [1, 1024] x [131072, 1024]^T  (reads 256MB weights)
    w = x  # [131072, 1024]
    h = jnp.ones((1, 1024), jnp.bfloat16)
    timed("matvec h@W^T [256MB bf16]",
          loop(lambda w, h, s: jnp.einsum(
              "th,vh->tv", h + s.astype(jnp.bfloat16), w,
              preferred_element_type=jnp.float32)[0, 0]),
          (w, h), bytes_per_iter=NB)

    # 8-row matvec (MXU sublane util): [8, 1024] x W^T
    h8 = jnp.ones((8, 1024), jnp.bfloat16)
    timed("matvec 8rows@W^T [256MB bf16]",
          loop(lambda w, h, s: jnp.einsum(
              "th,vh->tv", h + s.astype(jnp.bfloat16), w,
              preferred_element_type=jnp.float32)[0, 0]),
          (w, h8), bytes_per_iter=NB)

    # MXU peak: 4096^3 matmul = 137 GFLOP
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16)
    timed("matmul 4096^3 bf16",
          loop(lambda a, b, s: jnp.dot(a + s.astype(jnp.bfloat16), b,
                                       preferred_element_type=jnp.float32)[0, 0]),
          (a, b), flops_per_iter=2 * 4096**3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
