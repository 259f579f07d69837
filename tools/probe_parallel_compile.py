"""Do server-side compiles overlap when issued from multiple host threads?

Compiles three DIFFERENT decoder-shaped programs via AOT .lower().compile(),
first sequentially, then (fresh shapes so nothing is cached) concurrently
from 3 threads. If the concurrent wall time ~= max(individual), engine init
can pre-compile prefill/decode/encoder in parallel.
"""
import sys, time, os
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

L, H, I = 28, 1024, 3072


def make_prog(i_dim, steps):
    def step(w1, w2, tok):
        h = jnp.zeros((1, H), jnp.float32) + tok.astype(jnp.float32) * 1e-3

        def layer(h, ws):
            a, b = ws
            x = jnp.einsum("th,ih->ti", h.astype(jnp.bfloat16), a,
                           preferred_element_type=jnp.float32)
            h = h + jnp.einsum("ti,hi->th", jax.nn.silu(x).astype(jnp.bfloat16), b,
                               preferred_element_type=jnp.float32)
            return h, None

        h, _ = jax.lax.scan(layer, h, (w1, w2))
        return jnp.sum(h).astype(jnp.float32)

    def chunk(w1, w2, tok):
        def body(c):
            i, t = c
            return (i + 1, step(w1, w2, t) + t * 0)

        return jax.lax.while_loop(lambda c: c[0] < steps, body,
                                  (jnp.int32(0), tok))[1]

    return jax.jit(chunk)


sh_w1 = jax.ShapeDtypeStruct((L, I, H), jnp.bfloat16)
sh_w2 = jax.ShapeDtypeStruct((L, H, I), jnp.bfloat16)
sh_t = jax.ShapeDtypeStruct((), jnp.float32)

# sequential: 3 distinct programs (distinct steps constants)
t0 = time.monotonic()
for s in (17, 18, 19):
    make_prog(I, s).lower(sh_w1, sh_w2, sh_t).compile()
seq = time.monotonic() - t0
print(f"sequential 3 compiles: {seq:.2f}s", flush=True)

# concurrent: 3 fresh programs in 3 threads
progs = [make_prog(I, s) for s in (23, 24, 25)]
lowered = [p.lower(sh_w1, sh_w2, sh_t) for p in progs]
t0 = time.monotonic()
with ThreadPoolExecutor(3) as ex:
    list(ex.map(lambda l: l.compile(), lowered))
par = time.monotonic() - t0
print(f"concurrent 3 compiles: {par:.2f}s", flush=True)
