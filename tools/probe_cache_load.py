"""Isolate why persistent-cache HITS are slower than fresh compiles on axon.

Builds a decoder-shaped program (lax.scan over stacked weights + while_loop +
donation), times trace+compile+first-run in process 1, then load+first-run in
process 2 (cache hit). Also times a second call in both.

Usage: python tools/probe_cache_load.py [cache_dir]
"""
import sys, time, os

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_load_cache"

import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

L, H, I, V, STEPS = 28, 1024, 3072, 8192, 48

key = jax.random.PRNGKey(0)
w1 = jax.random.normal(key, (L, I, H), jnp.bfloat16) * 0.02
w2 = jax.random.normal(key, (L, H, I), jnp.bfloat16) * 0.02
lm = jax.random.normal(key, (V, H), jnp.bfloat16) * 0.02


def step(params, tok, kv):
    w1, w2, lm = params
    h = jnp.zeros((1, H), jnp.float32) + tok.astype(jnp.float32) * 1e-3

    def layer(h, ws):
        a, b = ws
        x = jnp.einsum("th,ih->ti", h.astype(jnp.bfloat16), a,
                       preferred_element_type=jnp.float32)
        h = h + jnp.einsum("ti,hi->th", jax.nn.silu(x).astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)
        return h, None

    h, _ = jax.lax.scan(layer, h, (w1, w2))
    logits = jnp.einsum("th,vh->tv", h.astype(jnp.bfloat16), lm,
                        preferred_element_type=jnp.float32)
    return jnp.argmax(logits[0]).astype(jnp.int32), kv + 1.0


def chunk(params, tok, kv):
    def body(c):
        i, t, kv_ = c
        t, kv_ = step(params, t, kv_)
        return (i + 1, t, kv_)

    return jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                              (jnp.int32(0), tok, kv))[1:]


jfn = jax.jit(chunk, donate_argnums=(2,))
params = (w1, w2, lm)
kv = jnp.zeros((L, 2, 512, 8, 128), jnp.bfloat16)

t0 = time.monotonic()
tok, kv = jfn(params, jnp.int32(3), kv)
print(f"first call (trace+compile_or_load+run): {time.monotonic()-t0:.3f}s", flush=True)
t0 = time.monotonic()
v = int(jax.device_get(tok))
print(f"fetch: {time.monotonic()-t0:.3f}s tok={v}", flush=True)

t0 = time.monotonic()
tok, kv = jfn(params, jnp.int32(4), kv)
v = int(jax.device_get(tok))
print(f"second call+fetch: {time.monotonic()-t0:.3f}s tok={v}", flush=True)

ent = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []
print(f"cache entries: {len(ent)}")
