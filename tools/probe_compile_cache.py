"""Probe whether Pallas/Mosaic compiles hit the persistent jax cache.

Runs a tiny Pallas kernel + a plain jit matmul under a throwaway cache dir,
timing trace+compile. Run TWICE (separate processes): if the second run's
compile times collapse for the matmul but not the Pallas call, Mosaic
artifacts are missing the cache.

Usage: python tools/probe_compile_cache.py [cache_dir]
"""
import sys, time, os

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_jax_cache"

import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# surface cache hit/miss decisions
os.environ.setdefault("JAX_DEBUG_LOG_MODULES", "")
import logging
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)


def kern(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] @ y_ref[...]


@jax.jit
def pallas_mm(x, y):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(x, y)


@jax.jit
def plain_mm(x, y):
    return (x @ y).sum()


x = jnp.ones((256, 256), jnp.float32)
y = jnp.ones((256, 256), jnp.float32)

t0 = time.monotonic()
plain_mm(x, y).block_until_ready()
t1 = time.monotonic()
print(f"plain_mm compile+run: {t1-t0:.3f}s", flush=True)

t0 = time.monotonic()
pallas_mm(x, y).block_until_ready()
t1 = time.monotonic()
print(f"pallas_mm compile+run: {t1-t0:.3f}s", flush=True)

# list cache entries
if os.path.isdir(cache_dir):
    entries = os.listdir(cache_dir)
    print(f"cache entries: {len(entries)}")
    for e in entries:
        print("  ", e, os.path.getsize(os.path.join(cache_dir, e)))
