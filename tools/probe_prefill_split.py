"""Split the prefill cold cost into trace/lower, server compile, and first
execute. PROBE_NOISE=<seed> perturbs inputs to defeat tunnel memoization.
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")
t_start = time.monotonic()


def log(m):
    print(f"[{time.monotonic()-t_start:7.2f}s] {m}", file=sys.stderr, flush=True)


from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.runtime.engine import Engine

eng = Engine(BENCH_DIR, verbose=0)
cfg = eng.cfg
log("engine loaded")

if os.environ.get("PROBE_BLOCK_UPLOAD"):
    t0 = time.monotonic()
    jax.block_until_ready((eng.dec_params, eng.enc_params))
    log(f"blocked on weight upload: {time.monotonic()-t0:.2f}s")

TCAP, KCAP = 192, 512
kv = dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)

jfn = jax.jit(
    lambda p, e, s, v, kv: dec_mod.prefill(p, cfg, e, s, v, kv, greedy=True),
    donate_argnums=(4,))

rng = np.random.default_rng(int(os.environ.get("PROBE_NOISE", "0")))
embeds = jnp.asarray(rng.normal(0, 0.02, (TCAP, cfg.dec_hidden)).astype(np.float32))

sh = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
t0 = time.monotonic()
low = jfn.lower(jax.tree.map(sh, eng.dec_params), sh(embeds),
                jax.ShapeDtypeStruct((), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32), sh(kv))
log(f"trace+lower: {time.monotonic()-t0:.2f}s")

t0 = time.monotonic()
comp = low.compile()
log(f"server compile: {time.monotonic()-t0:.2f}s")

t0 = time.monotonic()
tok, kv2 = comp(eng.dec_params, embeds, jnp.int32(0), jnp.int32(158), kv)
v = int(jax.device_get(tok))
log(f"first execute+fetch: {time.monotonic()-t0:.2f}s tok={v}")

embeds2 = embeds + 1e-5
kv3 = dec_mod.make_kv_cache(cfg, KCAP, jnp.bfloat16)
t0 = time.monotonic()
tok, kv3 = comp(eng.dec_params, embeds2, jnp.int32(0), jnp.int32(158), kv3)
v = int(jax.device_get(tok))
log(f"second execute+fetch (new inputs): {time.monotonic()-t0:.2f}s tok={v}")
