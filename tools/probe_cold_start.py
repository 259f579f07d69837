"""Attribute cold-start time: per-jit compile+first-run cost on a fresh
process (no persistent cache). Mirrors the CLI's jfk.wav flow.

Usage: python tools/probe_cold_start.py
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

t_imp0 = time.monotonic()
import jax
import jax.numpy as jnp
import numpy as np

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-synthetic")


def log(m):
    print(f"[{time.monotonic()-t_imp0:7.2f}s] {m}", file=sys.stderr, flush=True)


log(f"imports done")

from smolvision_tpu.io.wav import load_wav
from smolvision_tpu.runtime.engine import Engine

t0 = time.monotonic()
eng = Engine(BENCH_DIR, verbose=0)
log(f"Engine init (weights->device): {time.monotonic()-t0:.2f}s")

samples = load_wav("/root/reference/samples/jfk.wav")
if os.environ.get("PROBE_NOISE"):
    # defeat tunnel memoization: all downstream dispatches get fresh inputs
    rng = np.random.default_rng(int(os.environ["PROBE_NOISE"]))
    samples = (samples + rng.normal(0, 1e-4, len(samples))).astype(np.float32)
    log("noise applied")
t0 = time.monotonic()
audio, n_tok = eng.encode(samples)
jax.block_until_ready(audio)
log(f"encode (conv+transformer compile+run): {time.monotonic()-t0:.2f}s  n_tok={n_tok}")

eng.prepare_prompt()
from smolvision_tpu.runtime.prompt import build_asr_prompt

ids, audio_start = build_asr_prompt(eng.cfg, n_tok,
                                    force_tokens=eng._force_tokens or ())
log(f"prompt ids: {len(ids)} audio_start={audio_start}")

t0 = time.monotonic()
first_tok, start_pos = eng.prefill_ids(ids, audio, audio_start, n_tok)
_ = int(jax.device_get(first_tok))
log(f"prefill (compile+run): {time.monotonic()-t0:.2f}s")

toks = []
t0 = time.monotonic()
n = eng.decode_greedy(first_tok, start_pos, 48,
                      lambda t: (toks.append(t) or True))
log(f"decode_greedy 48 (chunk compile+run): {time.monotonic()-t0:.2f}s  n={n}")

t0 = time.monotonic()
n = eng.decode_greedy(first_tok, start_pos, 48, lambda t: True)
log(f"decode_greedy again (warm): {time.monotonic()-t0:.2f}s  n={n}")
