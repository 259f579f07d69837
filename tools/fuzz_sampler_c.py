#!/usr/bin/env python3
"""Differential fuzz: runtime/sampling.CRefSampler vs the reference's
COMPILED sampler (sample_token, qwen_asr.c:2250-2313), exported from the
parity source build by cross_parity_c.ensure_sample_oracle() and driven
in-process via ctypes.

This settles empirically whether the Python twin reproduces the SHIPPED
codegen (-O2 -march=native -ffast-math: reassociated softmax sums,
reciprocal-multiply temperature, vectorized expf are all possible) — not
just the C source semantics.  Both sides replay the same drand48 stream,
so token ids must match EXACTLY draw-for-draw; any mismatch prints the
trial's full parameterization plus the draw margin (distance from the
drand48 double to the nearest cumsum boundary — knife-edge draws are the
one place ULP-level codegen drift could legitimately flip a token).

Regimes fuzzed: vocab 8..8192 (+one 151936 trial), logit scales 0.1..30,
quantized near-tie surfaces, +/-1e30 extremes, zero logits (penalty sign
gate), repetition windows with duplicate and out-of-range ids, temperature
{0.2,0.7,1.0,1.3}, penalty {0.9,1.0,1.1,1.5}, top_k {0,1,5,40,V,V+7}.

Usage: python tools/fuzz_sampler_c.py [--trials 400] [--draws 8]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from smolvision_tpu.runtime.sampling import CRefSampler  # noqa: E402
from tools import cross_parity_c  # noqa: E402


def load_oracle():
    so = cross_parity_c.ensure_sample_oracle()
    lib = ctypes.CDLL(so)
    lib.sample_oracle.restype = ctypes.c_int
    lib.sample_oracle.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int]
    lib.oracle_srand48.argtypes = [ctypes.c_long]
    lib.oracle_drand48.restype = ctypes.c_double
    return lib


def oracle_sample(lib, logits: np.ndarray, recent: np.ndarray,
                  temp: float, rep: float, top_k: int) -> int:
    buf = np.array(logits, dtype=np.float32)  # sample_token mutates in place
    rec = np.asarray(recent, dtype=np.int32)
    return int(lib.sample_oracle(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.shape[0],
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), rec.shape[0],
        ctypes.c_float(temp), ctypes.c_float(rep), ctypes.c_int(top_k)))


def make_logits(rng, vocab: int, regime: str) -> np.ndarray:
    if regime == "normal":
        x = rng.normal(0, rng.choice([0.1, 1.0, 5.0, 30.0]), vocab)
    elif regime == "quantized":  # heavy tie surface
        x = np.round(rng.normal(0, 2.0, vocab) * 4) / 4
    elif regime == "extreme":
        x = rng.normal(0, 10.0, vocab)
        x[rng.integers(0, vocab, max(1, vocab // 16))] = 1e30
        x[rng.integers(0, vocab, max(1, vocab // 16))] = -1e30
    elif regime == "zeros":  # penalty's  v > 0  gate on exact zeros
        x = rng.normal(0, 1.0, vocab)
        x[rng.integers(0, vocab, max(1, vocab // 4))] = 0.0
    else:
        raise ValueError(regime)
    return x.astype(np.float32)


def draw_margin(s: CRefSampler, logits: np.ndarray, r: float) -> float:
    """Distance from the drand48 double to the nearest f64-cumsum boundary
    for OUR transform of these logits (diagnostic only)."""
    from smolvision_tpu.runtime.sampling import _libc_expf

    t = s.transform(logits)
    m = t.max()
    e = _libc_expf(t - m)
    ssum = np.cumsum(e, dtype=np.float32)[-1]
    probs = e * (np.float32(1.0) / ssum)
    cum = np.cumsum(probs.astype(np.float64))
    return float(np.abs(cum - r).min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=400)
    ap.add_argument("--draws", type=int, default=8,
                    help="chained draws per trial (stream lockstep check)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    lib = load_oracle()
    rng = np.random.default_rng(args.seed)
    regimes = ["normal", "quantized", "extreme", "zeros"]
    mismatches = []
    min_margin = 1.0
    n_draws = 0

    for trial in range(args.trials):
        vocab = 151936 if trial == 0 else int(rng.integers(8, 8192))
        regime = regimes[trial % len(regimes)]
        temp = float(rng.choice([0.2, 0.7, 1.0, 1.3]))
        rep = float(rng.choice([0.9, 1.0, 1.1, 1.5]))
        top_k = int(rng.choice([0, 1, 5, 40, vocab, vocab + 7]))
        n_recent = int(rng.integers(0, 65))
        recent = rng.integers(-3, vocab + 3, n_recent).astype(np.int32)
        seed48 = int(rng.integers(0, 2**31))

        lib.oracle_srand48(ctypes.c_long(seed48))
        ours = CRefSampler(temp, rep, top_k, seed48)
        ours.recent = [int(t) for t in recent]

        for d in range(args.draws):
            logits = make_logits(rng, vocab, regime)
            # snapshot our rng BEFORE the draw for the margin diagnostic
            x_before = ours.rng.x
            got = ours.sample(logits)
            r_used = CRefSampler(temp, rep, top_k, 0)
            r_used.rng.x = x_before
            r_used.recent = list(ours.recent)
            want = oracle_sample(lib, logits, recent, temp, rep, top_k)
            n_draws += 1
            margin = draw_margin(r_used, logits, r_used.rng.random())
            min_margin = min(min_margin, margin)
            if got != want:
                mismatches.append({
                    "trial": trial, "draw": d, "vocab": vocab,
                    "regime": regime, "temp": temp, "rep": rep,
                    "top_k": top_k, "n_recent": n_recent,
                    "seed48": seed48, "got": got, "want": want,
                    "margin": margin})
                print(f"MISMATCH {mismatches[-1]}", flush=True)
        if (trial + 1) % 50 == 0:
            print(f"fuzz_sampler_c: {trial + 1}/{args.trials} trials, "
                  f"{n_draws} draws, {len(mismatches)} mismatches, "
                  f"min margin {min_margin:.3e}", flush=True)

    rec = {"trials": args.trials, "draws": n_draws,
           "mismatches": len(mismatches), "min_margin": min_margin}
    print(json.dumps(rec))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
