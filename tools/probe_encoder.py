#!/usr/bin/env python3
"""Encoder-path stage attribution for batch serving: the B=32 serving probe
(tools/probe_serving.py) showed mel+encode ~400-480 ms of the ~680 ms wall —
this breaks that down: host prep, audio upload, device mel, conv stem,
window transformer.

Stages are timed with a device_get sync after each (which serializes the
pipeline — the per-stage sums can exceed the fused wall).  Inputs vary per
rep (tunnel memoization).  Single jax process only.
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

from smolvision_tpu.io.wav import load_wav
from smolvision_tpu.runtime import batch_segments as bs
from smolvision_tpu.runtime.engine import Engine

BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
JFK = "/root/reference/samples/jfk.wav"
B = int(os.environ.get("SMOLVISION_PROBE_B", "32"))
REPS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    # block_until_ready is NOT a reliable fence over the axon tunnel
    # (CLAUDE.md landmine) — force execution by fetching a reduction
    if isinstance(x, jax.Array):
        jax.device_get(jnp.sum(jnp.abs(x[..., :1].astype(jnp.float32))))
    else:
        jax.block_until_ready(x)
    return x


def main():
    from smolvision_tpu.ops.mel import (HOP_LENGTH, N_FFT, num_frames,
                                        reflect_pad)
    from smolvision_tpu.runtime.buckets import bucket

    log(f"backend={jax.default_backend()} B={B}")
    eng = Engine(BENCH_DIR, verbose=0)
    cfg = eng.cfg
    chunk = cfg.enc_chunk_size
    base = load_wav(JFK)
    rng = np.random.default_rng(7)

    def clips():
        return [(base + rng.normal(0, 1e-4, len(base))).astype(np.float32)
                for _ in range(B)]

    # warm the full path once (compiles everything)
    t0 = time.monotonic()
    out, n_tok = bs._encode_batch_device_mel(eng, clips())
    sync(out)
    log(f"warmup {time.monotonic() - t0:.1f} s; n_tokens[0]={n_tok[0]}")

    stages = {}

    def rec(name, dt):
        stages.setdefault(name, []).append(dt * 1000.0)

    for rep in range(REPS):
        segments = clips()
        frames_list = [num_frames(len(s)) for s in segments]
        fcap = -(-max(frames_list) // (2 * chunk)) * (2 * chunk)
        pcap = fcap * HOP_LENGTH + N_FFT

        t0 = time.monotonic()
        buf = np.zeros((B, pcap), np.float16)
        for b, s in enumerate(segments):
            p = reflect_pad(np.asarray(s, dtype=np.float32))
            buf[b, : len(p)] = p.astype(np.float16)
        rec("host prep (pad+f16)", time.monotonic() - t0)

        t0 = time.monotonic()
        dev_buf = sync(jnp.asarray(buf))
        rec(f"upload {buf.nbytes / 1e6:.1f} MB", time.monotonic() - t0)

        jits = eng._device_mel_jits
        t0 = time.monotonic()
        mel_t = sync(jits["mel"](dev_buf, jnp.asarray(frames_list, jnp.int32),
                                 fcap))
        rec("device mel", time.monotonic() - t0)

        nc = fcap // chunk
        ncap = bucket(B * nc, 4)
        t0 = time.monotonic()
        blocks = sync(jits["blocks"](mel_t, ncap))
        rec("block reshape", time.monotonic() - t0)

        t0 = time.monotonic()
        full_tok = sync(eng._conv_stem(eng.enc_params, blocks))
        rec(f"conv stem ({ncap} blocks)", time.monotonic() - t0)

        # tails + pool + window transformer (the rest of the real path)
        full_counts = [f // chunk for f in frames_list]
        rems = [f % chunk for f in frames_list]
        partial_rows, partial_blocks, by_width = {}, [], {}
        for b, rem in enumerate(rems):
            if rem:
                by_width.setdefault(rem, []).append(b)
        t0 = time.monotonic()
        for w, idxs in by_width.items():
            rows = jnp.asarray(idxs, jnp.int32)
            starts = jnp.asarray([full_counts[b] * chunk for b in idxs],
                                 jnp.int32)
            arr = jits["tails"](mel_t, rows, starts, w)
            o = eng._conv_stem(eng.enc_params, arr)
            nq, rows_w, d_ = o.shape
            blk = len(partial_blocks)
            partial_blocks.append(o.reshape(nq * rows_w, d_))
            for j, b in enumerate(idxs):
                partial_rows[b] = (blk, j * rows_w, rows_w)
        sync(partial_blocks[-1] if partial_blocks else full_tok)
        rec("tail convs", time.monotonic() - t0)

        t0 = time.monotonic()
        full_starts = [b * nc for b in range(B)]
        out, _ = bs._pool_and_encode(eng, B, full_tok, B * nc, full_starts,
                                     full_counts, partial_rows,
                                     partial_blocks)
        sync(out)
        rec("pool gather + window transformer", time.monotonic() - t0)

        # fused end-to-end (no intermediate syncs) for reference
        segments = clips()
        t0 = time.monotonic()
        out, _ = bs._encode_batch_device_mel(eng, segments)
        sync(out)
        rec("FUSED end-to-end", time.monotonic() - t0)

    log("")
    for name, ts in stages.items():
        log(f"{name:38s} best {min(ts):7.1f} ms  (runs: "
            + ", ".join(f"{t:.0f}" for t in ts) + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
