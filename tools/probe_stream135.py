#!/usr/bin/env python3
"""Per-chunk phase attribution for long-file streaming (the 134 s clip).

RESOLVED 2026-08-19: there is NO long-file steady-state cliff.  A bench
stream135 run had measured 1.56x realtime with ~90 s *warm* runs; this
probe attributed it — run 0 (cold) spent 118 s in the first decode compile
plus shape-bucket compiles, run 1 (warm) ran 10.4 s = 12.9x realtime with
every chunk at ~120-180 ms (totals: begin 1.2 s, prefill 0.3 s, decode
8.9 s).  A bench re-run in a healthy server period confirmed: warm runs
9.4-25 s, best 14.28x realtime (vs the reference's 0.96x on 135 s,
README.md:419-424).  The earlier slow warm runs were the axon server's
slow-compile period dribbling async shape-ladder compiles into the timed
runs — the same variance class as docs/COLDSTART.md; never conclude from
one bench window.

The probe remains useful as the per-chunk phase-attribution harness for
any streaming perf question: it drives StreamState chunk-by-chunk and
times begin_chunk (mel+encode+prompt), prefill, and decode separately.
Run on TPU, one process, nothing else running (CLAUDE.md landmines).

Usage: python tools/probe_stream135.py [--runs 2] [--sec 134]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = "/root/reference/samples"
CLIP_45S = os.path.join(SAMPLES, "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")
CLIP_89S = os.path.join(SAMPLES, "night_of_the_living_dead_1968",
                        "89s_ill_come_back_down_as_soon_as.wav")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sec", type=float, default=134.0)
    args = ap.parse_args()

    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    model_dir = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
    rng = np.random.default_rng(0xA11CE)

    clip = np.concatenate([load_wav(CLIP_45S), load_wav(CLIP_89S)])
    clip = clip[: int(args.sec * 16000)]
    audio_s = len(clip) / 16000.0
    print(f"clip {audio_s:.1f} s", file=sys.stderr, flush=True)

    eng = Engine(model_dir, verbose=0)
    eng.past_text_conditioning = True
    eng.token_cb = lambda piece: None

    for run in range(args.runs):
        samples = (clip + rng.normal(0.0, 1e-4, len(clip))).astype(np.float32)
        t_run = time.monotonic()
        state = stream_mod.StreamState(eng, samples, None)
        rows = []
        while state.active():
            t0 = time.monotonic()
            w = state.begin_chunk()
            t_begin = time.monotonic() - t0
            if w is None:
                rows.append((t_begin, 0.0, 0.0, -1, -1, -1, 0))
                continue
            t0 = time.monotonic()
            first, total_len = eng.prefill_with_reuse(
                w.ids, w.audio_block, w.audio_start, w.enc_seq_len, w.reused)
            t_prefill = time.monotonic() - t0
            state.note_prefill(w, total_len,  t_prefill * 1000.0)
            t0 = time.monotonic()
            chunk_tokens = []
            n_gen = eng.decode_greedy(
                first, total_len, state.max_new,
                lambda t: (chunk_tokens.append(t) or True))
            t_decode = time.monotonic() - t0
            n_raw_before = len(state.raw_tokens)
            state.finish_chunk(w, chunk_tokens, n_gen,  t_decode * 1000.0)
            reset = 1 if state.prev_signature is None else 0
            rows.append((t_begin, t_prefill, t_decode, total_len,
                         min(w.reused, total_len - 1), n_gen, reset))
        state.finalize()
        wall = time.monotonic() - t_run
        print(f"\nrun {run}: wall {wall:.1f} s = {audio_s / wall:.2f}x realtime, "
              f"{len(rows)} chunks", file=sys.stderr, flush=True)
        hdr = f"{'ck':>3} {'begin':>7} {'prefil':>7} {'decode':>7} " \
              f"{'plen':>5} {'reuse':>5} {'ngen':>4} rst"
        print(hdr, file=sys.stderr, flush=True)
        for i, (b, p, d, plen, reuse, ngen, rst) in enumerate(rows):
            print(f"{i:>3} {b*1000:7.0f} {p*1000:7.0f} {d*1000:7.0f} "
                  f"{plen:>5} {reuse:>5} {ngen:>4} {'!' if rst else ''}",
                  file=sys.stderr, flush=True)
        tb = sum(r[0] for r in rows)
        tp = sum(r[1] for r in rows)
        td = sum(r[2] for r in rows)
        print(f"totals: begin {tb:.1f} s  prefill {tp:.1f} s  decode {td:.1f} s",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
