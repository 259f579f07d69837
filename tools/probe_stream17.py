#!/usr/bin/env python3
"""1.7B streaming attribution + the q8 lever (VERDICT r4 Next #5).

The 1.7B streaming row is the weakest recorded win (7.24x vs C 2.54x =
2.85x; every other row beats its baseline 8-50x).  This probe answers WHY:
per-chunk stage split (encode / prefill / decode / residual host+RTT) at
1.7B vs 0.6B, then the interleaved bf16-vs-q8 A/B at 1.7B (q8 streaming
recorded ~18x at 0.6B vs 14.4 bf16 — is there a 1.7B analog?).

Stage times come from the engine's own counters (encode_ms deltas around
each chunk; note_prefill/finish_chunk wrapped to split prefill from
decode), wall per chunk from perf.stream_chunk_ms.  Async dispatch makes
per-stage numbers approximate (the landmine: block_until_ready is not a
fence over the tunnel) — but chunk WALL is honest, and the residual term
(wall - encode - prefill - decode) captures host+RTT+dispatch-gap.

Run (TPU, serial): python tools/probe_stream17.py [--reps 3] [--geom both]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIP_45S = os.path.join("/root/reference/samples",
                        "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3,
                    help="reps per block (block-cycled arms, see below)")
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--geom", default="1.7b", choices=["0.6b", "1.7b", "both"])
    args = ap.parse_args()

    import jax
    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine
    from tools.engineer_checkpoint import OUT_17, DEFAULT_OUT, \
        ensure_engineered

    log(f"backend={jax.default_backend()}")
    s45 = load_wav(CLIP_45S)
    audio_s = len(s45) / 16000.0
    rng = np.random.default_rng(31)

    geoms = ["0.6b", "1.7b"] if args.geom == "both" else [args.geom]
    dirs = {}
    for g in geoms:
        out = OUT_17 if g == "1.7b" else DEFAULT_OUT
        ensure_engineered(out, geom=g)
        dirs[g] = out

    # ---- stage-split instrumentation -----------------------------------
    chunks = []   # (prefill_ms, decode_ms, n_generated) per chunk

    orig_note = stream_mod.StreamState.note_prefill
    orig_fin = stream_mod.StreamState.finish_chunk

    def note_prefill(self, w, total_len, prefill_ms):
        chunks.append({"prefill_ms": prefill_ms, "plen": total_len,
                       "reused": min(w.reused, total_len - 1)})
        return orig_note(self, w, total_len, prefill_ms)

    def finish_chunk(self, w, chunk_tokens, n_generated, decode_ms):
        if chunks:
            chunks[-1]["decode_ms"] = decode_ms
            chunks[-1]["gen"] = n_generated
        return orig_fin(self, w, chunk_tokens, n_generated, decode_ms)

    stream_mod.StreamState.note_prefill = note_prefill
    stream_mod.StreamState.finish_chunk = finish_chunk

    def run(eng):
        chunks.clear()
        clip = (s45 + rng.normal(0, 1e-4, len(s45))).astype(np.float32)
        t0 = time.monotonic()
        stream_mod.transcribe_stream(eng, clip)
        wall = time.monotonic() - t0
        enc = eng.perf.encode_ms
        pf = sum(c.get("prefill_ms", 0.0) for c in chunks)
        dec = sum(c.get("decode_ms", 0.0) for c in chunks)
        gen = sum(c.get("gen", 0) for c in chunks)
        plen = sum(c.get("plen", 0) for c in chunks)
        reused = sum(c.get("reused", 0) for c in chunks)
        return {
            "rtf": audio_s / wall,
            "wall_s": wall,
            "n_chunks": len(chunks),
            "encode_ms": round(enc, 1),
            "prefill_ms": round(pf, 1),
            "decode_ms": round(dec, 1),
            "residual_ms": round(wall * 1000.0 - enc - pf - dec, 1),
            "gen_tokens": gen,
            "ms_per_gen_token": round(dec / max(gen, 1), 2),
            "prefill_tokens": plen,
            "prefill_reused": reused,
        }

    # Block-cycled arms: a 1.7B bf16 engine + a 1.7B q8 engine do NOT fit
    # HBM together (two full encoder+decoder uploads + streaming ladders —
    # both-resident interleaving OOMed), so each cycle builds one arm,
    # warms it, runs its reps, and frees it before the other arm loads.
    # Two cycles per arm retain coarse period pairing (block A/B/A/B).
    import gc

    summary = {}
    for g in geoms:
        res = {"bf16": [], "q8": []}
        detail = {}
        for cycle in range(args.cycles):
            for name, q8 in (("bf16", False), ("q8", True)):
                eng = Engine(dirs[g], verbose=0, q8=q8)
                eng.max_tokens = 48
                eng.segment_sec = 0.0
                eng.past_text_conditioning = True
                eng.token_cb = lambda piece: None
                t0 = time.monotonic()
                run(eng)
                log(f"warm c{cycle + 1} {g}/{name}: "
                    f"{time.monotonic() - t0:.1f} s")
                for rep in range(args.reps):
                    r = run(eng)
                    res[name].append(r["rtf"])
                    detail[name] = r
                    log(f"c{cycle + 1} rep {rep + 1} {g}/{name}: "
                        f"{r['rtf']:.2f}x "
                        f"(enc {r['encode_ms']:.0f} pf {r['prefill_ms']:.0f} "
                        f"dec {r['decode_ms']:.0f} "
                        f"resid {r['residual_ms']:.0f})")
                del eng
                gc.collect()
        summary[g] = {
            n: {"med_rtf": round(statistics.median(v), 2),
                "best_rtf": round(max(v), 2),
                "all": [round(x, 2) for x in v],
                "last_detail": detail[n]} for n, v in res.items()}

    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
