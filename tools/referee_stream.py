#!/usr/bin/env python3
"""f64 referee for streaming-mode cross-engine divergences (VERDICT r3 #4).

docs/PARITY_C.md pins the CPU `--f32` arm byte-exact vs the reference C
binary in every mode, but the TPU bf16 arm's streaming runs diverge at some
token (0.6B @253, 1.7B @83 pre-fix) because streaming trajectories are
UNENGINEERED — no chain margins, so thin argmaxes flip under bf16-vs-f32
accumulation drift.  This tool turns the round-3 manual 1.7B diagnosis
(docs/PARITY_C.md "The --f32 KV-cache family bug") into an automated
classifier:

  1. trace both OUR arms (cpu-f32 == the C family, byte-exact-pinned; and
     tpu-bf16, the production path) through the solo streaming driver,
     recording per chunk: prompt ids, encoder span sample ranges, and the
     RAW greedy chunk tokens;
  2. find the first divergent chunk + step (identical prompt state by
     construction — all earlier tokens matched);
  3. replay THAT chunk with the float64 torch oracle (tests/oracle.py
     set_dtype(float64)): teacher-force the common token prefix, then read
     the f64 logits at the divergent step;
  4. verdict: which arm the f64 referee sides with, the true margin between
     the contested tokens, and the class —
       * benign-rounding: f64 sides with one arm by a margin << logit std
         (the other arm's flip is its family's rounding noise);
       * structural: f64 disagrees with BOTH arms, or the margin is large
         (<= that's a real bug, not noise — investigate).

Arms run as SERIAL subprocesses (CLAUDE.md: never two jax processes; the
cpu arm must force the platform via config, not env).  The judge itself is
torch + numpy only.

Usage:
  python tools/referee_stream.py --model .bench_cache/qwen3-asr-0.6b-eng \
      --wav /tmp/smolvision_parity_c/short.wav [--report]
  # internal single-arm trace (spawned by the orchestrator):
  python tools/referee_stream.py --model M --wav W \
      --trace-arm cpu-f32 --out /tmp/trace_a.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REPORT = os.path.join(REPO, "docs", "PARITY_C.md")

# above this fraction of the logit std, a flip is no longer plausible
# rounding noise (the round-3 manual case: margin 0.021 vs std 4.5 ~ 0.5%)
STRUCTURAL_MARGIN_FRAC = 0.05


# ---------------------------------------------------------------------------
# arm tracing (runs in its own subprocess per arm)
# ---------------------------------------------------------------------------


def trace_arm(model_dir: str, wav: str, arm: str, out_path: str):
    import jax

    if arm == "cpu-f32":
        # config update, NOT the env var: JAX_PLATFORMS is ignored by this
        # build (CLAUDE.md landmine — the axon plugin wins)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    f32 = arm == "cpu-f32"
    eng = Engine(model_dir, verbose=0,
                 param_dtype=jnp.float32 if f32 else jnp.bfloat16,
                 kv_dtype=jnp.float32 if f32 else jnp.bfloat16)
    eng.past_text_conditioning = True          # --stream default
    eng.token_cb = lambda piece: None
    samples = load_wav(wav)

    state = stream_mod.StreamState(eng, np.asarray(samples, np.float32), None)
    chunks = []
    while state.active():
        w = state.begin_chunk()
        if w is None or w is stream_mod.NOT_READY:
            continue
        if state.use_enc_cache:
            spans = [[int(ws), int(ws + state.enc_window_samples), int(seq)]
                     for (ws, _, seq, _) in state.enc_cache.windows]
            if w.full_end < state.audio_cursor:
                tail_seq = w.enc_seq_len - sum(s[2] for s in spans)
                spans.append([int(w.full_end), int(state.audio_cursor),
                              int(tail_seq)])
        else:
            spans = [[0, int(state.audio_cursor), int(w.enc_seq_len)]]
        rec = {"idx": state.chunk_idx,
               "ids": [int(t) for t in w.ids],
               "audio_start": int(w.audio_start),
               "enc_seq_len": int(w.enc_seq_len),
               "spans": spans,
               "reused": int(w.reused)}
        # the solo middle (stream.run_solo_chunk) with token capture
        t0 = time.monotonic() * 1000.0
        first, total_len = eng.prefill_with_reuse(
            w.ids, w.audio_block, w.audio_start, w.enc_seq_len, w.reused)
        state.note_prefill(w, total_len, time.monotonic() * 1000.0 - t0)
        t0 = time.monotonic() * 1000.0
        chunk_tokens = []
        n_gen = eng.decode_greedy(
            first, total_len, state.max_new,
            lambda t: (chunk_tokens.append(t) or True))
        rec["chunk_tokens"] = [int(t) for t in chunk_tokens]
        chunks.append(rec)
        state.finish_chunk(w, chunk_tokens, n_gen,
                           time.monotonic() * 1000.0 - t0)
    text = state.finalize()
    with open(out_path, "w") as f:
        json.dump({"arm": arm, "model": model_dir, "wav": wav,
                   "max_new": state.max_new, "chunks": chunks,
                   "final_text": text}, f)
    print(f"referee: traced {arm}: {len(chunks)} chunks -> {out_path}",
          flush=True)


# ---------------------------------------------------------------------------
# f64 judge (torch + numpy only)
# ---------------------------------------------------------------------------


def first_divergence(ta: dict, tb: dict):
    """(chunk_index_in_traces, step) of the first token disagreement, or
    None if the traces' raw chunk tokens are identical."""
    for ci, (ca, cb) in enumerate(zip(ta["chunks"], tb["chunks"])):
        if ca["ids"] != cb["ids"]:
            # cannot happen before a token divergence; treat as divergence
            # with unknown step (prompt state differs — earlier chunk counts
            # must have differed, e.g. a skipped chunk)
            return ci, -1
        if ca["chunk_tokens"] != cb["chunk_tokens"]:
            n = min(len(ca["chunk_tokens"]), len(cb["chunk_tokens"]))
            for s in range(n):
                if ca["chunk_tokens"][s] != cb["chunk_tokens"][s]:
                    return ci, s
            return ci, n
    if len(ta["chunks"]) != len(tb["chunks"]):
        return min(len(ta["chunks"]), len(tb["chunks"])), -1
    return None


def judge(trace_a: dict, trace_b: dict, model_dir: str, wav: str) -> dict:
    """trace_a: the C-family arm (cpu-f32); trace_b: tpu-bf16."""
    import numpy as np
    import torch

    import oracle as oracle_mod
    from smolvision_tpu.config import EOS_TOKEN_IDS, detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors
    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.ops.mel import log_mel

    div = first_divergence(trace_a, trace_b)
    if div is None:
        return {"divergence": None, "verdict": "identical",
                "detail": "both arms produced identical raw chunk tokens"}
    ci, step = div
    # The structural verdict must precede the chunk lookups: a chunk-COUNT
    # divergence returns ci == len(shorter trace's chunks), which would
    # IndexError below (ADVICE r4).
    if step < 0 or ci >= len(trace_a["chunks"]) or ci >= len(trace_b["chunks"]):
        return {"divergence": {"chunk": ci, "step": None},
                "verdict": "structural",
                "detail": "prompt state diverged before any token did "
                          "(chunk count / ids mismatch) — not a rounding "
                          "class, investigate"}
    ca = trace_a["chunks"][ci]
    cb = trace_b["chunks"][ci]

    tok_a = ca["chunk_tokens"][step] if step < len(ca["chunk_tokens"]) else None
    tok_b = cb["chunk_tokens"][step] if step < len(cb["chunk_tokens"]) else None

    samples = load_wav(wav)
    cfg = detect_config(model_dir)
    reader = MultiSafetensors(model_dir)
    oracle_mod.set_dtype(torch.float64)
    try:
        enc_parts = [
            oracle_mod.oracle_encoder(reader, cfg,
                                      log_mel(samples[lo:hi]))
            for (lo, hi, _seq) in ca["spans"]]
        for part, (_, _, seq) in zip(enc_parts, ca["spans"]):
            assert part.shape[0] == seq, (part.shape, seq)
        enc = torch.cat(enc_parts, 0)
        assert enc.shape[0] == ca["enc_seq_len"]

        dec = oracle_mod.OracleDecoder(reader, cfg)
        ids = ca["ids"]
        astart = ca["audio_start"]
        embeds = dec.embed[torch.tensor(ids)].clone()
        embeds[astart : astart + enc.shape[0]] = enc

        common = ca["chunk_tokens"][:step]     # identical in both arms
        agreed = 0
        forced = []
        with torch.no_grad():
            logits = dec.forward(embeds, 0)[-1]
            pos = len(ids)
            for s in range(step + 1):
                pick = int(logits.argmax())
                if s < step:
                    want = common[s]
                    if pick == want:
                        agreed += 1
                    else:
                        forced.append({"step": s, "f64": pick,
                                       "both_arms": want,
                                       "margin": float(logits[pick]
                                                       - logits[want])})
                    logits = dec.forward(dec.embed[want][None], pos)[0]
                    pos += 1
                else:
                    # the contested step
                    std = float(logits.std())
                    m_ab = (float(logits[tok_a] - logits[tok_b])
                            if tok_a is not None and tok_b is not None
                            else None)
                    sides_with = ("cpu-f32/C" if pick == tok_a else
                                  "tpu-bf16" if pick == tok_b else "neither")
                    # EOS-length divergence: one arm stopped (EOS), token
                    # absent — judge by whether f64 picks EOS
                    if tok_a is None:
                        sides_with = ("cpu-f32/C" if pick in EOS_TOKEN_IDS
                                      else "tpu-bf16")
                    if tok_b is None:
                        sides_with = ("tpu-bf16" if pick in EOS_TOKEN_IDS
                                      else "cpu-f32/C")
                    benign = (sides_with != "neither" and not forced
                              and (m_ab is None
                                   or abs(m_ab) < STRUCTURAL_MARGIN_FRAC * std))
                    return {
                        "divergence": {"chunk": ci, "step": step,
                                       "cpu_f32_token": tok_a,
                                       "tpu_bf16_token": tok_b},
                        "f64_pick": pick,
                        "f64_sides_with": sides_with,
                        "true_margin_contested": m_ab,
                        "logit_std": std,
                        "forced_pre_steps": forced,
                        "common_prefix_agreed": f"{agreed}/{step}",
                        "verdict": ("benign-rounding" if benign
                                    else "structural"),
                        "detail": (
                            f"f64 referee sides with {sides_with} at "
                            f"chunk {ci} step {step}; true margin between "
                            f"contested tokens {m_ab if m_ab is None else round(m_ab, 4)} "
                            f"(logit std {std:.2f}) — "
                            + ("the other arm's flip is its arithmetic "
                               "family's rounding noise"
                               if benign else
                               "margin/agreement outside the rounding "
                               "class, investigate")),
                    }
    finally:
        oracle_mod.set_dtype(torch.float32)
        reader.close()


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--trace-arm", choices=["cpu-f32", "tpu-bf16"])
    ap.add_argument("--out")
    ap.add_argument("--judge", nargs=2, metavar=("A_JSON", "B_JSON"),
                    help="skip tracing; judge two existing traces "
                         "(A = cpu-f32, B = tpu-bf16)")
    ap.add_argument("--report", action="store_true",
                    help=f"append the verdict to {REPORT}")
    args = ap.parse_args()

    if args.trace_arm:
        trace_arm(args.model, args.wav, args.trace_arm,
                  args.out or f"/tmp/referee_{args.trace_arm}.json")
        return

    if args.judge:
        with open(args.judge[0]) as f:
            ta = json.load(f)
        with open(args.judge[1]) as f:
            tb = json.load(f)
    else:
        # serial arm subprocesses (never two jax processes at once)
        paths = {}
        for arm in ("cpu-f32", "tpu-bf16"):
            out = f"/tmp/referee_{arm}.json"
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--model", args.model, "--wav", args.wav,
                 "--trace-arm", arm, "--out", out],
                check=True, timeout=3600)
            paths[arm] = out
        with open(paths["cpu-f32"]) as f:
            ta = json.load(f)
        with open(paths["tpu-bf16"]) as f:
            tb = json.load(f)

    verdict = judge(ta, tb, args.model, args.wav)
    print(json.dumps(verdict, indent=1))
    if args.report:
        stamp = time.strftime("%Y-%m-%d %H:%M")
        with open(REPORT, "a") as f:
            f.write(f"\n### f64 referee verdict {stamp} "
                    f"({os.path.basename(args.model)}, "
                    f"{os.path.basename(args.wav)})\n\n```json\n"
                    + json.dumps(verdict, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
