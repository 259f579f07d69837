#!/usr/bin/env python3
"""Engineer bench/parity 0.6B synthetic checkpoints whose greedy ASR decodes
emit deterministic, BOUNDED token chains.

A plain random checkpoint greedy-decodes straight into EOS (or into ids the
sparse synthetic vocab cannot decode): the offline bench then never runs the
gated tokenizer/callback work, and byte-exact stdout comparison against the
reference C binary (/root/reference/qwen_asr.c:780-800 gate) is vacuous.

TWO checkpoints are produced (VERDICT r2 items #1/#8):

  A. `qwen3-asr-0.6b-eng` — the bench/offline-parity checkpoint: greedy ASR
     on jfk.wav emits <asr_text> + 40 chain tokens + <|endoftext|>, plus a
     12-token thinker-text chain.  ONE trajectory owns the gate and EOS
     rows (the proven round-3 v1 design).
  B. `qwen3-asr-0.6b-eng-seg` — the segmented-parity checkpoint: each of
     jfk's `-S 5 -W 1` segments emits <asr_text> + 8 unique tokens +
     <|endoftext|>.  The gate/EOS rows are SHARED across segments and
     least-squares solved over the per-segment constraint hiddens.

Why two files: a single checkpoint carrying the 40-token full-clip chain AND
per-segment chains was tried twice and failed its probe both times.  The
greedy hidden trajectory is strongly autocorrelated (adjacent-step cosines
0.7-0.96), so any shared row with logit T at one trajectory's gate/end
hidden also fires near T at the OTHER trajectory's correlated steps; the
margin budget (T(1-cos) minus spice noise) goes negative somewhere on the
40-step chain regardless of how the spice weight trades correlation against
noise (beta=1: cos 0.96; beta=4: noise std T/8 x max-over-50-rows).  With
the chains split per-file, each checkpoint's competitor set is small enough
that every audit margin is comfortably positive.

Patch mechanics (both files):
  1. FULL VOCAB — every regular id < 151643 decodes to a unique visible
     "tok{id}" piece on both engines (make_vocab(full=True)).
  2. EOS DOWNSCALE — <|endoftext|>/<|im_end|> embedding rows scaled by 0.05
     so random trajectories stop terminating instantly.
  3. CHAIN SURGERY — walk the greedy trajectory; at each step overwrite the
     next chain token's embedding row with e := (T/|h|)(h_hat + beta*r),
     r a seeded random unit vector _|_ h (logit at its step exactly T =
     2*max|natural| + 8; the orthogonal spice rotates the next hidden away
     from the current one).  Chains end in EOS — the C engine's ASR decode
     cap is hardcoded 2048 (qwen_asr.c:777), so an unbounded trajectory
     would cost ~68 min per C-side run.
  4. AUDIT — after ALL rows are in place, replay every trajectory and
     record the realized min argmax margin (the number cross-engine
     f32-vs-bf16 drift has to beat); then end-to-end probes (offline clean
     + noised, segmented, thinker text) must reproduce the chains exactly.

All patches are in-place bf16 row edits on model.safetensors: the C engine
and this framework read the identical bytes.

Usage:  python tools/engineer_checkpoint.py [--platform cpu] [--rebuild]
        (engineers A, then B; bench imports ensure_engineered for A only)
"""

from __future__ import annotations

import argparse
import json
import mmap
import os
import struct
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from smolvision_tpu.config import (TOKEN_ASR_TEXT, TOKEN_ENDOFTEXT,
                                   TOKEN_IM_END)

EMBED_NAME = "thinker.model.embed_tokens.weight"
EOS_SCALE = 0.05
VERSION = 3           # 3: two-checkpoint design (A: v1 single-trajectory,
                      # B: segments-only with least-squares shared rows)
K_CHAIN = 40          # text tokens emitted for full jfk.wav (checkpoint A)
CHAIN_IDS = [5000 + 7 * i for i in range(K_CHAIN)]
TEXT_PROMPT = "the English language and"
K_TEXT_CHAIN = 12
TEXT_CHAIN_IDS = [6001 + 7 * i for i in range(K_TEXT_CHAIN)]
# checkpoint B: per-segment chains for `-S 5 -W 1` on jfk
SEG_SEGMENT_SEC = 5.0
SEG_SEARCH_SEC = 1.0
K_SEG_CHAIN = 8
MAX_SEGS = 8
SEG_BETA = 1.5        # spice weight for segment chains
SEG_CHAIN_LIFT = 3.0  # chain rows sit this far above the shared gate/EOS T


def seg_chain_ids(s: int):
    return [9000 + 300 * s + 7 * j for j in range(K_SEG_CHAIN)]


ALL_ENGINEERED_IDS = frozenset(
    [TOKEN_ASR_TEXT, TOKEN_ENDOFTEXT] + CHAIN_IDS + TEXT_CHAIN_IDS
    + [i for s in range(MAX_SEGS) for i in seg_chain_ids(s)])
DEFAULT_OUT = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
SEG_OUT = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng-seg")
OUT_17 = os.path.join(REPO, ".bench_cache", "qwen3-asr-1.7b-eng")
JFK = "/root/reference/samples/jfk.wav"


LM_HEAD_NAME = "thinker.lm_head.weight"


def patch_logit_rows(st_path: str, rows: dict):
    """Patch engineered rows into EVERY tensor that produces logits: the
    embedding, and — for untied geometries (q25: tie_word_embeddings false,
    a separate thinker.lm_head.weight on disk) — the lm_head too.  The
    device-side surgery (_patch_device) ties lm_head = embed, so disk must
    carry the same rows in both tensors or a fresh engine load cannot
    reproduce the engineered chain."""
    patch_rows(st_path, EMBED_NAME, rows)
    with open(st_path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf-8"))
    if LM_HEAD_NAME in header:
        patch_rows(st_path, LM_HEAD_NAME, rows)


def patch_rows(st_path: str, name: str, rows: dict):
    """Overwrite rows of a 2-D bf16 tensor in a .safetensors file in place
    (layout and header untouched)."""
    import ml_dtypes

    with open(st_path, "r+b") as f:
        mm = mmap.mmap(f.fileno(), 0)
        (header_len,) = struct.unpack("<Q", mm[:8])
        header = json.loads(mm[8 : 8 + header_len].decode("utf-8"))
        info = header[name]
        assert info["dtype"] == "BF16", info["dtype"]
        shape = info["shape"]
        begin = 8 + header_len + info["data_offsets"][0]
        row_bytes = shape[1] * 2
        for r, vec in rows.items():
            v = np.asarray(vec, dtype=np.float32).astype(ml_dtypes.bfloat16)
            assert v.shape == (shape[1],)
            off = begin + int(r) * row_bytes
            mm[off : off + row_bytes] = v.tobytes()
        mm.flush()
        mm.close()


def read_rows(st_path: str, name: str, rows):
    import ml_dtypes

    with open(st_path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", mm[:8])
        header = json.loads(mm[8 : 8 + header_len].decode("utf-8"))
        info = header[name]
        shape = info["shape"]
        begin = 8 + header_len + info["data_offsets"][0]
        out = {}
        for r in rows:
            off = begin + int(r) * shape[1] * 2
            out[r] = np.frombuffer(mm[off : off + shape[1] * 2],
                                   dtype=ml_dtypes.bfloat16).astype(np.float32)
        mm.close()
    return out


def load_jfk() -> np.ndarray:
    from smolvision_tpu.io.wav import load_wav
    return load_wav(JFK)


def _chain_fns(eng):
    """Jitted helpers: (prefill -> normed hidden+logits, one decode step ->
    normed hidden+logits, in-place embed row update)."""
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.models import qwen3_decoder as dec_mod
    from smolvision_tpu.ops.common import rms_norm

    cfg = eng.cfg

    def state_at(p, e, s, v, kv):
        hidden, kv = dec_mod.decoder_forward(p, cfg, e, s, v, kv)
        h = jax.lax.dynamic_index_in_dim(hidden, v - 1, 0, keepdims=False)
        hn = rms_norm(h, p["final_norm"], cfg.rms_norm_eps)
        from smolvision_tpu.models.qwen3_decoder import wdtype, proj
        logits = proj("h,vh->v", hn.astype(wdtype(p["lm_head"])), p["lm_head"])
        return hn, logits, kv

    def step_state(p, tok, pos, kv):
        from smolvision_tpu.models.qwen3_decoder import embed_rows
        e = embed_rows(p["embed"], tok)[None]
        return state_at(p, e, jnp.asarray(pos, jnp.int32), jnp.int32(1), kv)

    prefill_state = jax.jit(state_at, donate_argnums=(4,))
    step = jax.jit(
        lambda p, t, pos, kv: step_state(p, t, pos, kv),
        donate_argnums=(3,))
    set_row = jax.jit(lambda emb, r, v: emb.at[r].set(v),
                      donate_argnums=(0,))
    return prefill_state, step, set_row


def _prompt_embeds(eng, ids, audio, audio_start, n_audio):
    import jax.numpy as jnp

    from smolvision_tpu.runtime.buckets import bucket

    total = len(ids)
    tcap = bucket(total, 64)
    ids_arr = np.zeros(tcap, dtype=np.int32)
    ids_arr[:total] = np.asarray(ids, dtype=np.int32)
    if audio is None:
        audio = jnp.zeros((16, eng.cfg.dec_hidden), dtype=jnp.float32)
        audio_start, n_audio = -1_000_000, 0
    return eng._build_embeds(eng.dec_params, jnp.asarray(ids_arr), audio,
                             jnp.int32(audio_start), jnp.int32(n_audio)), total


def _natural_T(logits):
    """(m0, T): the natural logit scale at a step, excluding every row any
    chain engineers — so re-running on an already-patched file reproduces
    the same T."""
    lg = np.asarray(logits, np.float32).copy()
    lg[list(ALL_ENGINEERED_IDS)] = 0.0
    m0 = float(np.abs(lg).max())
    return m0, 2.0 * m0 + 8.0


def _spiced_row(hf: np.ndarray, T: float, tgt: int,
                beta: float = 1.0) -> np.ndarray:
    """Row with logit exactly T at hidden hf plus beta x an orthogonal
    seeded-random 'spice' unit vector.  Pure h-aligned rows make successive
    hiddens nearly parallel (the residual stream copies the input: measured
    adjacent-cos 0.998), collapsing margins; the spice leaves the row's
    own-step logit unchanged (r _|_ h) while rotating the next hidden away.
    beta trades correlation (down) against cross-step logit noise
    (std ~ beta*T/sqrt(H) per competitor row) — keep it ~1-2."""
    rng = np.random.default_rng(int(tgt))
    r = rng.standard_normal(hf.shape[0]).astype(np.float32)
    r -= (r @ hf) / (hf @ hf) * hf
    r /= np.linalg.norm(r)
    hn = float(np.linalg.norm(hf))
    a = T / hn
    return a * (hf / hn) + beta * a * r


def _shared_row(constraints, label: str) -> np.ndarray:
    """Shared-row (gate/EOS) solve across trajectories: min-norm e with
    e·h_i = T_i exactly (least squares via the Gram matrix, tiny ridge).
    Tame because the T_i are near-equal (no cancellation blow-up even for
    correlated hiddens); only sound when every NON-constraint step the row
    could fire at is weakly correlated with the constraint set — which is
    why it is used for the SHORT segment chains only (checkpoint B)."""
    H = np.stack([np.asarray(h, np.float32) for h, _ in constraints])
    Tv = np.asarray([t for _, t in constraints], np.float32)
    G = H @ H.T
    G += 1e-4 * float(np.trace(G) / len(Tv)) * np.eye(len(Tv),
                                                      dtype=np.float32)
    c = np.linalg.solve(G, Tv)
    e = H.T @ c
    norm = H / np.linalg.norm(H, axis=1, keepdims=True)
    xcos = norm @ norm.T
    print(f"{label}: shared row over {len(constraints)} constraints, "
          f"max cross-cos {np.abs(xcos - np.eye(len(xcos))).max():.3f}",
          flush=True)
    return e


def _patch_device(eng, set_row, tgt: int, row: np.ndarray):
    """bf16-round the row, install it on device (tied embed == lm_head)."""
    import jax.numpy as jnp
    import ml_dtypes

    row_bf = np.asarray(row, np.float32).astype(ml_dtypes.bfloat16)
    new_embed = set_row(eng.dec_params["embed"], jnp.int32(tgt),
                        jnp.asarray(row_bf))
    eng.dec_params = dict(eng.dec_params)
    eng.dec_params["embed"] = new_embed
    eng.dec_params["lm_head"] = new_embed


def _asr_prompt_state(eng, prefill_state, clip):
    """Encode clip -> ASR prompt -> prefill.  Returns (h, logits, kv, total)."""
    import jax.numpy as jnp

    from smolvision_tpu.models.qwen3_decoder import make_kv_cache
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.buckets import bucket
    from smolvision_tpu.runtime.engine import KV_HEADROOM

    audio, n_audio = eng.encode_mel(log_mel(clip))
    ids, audio_start = prompt_mod.build_asr_prompt(eng.cfg, n_audio, [], [],
                                                   None)
    embeds, total = _prompt_embeds(eng, ids, audio, audio_start, n_audio)
    kv = make_kv_cache(eng.cfg, bucket(total + K_CHAIN + KV_HEADROOM, 64),
                       eng.kv_dtype)
    h, logits, kv = prefill_state(eng.dec_params, embeds, jnp.int32(0),
                                  jnp.int32(total), kv)
    return h, logits, kv, total


def _walk_chain(eng, step, set_row, state, chain, T, label, disk_rows,
                beta=1.0):
    """From `state` = (h, logits, kv, pos) where h is the hidden that must
    select chain[0]: patch each chain row (logit T at its step), stepping
    through; returns the post-chain (h_end, logits_end) + margin stats."""
    import jax.numpy as jnp

    h, logits, kv, pos = state
    cos_log, gap_log = [], []
    prev_h = None
    for tgt in chain:
        hf = np.asarray(h, np.float32)
        if prev_h is not None:
            cos_log.append(float(hf @ prev_h
                                 / (np.linalg.norm(hf)
                                    * np.linalg.norm(prev_h) + 1e-9)))
            lg = np.asarray(logits, np.float32).copy()
            lg[tgt] = -np.inf
            gap_log.append(float(T - lg.max()))
        prev_h = hf
        row = _spiced_row(hf, T, tgt, beta)
        disk_rows[tgt] = row
        _patch_device(eng, set_row, tgt, row)
        h, logits, kv = step(eng.dec_params, jnp.int32(tgt),
                             jnp.int32(pos), kv)
        pos += 1
    print(f"{label}: step-hidden cosine range "
          f"[{min(cos_log):.3f}, {max(cos_log):.3f}]; "
          f"min walk margin {min(gap_log):.2f} of T {T:.2f}", flush=True)
    return h, logits, {"cos_min": min(cos_log), "cos_max": max(cos_log),
                       "walk_min_margin": min(gap_log), "T": T}


def _audit_trajectory(eng, prefill_state, step, clip, expect, label):
    """Replay one ASR trajectory with ALL rows in place; returns (ok,
    min_margin) where margin is the realized argmax gap at every step."""
    import jax.numpy as jnp

    h, logits, kv, total = _asr_prompt_state(eng, prefill_state, clip)
    min_gap, pos, ok = float("inf"), total, True
    for tgt in expect:
        lg = np.asarray(logits, np.float32)
        got = int(lg.argmax())
        lg2 = lg.copy()
        lg2[got] = -np.inf
        min_gap = min(min_gap, float(lg[got] - lg2.max()))
        if got != tgt:
            ok = False
            print(f"{label}: AUDIT FAIL at pos {pos}: argmax {got} != "
                  f"expected {tgt}", flush=True)
            break
        if tgt == TOKEN_ENDOFTEXT:
            break
        h, logits, kv = step(eng.dec_params, jnp.int32(tgt),
                             jnp.int32(pos), kv)
        pos += 1
    print(f"{label}: audit {'OK' if ok else 'FAIL'}, min margin "
          f"{min_gap:.2f}", flush=True)
    return ok, min_gap


def compute_segments(samples: np.ndarray):
    """The exact segment list `-S 5 -W 1 --past-text no` decodes (mirrors
    runtime/segment.transcribe_audio: silence skip OFF by default, split
    search, 0.5 s minimum pad)."""
    from smolvision_tpu.config import SAMPLE_RATE
    from smolvision_tpu.runtime.segment import split_points

    splits = split_points(samples, SEG_SEGMENT_SEC, SEG_SEARCH_SEC)
    segs = []
    min_samples = SAMPLE_RATE // 2
    for s in range(len(splits) - 1):
        seg = samples[splits[s] : splits[s + 1]]
        if len(seg) < min_samples:
            seg = np.concatenate(
                [seg, np.zeros(min_samples - len(seg), np.float32)])
        segs.append(seg)
    return segs


def engineer_full_chain(model_dir: str, samples: np.ndarray):
    """Checkpoint A surgery: ONE trajectory owns gate + 40-chain + EOS
    (every row a spiced h-aligned patch, beta=1 — the design whose margins
    survived the round-3 v1 probe)."""
    import jax.numpy as jnp  # noqa: F401  (jit helpers use it)

    from smolvision_tpu.runtime.engine import Engine

    st_path = os.path.join(model_dir, "model.safetensors")
    eng = Engine(model_dir)
    prefill_state, step, set_row = _chain_fns(eng)
    eng._kv = None
    h0, logits0, kv, total = _asr_prompt_state(eng, prefill_state, samples)
    m0, T = _natural_T(logits0)
    print(f"full: prompt {total} tokens, m0 {m0:.2f}, T {T:.2f}", flush=True)
    disk_rows = {}
    targets = [TOKEN_ASR_TEXT] + list(CHAIN_IDS) + [TOKEN_ENDOFTEXT]
    _, _, stats = _walk_chain(eng, step, set_row, (h0, logits0, kv, total),
                              targets, T, "full", disk_rows, beta=1.0)
    patch_logit_rows(st_path, disk_rows)
    ok, min_gap = _audit_trajectory(eng, prefill_state, step, samples,
                                    targets, "full")
    del eng
    return {**stats, "audit_ok": ok, "audit_min_margin": round(min_gap, 3)}


def engineer_seg_chains(model_dir: str, samples: np.ndarray):
    """Checkpoint B surgery: per-segment 8-token chains with SHARED
    gate/EOS rows least-squares solved over the per-segment constraint
    hiddens.  Chain rows sit SEG_CHAIN_LIFT above the shared T so they beat
    the shared rows' residual correlation at mid-chain steps."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    st_path = os.path.join(model_dir, "model.safetensors")
    eng = Engine(model_dir)
    prefill_state, step, set_row = _chain_fns(eng)
    eng._kv = None

    segs = compute_segments(samples)
    assert 2 <= len(segs) <= MAX_SEGS, len(segs)
    trajs = [(f"seg{s}", seg, seg_chain_ids(s)) for s, seg in enumerate(segs)]

    states, gate_cons = {}, []
    for label, clip, chain in trajs:
        h0, logits0, kv, total = _asr_prompt_state(eng, prefill_state, clip)
        m0, T = _natural_T(logits0)
        states[label] = {"kv": kv, "total": total, "T": T}
        gate_cons.append((np.asarray(h0, np.float32), T))
        print(f"{label}: prompt {total} tokens, m0 {m0:.2f}, T {T:.2f}",
              flush=True)

    disk_rows = {}
    gate_row = _shared_row(gate_cons, "gate")
    disk_rows[TOKEN_ASR_TEXT] = gate_row
    _patch_device(eng, set_row, TOKEN_ASR_TEXT, gate_row)

    report, eos_cons = {}, []
    for label, clip, chain in trajs:
        st = states[label]
        h1, lg1, kv = step(eng.dec_params, jnp.int32(TOKEN_ASR_TEXT),
                           jnp.int32(st["total"]), st["kv"])
        h_end, logits_end, stats = _walk_chain(
            eng, step, set_row, (h1, lg1, kv, st["total"] + 1), chain,
            st["T"] + SEG_CHAIN_LIFT, label, disk_rows, beta=SEG_BETA)
        m0e, Te = _natural_T(logits_end)
        eos_cons.append((np.asarray(h_end, np.float32), Te))
        report[label] = {**stats, "n_chain": len(chain)}

    eos_row = _shared_row(eos_cons, "eos")
    disk_rows[TOKEN_ENDOFTEXT] = eos_row
    _patch_device(eng, set_row, TOKEN_ENDOFTEXT, eos_row)
    patch_logit_rows(st_path, disk_rows)

    all_ok = True
    for label, clip, chain in trajs:
        expect = [TOKEN_ASR_TEXT] + list(chain) + [TOKEN_ENDOFTEXT]
        ok, min_gap = _audit_trajectory(eng, prefill_state, step, clip,
                                        expect, label)
        report[label]["audit_ok"] = ok
        report[label]["audit_min_margin"] = round(min_gap, 3)
        all_ok = all_ok and ok
    report["n_segments"] = len(segs)
    report["audit_ok"] = all_ok
    del eng
    return report


def engineer_text_chain(model_dir: str, text: str = TEXT_PROMPT):
    """Thinker-TEXT chain (checkpoint A): a 12-token deterministic greedy
    sequence from the fixed text prompt, bounded by --max-tokens (no EOS
    target — the endoftext row belongs to the ASR chain).  Gives the
    cross-engine text parity mode fat margins: the unengineered random
    trajectory sits on ~0.3% top-2 gaps that flip under summation-order
    differences between engines."""
    import jax.numpy as jnp

    from smolvision_tpu.models.qwen3_decoder import make_kv_cache
    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.buckets import bucket
    from smolvision_tpu.runtime.engine import KV_HEADROOM, Engine

    st_path = os.path.join(model_dir, "model.safetensors")
    eng = Engine(model_dir)
    prefill_state, step, set_row = _chain_fns(eng)
    eng._kv = None
    tok_ids = eng.tokenizer.encode(text)
    ids = prompt_mod.build_thinker_text_prompt(eng.cfg, tok_ids, [])
    embeds, total = _prompt_embeds(eng, ids, None, -1, 0)
    kv = make_kv_cache(eng.cfg, bucket(total + K_TEXT_CHAIN + KV_HEADROOM, 64),
                       eng.kv_dtype)
    h, logits, kv = prefill_state(eng.dec_params, embeds, jnp.int32(0),
                                  jnp.int32(total), kv)
    m0, T = _natural_T(logits)
    print(f"text: m0 {m0:.2f}, T {T:.2f}", flush=True)
    disk_rows = {}
    _, _, stats = _walk_chain(eng, step, set_row, (h, logits, kv, total),
                              list(TEXT_CHAIN_IDS), T, "text", disk_rows,
                              beta=1.0)
    patch_logit_rows(st_path, disk_rows)
    del eng
    return stats


def probe(model_dir: str, samples, max_tokens: int = 64):
    """Fresh-engine greedy transcribe; returns the raw emitted pieces."""
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(model_dir)
    eng.max_tokens = max_tokens
    toks = []
    eng.token_cb = lambda piece: toks.append(piece)
    text, n_text = eng.transcribe_segment(samples)
    del eng
    return text, n_text, toks


def probe_segmented(model_dir: str, samples) -> str:
    """Fresh-engine segmented run with the parity flags (-S 5 -W 1
    --past-text no)."""
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.segment import transcribe_audio

    eng = Engine(model_dir)
    eng.max_tokens = 64
    eng.segment_sec = SEG_SEGMENT_SEC
    eng.search_sec = SEG_SEARCH_SEC
    eng.past_text_conditioning = False
    text = transcribe_audio(eng, samples)
    del eng
    return text or ""


def probe_text(model_dir: str):
    """Fresh-engine greedy thinker on the fixed text prompt."""
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(model_dir)
    eng.temperature = 0.0
    eng.thinker_max_tokens = K_TEXT_CHAIN
    text = eng.thinker_generate(None, TEXT_PROMPT)
    del eng
    return text


def _base_build(out: str, seed: int, geom: str = "0.6b"):
    """Fresh full-vocab base + EOS downscale (shared by A and B).  The
    chain-surgery machinery is geometry-agnostic (it walks whatever greedy
    trajectory the checkpoint produces), so `geom` may name any
    make_tiny_model preset — "1.7b" engineers the second BASELINE.md model
    size (README.md:402, jfk 4.29x) for bench.py's offline_17 config."""
    from tools.make_tiny_model import build

    print(f"building {geom} synthetic checkpoint (full vocab) -> {out}",
          flush=True)
    build(geom, out, seed=seed, dtype="bf16", full_vocab=True)
    p = os.path.join(out, "PROBE.json")
    if os.path.exists(p):
        os.remove(p)
    st_path = os.path.join(out, "model.safetensors")
    orig = read_rows(st_path, EMBED_NAME, [TOKEN_ENDOFTEXT, TOKEN_IM_END])
    patch_logit_rows(st_path,
                     {TOKEN_ENDOFTEXT: orig[TOKEN_ENDOFTEXT] * EOS_SCALE,
                      TOKEN_IM_END: orig[TOKEN_IM_END] * EOS_SCALE})
    print("EOS rows downscaled", flush=True)


def _cached_report(out: str, geom: str):
    probe_path = os.path.join(out, "PROBE.json")
    if os.path.exists(probe_path):
        with open(probe_path) as f:
            report = json.load(f)
        # geom participates in the cache key: a cached checkpoint of a
        # DIFFERENT geometry at the same path must rebuild, not be
        # silently returned as "OK"
        if (report.get("ok") and report.get("version") == VERSION
                and report.get("geom") == geom):
            return report
    return None


def ensure_engineered(out: str = DEFAULT_OUT, seed: int = 7,
                      rebuild: bool = False, geom: str = "0.6b") -> dict:
    """Checkpoint A: build + full-clip chain + text chain + probes.
    Idempotent (a dir with a passing current-version PROBE.json is returned
    as-is).  Importable by bench.py."""
    if not rebuild:
        cached = _cached_report(out, geom)
        if cached is not None:
            return cached

    _base_build(out, seed, geom)
    samples = load_jfk()
    report = {"version": VERSION, "clip": JFK, "k_chain": K_CHAIN,
              "geom": geom, "text_prompt": TEXT_PROMPT}
    report["asr_chain"] = engineer_full_chain(out, samples)
    report["text_chain"] = engineer_text_chain(out)

    expected = "".join(f"tok{i}" for i in CHAIN_IDS)
    ok = bool(report["asr_chain"]["audit_ok"])
    for label, clip in (("clean", samples),
                        ("noised", samples + np.float32(1e-4)
                         * np.random.default_rng(0).standard_normal(
                             len(samples)).astype(np.float32))):
        text, n_text, toks = probe(out, clip)
        exact = (text == expected)
        report[label] = {"n_text": n_text, "exact_chain": exact,
                         "head": text[:40]}
        print(f"{label}: {n_text} text tokens, exact_chain={exact}",
              flush=True)
        ok = ok and exact and n_text == K_CHAIN
    text_expected = "".join(f"tok{i}" for i in TEXT_CHAIN_IDS)
    got_text = probe_text(out)
    text_ok = (got_text == text_expected)
    report["text"] = {"exact_chain": text_ok, "head": (got_text or "")[:40]}
    print(f"text: exact_chain={text_ok}", flush=True)
    ok = ok and text_ok
    report["ok"] = ok
    with open(os.path.join(out, "PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def ensure_engineered_seg(out: str = SEG_OUT, seed: int = 7,
                          rebuild: bool = False, geom: str = "0.6b") -> dict:
    """Checkpoint B: build + per-segment chains + segmented probe.
    `geom` names any make_tiny_model preset (the chain surgery is
    geometry-agnostic) — "1.7b" gives the cross-parity matrix its 1.7B
    segmented row."""
    if not rebuild:
        cached = _cached_report(out, geom)
        if cached is not None:
            return cached

    _base_build(out, seed, geom)
    samples = load_jfk()
    report = {"version": VERSION, "clip": JFK, "geom": geom,
              "k_seg_chain": K_SEG_CHAIN,
              "flags": f"-S {SEG_SEGMENT_SEC:g} -W {SEG_SEARCH_SEC:g} "
                       "--past-text no"}
    report["seg_chains"] = engineer_seg_chains(out, samples)

    n_segs = report["seg_chains"]["n_segments"]
    seg_expected = " ".join(
        "".join(f"tok{i}" for i in seg_chain_ids(s)) for s in range(n_segs))
    seg_text = probe_segmented(out, samples)
    seg_ok = (seg_text == seg_expected)
    report["segmented"] = {"n_segments": n_segs, "exact_chain": seg_ok,
                           "head": seg_text[:60]}
    print(f"segmented: {n_segs} segments, exact_chain={seg_ok}", flush=True)
    report["ok"] = bool(report["seg_chains"]["audit_ok"]) and seg_ok
    with open(os.path.join(out, "PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--seg-out", default=SEG_OUT)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", default=None,
                    help="cpu to force the CPU backend (default: TPU)")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--only", choices=["a", "b"], default=None,
                    help="engineer only checkpoint A (bench) or B (segments)")
    ap.add_argument("--geom", default="0.6b",
                    help="make_tiny_model preset for checkpoint A (e.g. "
                         "1.7b; pair with --out " + OUT_17 + ")")
    ap.add_argument("--seg-geom", default="0.6b",
                    help="make_tiny_model preset for checkpoint B (pair "
                         "with --seg-out .bench_cache/qwen3-asr-1.7b-eng-seg)")
    ap.add_argument("--base-only", action="store_true",
                    help="build + EOS-downscale only, NO chain surgery — "
                         "for thinker-mode parity checkpoints where chains "
                         "are unneeded (q25-7b) or unreachable (MoE: "
                         "step-hidden cosines 0.95+ leave the shared-row "
                         "least-squares ill-conditioned, docs/PARITY_C.md)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.base_only:
        _base_build(args.out, args.seed, args.geom)
        print(f"base checkpoint (no chains): {args.out}", flush=True)
        return

    ok = True
    if args.only != "b":
        report = ensure_engineered(args.out, args.seed, args.rebuild,
                                   geom=args.geom)
        ok = ok and bool(report.get("ok"))
        print(f"checkpoint A {'OK' if report.get('ok') else 'FAILED'}: "
              f"{args.out}", flush=True)
    if args.only != "a":
        report = ensure_engineered_seg(args.seg_out, args.seed, args.rebuild,
                                       geom=args.seg_geom)
        ok = ok and bool(report.get("ok"))
        print(f"checkpoint B {'OK' if report.get('ok') else 'FAILED'}: "
              f"{args.seg_out}", flush=True)
    if not ok:
        print("PROBE FAILED — chain did not replay exactly", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
