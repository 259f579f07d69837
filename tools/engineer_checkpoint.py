#!/usr/bin/env python3
"""Engineer the bench/parity 0.6B synthetic checkpoint so greedy ASR decode
on jfk.wav emits <asr_text> + a K-token varied stream + <|endoftext|>.

A plain random checkpoint greedy-decodes straight into EOS (or into ids the
sparse synthetic vocab cannot decode): the offline bench then never runs the
gated tokenizer/callback work, and byte-exact stdout comparison against the
reference C binary (/root/reference/qwen_asr.c:780-800 gate) is vacuous.
Deterministic patches (VERDICT r2 items #1/#8):

  1. FULL VOCAB — tools/make_tiny_model.make_vocab(full=True): every regular
     id < 151643 decodes to a unique visible "tok{id}" piece on both engines.
  2. EOS DOWNSCALE — tied embedding rows of <|endoftext|> and <|im_end|>
     scaled by EOS_SCALE so random trajectories stop terminating instantly.
  3. TOKEN-CHAIN SURGERY — for the reference clip (jfk.wav), walk the greedy
     trajectory one step at a time and at each step overwrite the next chain
     token's embedding row with  e := h * T/|h|^2  (h = final-norm hidden at
     that step, T = 2*max|logit0| + 8 fixed).  Its logit at that step is then
     T — above every natural logit (<= m0) and above every other chain row
     (T*cos(h_i,h_j) < T).  The chain is <asr_text>, CHAIN_IDS..., and
     finally <|endoftext|> (never a prompt token, so its input role is never
     exercised), giving a CONTROLLED emission length — the reference C
     engine's ASR decode cap is hardcoded 2048 (qwen_asr.c:777) with no
     flag, so uncontrolled EOS suppression would cost ~68 min per C run.

All patches are in-place row edits on model.safetensors (layout untouched):
the C engine and this framework read the identical checkpoint, and the
bf16-rounded rows are what BOTH engines see, so the f32-vs-bf16 margin is
T - max_other ~ T*(1-cos) >> rounding noise.

The probe replays the full transcribe on the clean clip (exact chain match
required) and on a -80 dB-noised clip (the bench varies inputs to defeat
tunnel memoization — the chain must survive that).

Usage:  python tools/engineer_checkpoint.py [--out DIR] [--platform cpu]
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
K_CHAIN = 40                       # text tokens emitted for jfk.wav
CHAIN_IDS = [5000 + 7 * i for i in range(K_CHAIN)]   # regular, decodable,
                                                     # never prompt tokens
# thinker-text chain: the cross-engine text parity mode decodes exactly
# these 12 ids (bounded by --max-tokens 12; no EOS target)
TEXT_PROMPT = "the English language and"
K_TEXT_CHAIN = 12
TEXT_CHAIN_IDS = [6001 + 7 * i for i in range(K_TEXT_CHAIN)]
ALL_ENGINEERED_IDS = frozenset(
    [TOKEN_ASR_TEXT, TOKEN_ENDOFTEXT] + CHAIN_IDS + TEXT_CHAIN_IDS)
DEFAULT_OUT = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
JFK = "/root/reference/samples/jfk.wav"


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


def _walk_and_patch(eng, st_path, embeds, total, targets, label):
    """Walk the greedy trajectory from the prompt and patch each target row
    with e = (T/|h|) * (h_hat + spice) so the replayed argmax chain is
    exactly `targets` (device params updated in step, rows written to disk)."""
    import jax.numpy as jnp
    import ml_dtypes

    from smolvision_tpu.runtime.engine import KV_HEADROOM

    prefill_state, step, set_row = _chain_fns(eng)
    kv = eng._ensure_kv(total + len(targets) + KV_HEADROOM)
    eng._kv = None   # kv is managed manually below (donated through the jits)

    h, logits, kv = prefill_state(eng.dec_params, embeds, jnp.int32(0),
                                  jnp.int32(total), kv)
    # T from the NATURAL logit scale: exclude rows any chain engineers, so
    # re-running on an already-patched file reproduces the same T
    lg0 = np.asarray(logits, np.float32).copy()
    lg0[list(ALL_ENGINEERED_IDS)] = 0.0
    m0 = float(np.abs(lg0).max())
    T = 2.0 * m0 + 8.0
    print(f"{label}: m0 {m0:.2f}, chain target T {T:.2f}", flush=True)

    tied = eng.dec_params["lm_head"] is eng.dec_params["embed"]
    assert tied, "0.6B decoder must be weight-tied"

    disk_rows = {}
    pos = total
    cos_log = []
    gap_log = []
    prev_h = None
    for i, tgt in enumerate(targets):
        hf = np.asarray(h, np.float32)
        if prev_h is not None:
            cos_log.append(float(hf @ prev_h
                                 / (np.linalg.norm(hf)
                                    * np.linalg.norm(prev_h) + 1e-9)))
            # margin the replay will see at this step: T vs the strongest
            # competitor among natural + already-patched rows (the target's
            # OWN row is excluded — on a re-run it is already patched to ~T)
            lg = np.asarray(logits, np.float32).copy()
            lg[tgt] = -np.inf
            gap_log.append(float(T - lg.max()))
        prev_h = hf
        hn = float(np.linalg.norm(hf))
        # Pure h-aligned rows make successive hiddens nearly parallel (the
        # residual stream copies the input: measured adjacent-cos 0.998),
        # collapsing the top-2 logit margin to ~0.2% of T — too thin for the
        # C engine's f32-vs-our-bf16 drift.  Mix in an orthogonal "spice"
        # component: the row's logit at ITS step is unchanged (r _|_ h) while
        # its input role rotates the next hidden away from h, keeping
        # cross-step cosines (and thus competitor logits) low.
        rng = np.random.default_rng(int(tgt))
        r = rng.standard_normal(hf.shape[0]).astype(np.float32)
        r -= (r @ hf) / (hf @ hf) * hf
        r /= np.linalg.norm(r)
        a = T / hn
        row = a * (hf / hn) + a * r
        row_bf = row.astype(ml_dtypes.bfloat16)
        disk_rows[tgt] = row
        new_embed = set_row(eng.dec_params["embed"], jnp.int32(tgt),
                            jnp.asarray(row_bf))
        eng.dec_params = dict(eng.dec_params)
        eng.dec_params["embed"] = new_embed
        eng.dec_params["lm_head"] = new_embed
        if i == len(targets) - 1:
            break
        h, logits, kv = step(eng.dec_params, jnp.int32(tgt),
                             jnp.int32(pos), kv)
        pos += 1
    print(f"{label}: step-hidden cosine range "
          f"[{min(cos_log):.3f}, {max(cos_log):.3f}]; "
          f"min replay margin {min(gap_log):.2f} of T {T:.2f}", flush=True)
    patch_rows(st_path, EMBED_NAME, disk_rows)
    return {"m0": m0, "T": T, "cos_min": min(cos_log),
            "cos_max": max(cos_log), "min_margin": min(gap_log)}


def engineer_chain(model_dir: str, samples: np.ndarray):
    """ASR chain on the reference clip: <asr_text> + CHAIN_IDS + EOS."""
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.engine import Engine

    st_path = os.path.join(model_dir, "model.safetensors")
    eng = Engine(model_dir)
    mel = log_mel(samples)
    audio, n_audio = eng.encode_mel(mel)
    ids, audio_start = prompt_mod.build_asr_prompt(eng.cfg, n_audio, [], [],
                                                   None)
    embeds, total = _prompt_embeds(eng, ids, audio, audio_start, n_audio)
    targets = [TOKEN_ASR_TEXT] + list(CHAIN_IDS) + [TOKEN_ENDOFTEXT]
    out = _walk_and_patch(eng, st_path, embeds, total, targets, "asr")
    del eng
    return out


def engineer_text_chain(model_dir: str, text: str = TEXT_PROMPT):
    """Thinker-TEXT chain: a 12-token deterministic greedy sequence from the
    fixed text prompt, bounded by --max-tokens (no EOS target — the
    endoftext row already belongs to the ASR chain).  Gives the cross-engine
    text parity mode fat margins: the unengineered random trajectory sits on
    ~0.3% top-2 gaps that flip under summation-order differences between
    engines (measured: our own two decode paths disagreed at step 2)."""
    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.engine import Engine

    st_path = os.path.join(model_dir, "model.safetensors")
    eng = Engine(model_dir)
    tok_ids = eng.tokenizer.encode(text)
    ids = prompt_mod.build_thinker_text_prompt(eng.cfg, tok_ids, [])
    embeds, total = _prompt_embeds(eng, ids, None, -1, 0)
    out = _walk_and_patch(eng, st_path, embeds, total, list(TEXT_CHAIN_IDS),
                          "text")
    del eng
    return out


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


def probe_text(model_dir: str):
    """Fresh-engine greedy thinker on the fixed text prompt."""
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(model_dir)
    eng.temperature = 0.0
    eng.thinker_max_tokens = K_TEXT_CHAIN
    text = eng.thinker_generate(None, TEXT_PROMPT)
    del eng
    return text


def ensure_engineered(out: str = DEFAULT_OUT, seed: int = 7,
                      rebuild: bool = False) -> dict:
    """Build + patch + probe the engineered checkpoint (idempotent: a dir
    with a passing PROBE.json is returned as-is).  Importable by bench.py."""
    from tools.make_tiny_model import build

    probe_path = os.path.join(out, "PROBE.json")
    st_path = os.path.join(out, "model.safetensors")
    if not rebuild and os.path.exists(probe_path):
        with open(probe_path) as f:
            report = json.load(f)
        if report.get("ok"):
            return report

    if rebuild or not os.path.exists(st_path):
        print("building 0.6b synthetic checkpoint (full vocab)...", flush=True)
        build("0.6b", out, seed=seed, dtype="bf16", full_vocab=True)
        for stale in (".eos_downscaled", "PROBE.json"):
            p = os.path.join(out, stale)
            if os.path.exists(p):
                os.remove(p)

    marker = os.path.join(out, ".eos_downscaled")
    if not os.path.exists(marker):
        orig = read_rows(st_path, EMBED_NAME, [TOKEN_ENDOFTEXT, TOKEN_IM_END])
        patch_rows(st_path, EMBED_NAME,
                   {TOKEN_ENDOFTEXT: orig[TOKEN_ENDOFTEXT] * EOS_SCALE,
                    TOKEN_IM_END: orig[TOKEN_IM_END] * EOS_SCALE})
        open(marker, "w").close()
        print("EOS rows downscaled", flush=True)

    samples = load_jfk()
    report = {"clip": JFK, "k_chain": K_CHAIN, "text_prompt": TEXT_PROMPT}
    report["asr_chain"] = engineer_chain(out, samples)
    report["text_chain"] = engineer_text_chain(out)

    expected = "".join(f"tok{i}" for i in CHAIN_IDS)
    ok = True
    # probe AFTER both chains are patched: the text rows must not hijack the
    # ASR trajectory (and vice versa)
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
    with open(probe_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", default=None,
                    help="cpu to force the CPU backend (default: TPU)")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    report = ensure_engineered(args.out, args.seed, args.rebuild)
    if not report.get("ok"):
        print("PROBE FAILED — chain did not replay exactly", file=sys.stderr)
        sys.exit(1)
    print("engineered checkpoint OK:", args.out, flush=True)


if __name__ == "__main__":
    main()
