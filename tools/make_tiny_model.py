#!/usr/bin/env python3
"""Generate a tiny random checkpoint in the reference weight layout.

No real Qwen weights are downloadable in this environment, so tests and
benchmarks use synthetic checkpoints with the exact tensor names / shapes /
dtypes of the real ones (MODEL.md:285-330).  `--preset tiny` makes a
seconds-fast model for unit tests; `--preset 0.6b` makes the real 0.6B
geometry (random values) for performance benchmarking.

Also writes config.json (thinker layout), vocab.json + merges.txt (synthetic
byte-level BPE covering all 256 bytes + a few merges).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smolvision_tpu.io.safetensors import write_safetensors, BF16
from smolvision_tpu.text.tokenizer import bytes_to_unicode

PRESETS = {
    # (enc_d, enc_L, enc_heads, enc_ffn, enc_out, conv_hidden,
    #  dec_h, dec_L, dec_heads, dec_kv, head_dim, dec_inter, vocab)
    "tiny": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128, enc_out=48,
                 conv_hidden=16, dec_h=48, dec_L=2, dec_heads=4, dec_kv=2,
                 head_dim=16, dec_inter=96, vocab=151936),
    # GQA-edge geometries for the oracle parity sweep (tests/test_model_parity):
    # MHA (kv == heads) and maximum grouping (kv == 1) exercise the repeat/
    # reshape layout logic the default 2:1 ratio cannot distinguish
    "tiny-mha": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128, enc_out=48,
                     conv_hidden=16, dec_h=48, dec_L=2, dec_heads=4, dec_kv=4,
                     head_dim=16, dec_inter=96, vocab=151936),
    "tiny-gqa4": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128, enc_out=48,
                      conv_hidden=16, dec_h=48, dec_L=2, dec_heads=4, dec_kv=1,
                      head_dim=32, dec_inter=96, vocab=151936),
    "tiny-moe": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128, enc_out=48,
                     conv_hidden=16, dec_h=48, dec_L=2, dec_heads=4, dec_kv=2,
                     head_dim=16, dec_inter=96, vocab=151936,
                     moe=dict(num_experts=4, top_k=2, moe_inter=32)),
    "tiny-q25": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128, enc_out=48,
                     conv_hidden=0, dec_h=48, dec_L=2, dec_heads=4, dec_kv=2,
                     head_dim=16, dec_inter=96, vocab=152064, q25=True),
    # FULL Qwen2.5-Omni-7B geometry — the dims the reference hardcodes
    # (qwen25_omni.c:197-215); needed for cross-engine parity because the
    # C engine ignores config.json.  ~16.5 GB bf16: CPU-f32 parity only
    # (exceeds one v5e's HBM).
    "q25-7b": dict(enc_d=1280, enc_L=32, enc_heads=20, enc_ffn=5120,
                   enc_out=3584, conv_hidden=0, dec_h=3584, dec_L=28,
                   dec_heads=28, dec_kv=4, head_dim=128, dec_inter=18944,
                   vocab=152064, q25=True),
    # decoder_sparse_step=2: layers 1 and 3 are MoE, layers 0 and 2 dense
    # (HF semantics: layer i is MoE iff (i+1) % sparse_step == 0)
    "tiny-moe-mixed": dict(enc_d=64, enc_L=2, enc_heads=2, enc_ffn=128,
                           enc_out=48, conv_hidden=16, dec_h=48, dec_L=4,
                           dec_heads=4, dec_kv=2, head_dim=16, dec_inter=96,
                           vocab=151936,
                           moe=dict(num_experts=4, top_k=2, moe_inter=32,
                                    sparse_step=2)),
    "0.6b": dict(enc_d=896, enc_L=18, enc_heads=14, enc_ffn=3584, enc_out=1024,
                 conv_hidden=480, dec_h=1024, dec_L=28, dec_heads=16, dec_kv=8,
                 head_dim=128, dec_inter=3072, vocab=151936),
    # MoE geometry for cross-engine parity vs the C binary.  The reference
    # hardcodes MoE as the 30B variant only (qwen_asr.c:152-171: 48 layers,
    # 128 experts — a ~58 GB checkpoint whose f32 copy exceeds this host's
    # RAM), so tools/cross_parity_c.py patches ONLY the detect_config
    # constant block of its /tmp source copy to this geometry: full 0.6B
    # encoder (every encoder code path at real scale) + a 12-layer MoE
    # decoder with real 0.6B attention dims and the real moe_intermediate
    # (768), 16 experts top-8 (the C engine's topk_idx[8] caps top_k at 8,
    # qwen_asr_decoder.c:387).
    "moe-c": dict(enc_d=896, enc_L=18, enc_heads=14, enc_ffn=3584,
                  enc_out=1024, conv_hidden=480, dec_h=1024, dec_L=12,
                  dec_heads=16, dec_kv=8, head_dim=128, dec_inter=768,
                  vocab=151936,
                  moe=dict(num_experts=16, top_k=8, moe_inter=768)),
    "1.7b": dict(enc_d=1024, enc_L=24, enc_heads=16, enc_ffn=4096, enc_out=2048,
                 conv_hidden=480, dec_h=2048, dec_L=28, dec_heads=16, dec_kv=8,
                 head_dim=128, dec_inter=6144, vocab=151936),
    # Dense geometry for the input-space parity fuzz vs the C binary
    # (tools/fuzz_parity_c.py).  Full 480-channel conv stem because the C
    # engine hardcodes QWEN_CONV_HIDDEN (qwen_asr.h:39) — only the branch
    # constants of detect_config are patchable — but a small encoder stack
    # and a 4-layer decoder so one C-side thinker run on a ~2 s clip takes
    # seconds, not minutes.  Full vocab keeps QWEN_VOCAB_SIZE honest and
    # (with --full-vocab) makes stdout equality a token-trace check.
    "fuzz-c": dict(enc_d=256, enc_L=4, enc_heads=4, enc_ffn=512, enc_out=256,
                   conv_hidden=480, dec_h=256, dec_L=4, dec_heads=4, dec_kv=2,
                   head_dim=64, dec_inter=512, vocab=151936),
    # MoE twin of fuzz-c: input-space fuzz over the router/top-8/expert
    # accumulate path (near-tie router logits across varied audio are the
    # numeric surface the fixed-input MoE parity rows can't sweep)
    "fuzz-moe-c": dict(enc_d=256, enc_L=4, enc_heads=4, enc_ffn=512,
                       enc_out=256, conv_hidden=480, dec_h=256, dec_L=4,
                       dec_heads=4, dec_kv=2, head_dim=64, dec_inter=256,
                       vocab=151936,
                       moe=dict(num_experts=16, top_k=8, moe_inter=256)),
    # Qwen2.5-Omni twin of fuzz-c: the q25 conv stem is config-sized
    # (conv1 128->d_model, conv2 d_model->d_model, qwen25_omni_encoder.c:
    # 186-201 — no hardcoded-480 constraint like Qwen3), so the whole
    # geometry shrinks; the C binary gets its q25_load constant block
    # (qwen25_omni.c:198-215) regenerated by cross_parity_c.
    # _q25_geometry_patch.  Exercises the q25-ONLY surfaces the dense fuzz
    # can't: stride-2 conv token arithmetic, flat 100-token windows,
    # global sinusoidal PE, bos/eos embedding rows, biased QKV, no
    # qk-norm, separate lm_head, the q25 thinker prompt layout.
    "fuzz-q25-c": dict(enc_d=256, enc_L=4, enc_heads=4, enc_ffn=512,
                       enc_out=256, conv_hidden=0, dec_h=256, dec_L=4,
                       dec_heads=4, dec_kv=2, head_dim=64, dec_inter=512,
                       vocab=152064, q25=True),
}


def _rand(rng, *shape, std=0.05):
    return (rng.standard_normal(shape) * std).astype(np.float32)


def make_vocab(model_dir: str, full: bool = False):
    """Synthetic byte-level BPE vocab.

    `full` fills every regular id < 151643 with a unique piece ("tok{id}")
    so ANY decoded id maps to distinct visible text — this is what makes
    byte-exact stdout comparison against the reference C binary a real
    token-trace check on random checkpoints (emitted ids land anywhere in
    the vocab; with the sparse vocab they all decode to "" on both sides
    and the comparison is vacuous).  Special ids (>= 151643) stay absent,
    like the real vocab.json (specials are added tokens there)."""
    b2u = bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    merges = []
    next_id = 256
    for pair in [("t", "h"), ("th", "e"), ("Ġ", "a"), ("a", "n"), ("an", "d"),
                 ("i", "n"), ("o", "n"), ("e", "r"), ("Ġ", "the"),
                 ("l", "a"), ("la", "n"), ("lan", "g"), ("g", "u"),
                 ("lang", "u"), ("langu", "a"), ("langua", "g"),
                 ("languag", "e"), ("Ġ", "E"), ("ĠE", "n"), ("ĠEn", "g"),
                 ("ĠEng", "l"), ("ĠEngl", "i"), ("ĠEngli", "s"),
                 ("ĠEnglis", "h")]:
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = next_id
            next_id += 1
        merges.append(f"{pair[0]} {pair[1]}")
    if full:
        # no merge ever produces a "tok<digits>" piece, so encode() is
        # unaffected; decode() gains full id coverage below the specials
        for i in range(next_id, 151643):
            vocab[f"tok{i}"] = i
    with open(os.path.join(model_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(model_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges) + "\n")


def build(preset: str, model_dir: str, seed: int = 0, dtype: str = "bf16",
          full_vocab: bool = False):
    p = PRESETS[preset]
    rng = np.random.default_rng(seed)
    os.makedirs(model_dir, exist_ok=True)
    t = {}
    ep = "thinker.audio_tower"
    dp = "thinker.model"
    out_dtype = BF16 if dtype == "bf16" else np.float32

    is_q25 = p.get("q25", False)
    enc_d, enc_L, enc_ffn, enc_out = p["enc_d"], p["enc_L"], p["enc_ffn"], p["enc_out"]

    if is_q25:
        t[f"{ep}.conv1.weight"] = _rand(rng, enc_d, 128, 3)
        t[f"{ep}.conv1.bias"] = _rand(rng, enc_d)
        t[f"{ep}.conv2.weight"] = _rand(rng, enc_d, enc_d, 3)
        t[f"{ep}.conv2.bias"] = _rand(rng, enc_d)
        t[f"{ep}.proj.weight"] = _rand(rng, enc_out, enc_d)
        t[f"{ep}.proj.bias"] = _rand(rng, enc_out)
        t[f"{ep}.audio_bos_eos_token.weight"] = _rand(rng, 2, enc_out)
    else:
        ch = p["conv_hidden"]
        t[f"{ep}.conv2d1.weight"] = _rand(rng, ch, 1, 3, 3, std=0.2)
        t[f"{ep}.conv2d1.bias"] = _rand(rng, ch)
        t[f"{ep}.conv2d2.weight"] = _rand(rng, ch, ch, 3, 3)
        t[f"{ep}.conv2d2.bias"] = _rand(rng, ch)
        t[f"{ep}.conv2d3.weight"] = _rand(rng, ch, ch, 3, 3)
        t[f"{ep}.conv2d3.bias"] = _rand(rng, ch)
        t[f"{ep}.conv_out.weight"] = _rand(rng, enc_d, ch * 16)
        t[f"{ep}.proj1.weight"] = _rand(rng, enc_d, enc_d)
        t[f"{ep}.proj1.bias"] = _rand(rng, enc_d)
        t[f"{ep}.proj2.weight"] = _rand(rng, enc_out, enc_d)
        t[f"{ep}.proj2.bias"] = _rand(rng, enc_out)

    for i in range(enc_L):
        lp = f"{ep}.layers.{i}"
        t[f"{lp}.self_attn_layer_norm.weight"] = np.ones(enc_d, np.float32) + _rand(rng, enc_d, std=0.02)
        t[f"{lp}.self_attn_layer_norm.bias"] = _rand(rng, enc_d, std=0.02)
        t[f"{lp}.self_attn.q_proj.weight"] = _rand(rng, enc_d, enc_d)
        t[f"{lp}.self_attn.q_proj.bias"] = _rand(rng, enc_d)
        t[f"{lp}.self_attn.k_proj.weight"] = _rand(rng, enc_d, enc_d)
        if not is_q25:
            t[f"{lp}.self_attn.k_proj.bias"] = _rand(rng, enc_d)
        t[f"{lp}.self_attn.v_proj.weight"] = _rand(rng, enc_d, enc_d)
        t[f"{lp}.self_attn.v_proj.bias"] = _rand(rng, enc_d)
        t[f"{lp}.self_attn.out_proj.weight"] = _rand(rng, enc_d, enc_d)
        t[f"{lp}.self_attn.out_proj.bias"] = _rand(rng, enc_d)
        t[f"{lp}.final_layer_norm.weight"] = np.ones(enc_d, np.float32) + _rand(rng, enc_d, std=0.02)
        t[f"{lp}.final_layer_norm.bias"] = _rand(rng, enc_d, std=0.02)
        t[f"{lp}.fc1.weight"] = _rand(rng, enc_ffn, enc_d)
        t[f"{lp}.fc1.bias"] = _rand(rng, enc_ffn)
        t[f"{lp}.fc2.weight"] = _rand(rng, enc_d, enc_ffn)
        t[f"{lp}.fc2.bias"] = _rand(rng, enc_d)

    t[f"{ep}.ln_post.weight"] = np.ones(enc_d, np.float32)
    t[f"{ep}.ln_post.bias"] = np.zeros(enc_d, np.float32)

    dec_h, dec_L = p["dec_h"], p["dec_L"]
    heads, kv_heads, hd = p["dec_heads"], p["dec_kv"], p["head_dim"]
    inter, vocab = p["dec_inter"], p["vocab"]
    moe = p.get("moe")

    t[f"{dp}.embed_tokens.weight"] = _rand(rng, vocab, dec_h, std=0.1)
    t[f"{dp}.norm.weight"] = np.ones(dec_h, np.float32)
    if is_q25:
        t["thinker.lm_head.weight"] = _rand(rng, vocab, dec_h, std=0.1)

    for i in range(dec_L):
        lp = f"{dp}.layers.{i}"
        t[f"{lp}.input_layernorm.weight"] = np.ones(dec_h, np.float32) + _rand(rng, dec_h, std=0.02)
        t[f"{lp}.post_attention_layernorm.weight"] = np.ones(dec_h, np.float32) + _rand(rng, dec_h, std=0.02)
        t[f"{lp}.self_attn.q_proj.weight"] = _rand(rng, heads * hd, dec_h)
        t[f"{lp}.self_attn.k_proj.weight"] = _rand(rng, kv_heads * hd, dec_h)
        t[f"{lp}.self_attn.v_proj.weight"] = _rand(rng, kv_heads * hd, dec_h)
        t[f"{lp}.self_attn.o_proj.weight"] = _rand(rng, dec_h, heads * hd)
        if is_q25:
            t[f"{lp}.self_attn.q_proj.bias"] = _rand(rng, heads * hd)
            t[f"{lp}.self_attn.k_proj.bias"] = _rand(rng, kv_heads * hd)
            t[f"{lp}.self_attn.v_proj.bias"] = _rand(rng, kv_heads * hd)
        else:
            t[f"{lp}.self_attn.q_norm.weight"] = np.ones(hd, np.float32) + _rand(rng, hd, std=0.02)
            t[f"{lp}.self_attn.k_norm.weight"] = np.ones(hd, np.float32) + _rand(rng, hd, std=0.02)
        if moe and (i + 1) % moe.get("sparse_step", 1) == 0:
            E, mi = moe["num_experts"], moe["moe_inter"]
            t[f"{lp}.mlp.gate.weight"] = _rand(rng, E, dec_h)
            for e in range(E):
                t[f"{lp}.mlp.experts.{e}.gate_proj.weight"] = _rand(rng, mi, dec_h)
                t[f"{lp}.mlp.experts.{e}.up_proj.weight"] = _rand(rng, mi, dec_h)
                t[f"{lp}.mlp.experts.{e}.down_proj.weight"] = _rand(rng, dec_h, mi)
        else:
            t[f"{lp}.mlp.gate_proj.weight"] = _rand(rng, inter, dec_h)
            t[f"{lp}.mlp.up_proj.weight"] = _rand(rng, inter, dec_h)
            t[f"{lp}.mlp.down_proj.weight"] = _rand(rng, dec_h, inter)

    # norms/biases stay f32 like real checkpoints keep them bf16; we emit the
    # matmul weights in the requested dtype and small vectors in f32
    big = {k: v.astype(out_dtype) if v.ndim >= 2 and "norm" not in k else v
           for k, v in t.items()}
    write_safetensors(os.path.join(model_dir, "model.safetensors"), big)

    config = {
        "model_type": "qwen2_5_omni" if is_q25 else f"qwen3_asr_{preset}",
        "thinker_config": {
            "audio_config": {
                "d_model": enc_d,
                "encoder_layers": enc_L,
                "encoder_attention_heads": p["enc_heads"],
                "encoder_ffn_dim": enc_ffn,
                "output_dim": enc_out,
                "num_mel_bins": 128,
                "max_source_positions": 1500,
                "n_window": 50,
                "n_window_infer": 800,
                "downsample_hidden_size": p["conv_hidden"],
            },
            "text_config": {
                "hidden_size": dec_h,
                "num_hidden_layers": dec_L,
                "num_attention_heads": heads,
                "num_key_value_heads": kv_heads,
                "head_dim": hd,
                "intermediate_size": inter,
                "rms_norm_eps": 1e-6,
                "rope_theta": 1e6,
                "rope_scaling": {"mrope_section": [24, 20, 20]},
                "vocab_size": vocab,
                "tie_word_embeddings": not is_q25,
                "attention_bias": bool(is_q25),
                "qk_norm": not is_q25,
                **({"num_experts": moe["num_experts"],
                    "num_experts_per_tok": moe["top_k"],
                    "moe_intermediate_size": moe["moe_inter"],
                    "norm_topk_prob": True,
                    "decoder_sparse_step": moe.get("sparse_step", 1)}
                   if moe else {}),
            },
            "audio_start_token_id": 151647 if is_q25 else 151669,
            "audio_end_token_id": 151648 if is_q25 else 151670,
            "audio_token_id": 151646 if is_q25 else 151676,
        },
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=1)
    make_vocab(model_dir, full=full_vocab)
    return model_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--full-vocab", action="store_true")
    args = ap.parse_args()
    build(args.preset, args.out, args.seed, args.dtype,
          full_vocab=args.full_vocab)
    print(args.out)
