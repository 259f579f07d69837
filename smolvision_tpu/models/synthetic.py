"""Synthetic parameter pytrees (no checkpoint on disk).

Used by __graft_entry__.py, bench fallbacks, and sharding dry-runs: builds
the exact pytree structure of models/params.py loaders from a ModelConfig,
filled with zeros or seeded random values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import ModelConfig


def _mk(rng, shape, dtype, std=0.05):
    if rng is None:
        return jnp.zeros(shape, dtype=dtype)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * std).astype(dtype)


def _ones(shape):
    return jnp.ones(shape, dtype=jnp.float32)


def synthetic_encoder(cfg: ModelConfig, param_dtype=jnp.bfloat16, seed=None):
    rng = None if seed is None else np.random.default_rng(seed)
    d = cfg.enc_d_model
    L = cfg.enc_layers
    ffn = cfg.enc_ffn_dim
    ch = cfg.enc_conv_hidden
    f32 = jnp.float32
    layers = {
        "attn_ln_w": _ones((L, d)), "attn_ln_b": _mk(rng, (L, d), f32),
        "wq": _mk(rng, (L, d, d), param_dtype), "bq": _mk(rng, (L, d), f32),
        "wk": _mk(rng, (L, d, d), param_dtype), "bk": _mk(rng, (L, d), f32),
        "wv": _mk(rng, (L, d, d), param_dtype), "bv": _mk(rng, (L, d), f32),
        "wo": _mk(rng, (L, d, d), param_dtype), "bo": _mk(rng, (L, d), f32),
        "ffn_ln_w": _ones((L, d)), "ffn_ln_b": _mk(rng, (L, d), f32),
        "fc1": _mk(rng, (L, ffn, d), param_dtype), "fc1_b": _mk(rng, (L, ffn), f32),
        "fc2": _mk(rng, (L, d, ffn), param_dtype), "fc2_b": _mk(rng, (L, d), f32),
    }
    return {
        "conv1_w": _mk(rng, (ch, 1, 3, 3), f32, std=0.2), "conv1_b": _mk(rng, (ch,), f32),
        "conv2_w": _mk(rng, (ch, ch, 3, 3), f32), "conv2_b": _mk(rng, (ch,), f32),
        "conv3_w": _mk(rng, (ch, ch, 3, 3), f32), "conv3_b": _mk(rng, (ch,), f32),
        "conv_out_w": _mk(rng, (d, ch * 16), param_dtype),
        "layers": layers,
        "ln_post_w": _ones((d,)), "ln_post_b": jnp.zeros((d,), f32),
        "proj1_w": _mk(rng, (d, d), param_dtype), "proj1_b": _mk(rng, (d,), f32),
        "proj2_w": _mk(rng, (cfg.enc_output_dim, d), param_dtype),
        "proj2_b": _mk(rng, (cfg.enc_output_dim,), f32),
    }


def synthetic_decoder(cfg: ModelConfig, param_dtype=jnp.bfloat16, seed=None):
    rng = None if seed is None else np.random.default_rng(seed + 1)
    H = cfg.dec_hidden
    L = cfg.dec_layers
    Hq = cfg.dec_heads * cfg.dec_head_dim
    Hkv = cfg.dec_kv_heads * cfg.dec_head_dim
    I = cfg.dec_intermediate
    V = cfg.vocab_size
    f32 = jnp.float32
    layers = {
        "input_ln": _ones((L, H)),
        "post_ln": _ones((L, H)),
        "wqkv": _mk(rng, (L, Hq + 2 * Hkv, H), param_dtype),
        "wo": _mk(rng, (L, H, Hq), param_dtype),
        "bqkv": _mk(rng, (L, Hq + 2 * Hkv), f32) if cfg.dec_qkv_bias else None,
        "q_norm": _ones((L, cfg.dec_head_dim)) if cfg.dec_qk_norm else None,
        "k_norm": _ones((L, cfg.dec_head_dim)) if cfg.dec_qk_norm else None,
    }
    if cfg.is_moe:
        E = cfg.num_experts
        MI = cfg.moe_intermediate
        layers["router"] = _mk(rng, (L, E, H), f32)
        layers["e_gate"] = _mk(rng, (L, E, MI, H), param_dtype)
        layers["e_up"] = _mk(rng, (L, E, MI, H), param_dtype)
        layers["e_down"] = _mk(rng, (L, E, H, MI), param_dtype)
        if cfg.decoder_sparse_step > 1:
            # mixed dense/MoE interleave (models/params.py loader layout):
            # both weight sets stacked + the scanned per-layer mask; layer i
            # is MoE iff (i+1) % sparse_step == 0
            layers["w_gate_up"] = _mk(rng, (L, 2 * I, H), param_dtype)
            layers["w_down"] = _mk(rng, (L, H, I), param_dtype)
            layers["moe_mask"] = jnp.asarray(
                [(i + 1) % cfg.decoder_sparse_step == 0 for i in range(L)],
                dtype=jnp.bool_)
        else:
            layers["w_gate_up"] = layers["w_down"] = None
            layers["moe_mask"] = None
    else:
        layers["w_gate_up"] = _mk(rng, (L, 2 * I, H), param_dtype)
        layers["w_down"] = _mk(rng, (L, H, I), param_dtype)
        layers["router"] = layers["e_gate"] = layers["e_up"] = layers["e_down"] = None
        layers["moe_mask"] = None

    embed = _mk(rng, (V, H), param_dtype, std=0.1)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": _ones((H,)),
        "lm_head": embed if cfg.tied_embeddings else _mk(rng, (V, H), param_dtype, std=0.1),
    }
