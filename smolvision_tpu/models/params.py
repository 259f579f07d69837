"""Weight loading: mmap'd safetensors -> stacked device pytrees.

Design (TPU-first, inverting qwen_asr_{encoder,decoder}.c):
  * weights stay bf16 end-to-end (no host f32 copies — the MXU consumes bf16
    natively); norms/biases are tiny and kept f32,
  * per-layer weights are STACKED along a leading layer axis so the whole
    transformer runs as one `lax.scan` — one compiled layer body instead of
    N unrolled layers (fast compiles, identical math),
  * tied lm_head reuses the embedding array (no duplicate HBM).

Tensor names follow MODEL.md:285-330 (prefix thinker.audio_tower /
thinker.model) and qwen25_omni_{encoder,decoder}.c for the Q25 family.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import ModelConfig

ENC_PREFIX = "thinker.audio_tower"
DEC_PREFIX = "thinker.model"


def _put(arr: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(arr).astype(dtype)


def _stack(reader, template: str, n: int, dtype) -> jnp.ndarray:
    return _put(np.stack([np.asarray(reader.get(template.format(i=i))) for i in range(n)]), dtype)


def load_qwen3_encoder(reader, cfg: ModelConfig, param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    p = ENC_PREFIX
    f32 = jnp.float32
    L = cfg.enc_layers
    layers = {
        "attn_ln_w": _stack(reader, p + ".layers.{i}.self_attn_layer_norm.weight", L, f32),
        "attn_ln_b": _stack(reader, p + ".layers.{i}.self_attn_layer_norm.bias", L, f32),
        "wq": _stack(reader, p + ".layers.{i}.self_attn.q_proj.weight", L, param_dtype),
        "bq": _stack(reader, p + ".layers.{i}.self_attn.q_proj.bias", L, f32),
        "wk": _stack(reader, p + ".layers.{i}.self_attn.k_proj.weight", L, param_dtype),
        "bk": _stack(reader, p + ".layers.{i}.self_attn.k_proj.bias", L, f32),
        "wv": _stack(reader, p + ".layers.{i}.self_attn.v_proj.weight", L, param_dtype),
        "bv": _stack(reader, p + ".layers.{i}.self_attn.v_proj.bias", L, f32),
        "wo": _stack(reader, p + ".layers.{i}.self_attn.out_proj.weight", L, param_dtype),
        "bo": _stack(reader, p + ".layers.{i}.self_attn.out_proj.bias", L, f32),
        "ffn_ln_w": _stack(reader, p + ".layers.{i}.final_layer_norm.weight", L, f32),
        "ffn_ln_b": _stack(reader, p + ".layers.{i}.final_layer_norm.bias", L, f32),
        "fc1": _stack(reader, p + ".layers.{i}.fc1.weight", L, param_dtype),
        "fc1_b": _stack(reader, p + ".layers.{i}.fc1.bias", L, f32),
        "fc2": _stack(reader, p + ".layers.{i}.fc2.weight", L, param_dtype),
        "fc2_b": _stack(reader, p + ".layers.{i}.fc2.bias", L, f32),
    }
    return {
        "conv1_w": _put(np.asarray(reader.get(p + ".conv2d1.weight")), f32),
        "conv1_b": _put(np.asarray(reader.get(p + ".conv2d1.bias")), f32),
        "conv2_w": _put(np.asarray(reader.get(p + ".conv2d2.weight")), f32),
        "conv2_b": _put(np.asarray(reader.get(p + ".conv2d2.bias")), f32),
        "conv3_w": _put(np.asarray(reader.get(p + ".conv2d3.weight")), f32),
        "conv3_b": _put(np.asarray(reader.get(p + ".conv2d3.bias")), f32),
        "conv_out_w": _put(np.asarray(reader.get(p + ".conv_out.weight")), param_dtype),
        "layers": layers,
        "ln_post_w": _put(np.asarray(reader.get(p + ".ln_post.weight")), f32),
        "ln_post_b": _put(np.asarray(reader.get(p + ".ln_post.bias")), f32),
        "proj1_w": _put(np.asarray(reader.get(p + ".proj1.weight")), param_dtype),
        "proj1_b": _put(np.asarray(reader.get(p + ".proj1.bias")), f32),
        "proj2_w": _put(np.asarray(reader.get(p + ".proj2.weight")), param_dtype),
        "proj2_b": _put(np.asarray(reader.get(p + ".proj2.bias")), f32),
    }


def load_q25_encoder(reader, cfg: ModelConfig, param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Qwen2.5-Omni audio tower: Conv1D stem, K has no bias, single proj,
    learned audio_bos_eos rows (qwen25_omni_encoder.c)."""
    p = ENC_PREFIX
    f32 = jnp.float32
    L = cfg.enc_layers
    d = cfg.enc_d_model
    layers = {
        "attn_ln_w": _stack(reader, p + ".layers.{i}.self_attn_layer_norm.weight", L, f32),
        "attn_ln_b": _stack(reader, p + ".layers.{i}.self_attn_layer_norm.bias", L, f32),
        "wq": _stack(reader, p + ".layers.{i}.self_attn.q_proj.weight", L, param_dtype),
        "bq": _stack(reader, p + ".layers.{i}.self_attn.q_proj.bias", L, f32),
        "wk": _stack(reader, p + ".layers.{i}.self_attn.k_proj.weight", L, param_dtype),
        "bk": jnp.zeros((L, d), dtype=f32),  # K projection has NO bias
        "wv": _stack(reader, p + ".layers.{i}.self_attn.v_proj.weight", L, param_dtype),
        "bv": _stack(reader, p + ".layers.{i}.self_attn.v_proj.bias", L, f32),
        "wo": _stack(reader, p + ".layers.{i}.self_attn.out_proj.weight", L, param_dtype),
        "bo": _stack(reader, p + ".layers.{i}.self_attn.out_proj.bias", L, f32),
        "ffn_ln_w": _stack(reader, p + ".layers.{i}.final_layer_norm.weight", L, f32),
        "ffn_ln_b": _stack(reader, p + ".layers.{i}.final_layer_norm.bias", L, f32),
        "fc1": _stack(reader, p + ".layers.{i}.fc1.weight", L, param_dtype),
        "fc1_b": _stack(reader, p + ".layers.{i}.fc1.bias", L, f32),
        "fc2": _stack(reader, p + ".layers.{i}.fc2.weight", L, param_dtype),
        "fc2_b": _stack(reader, p + ".layers.{i}.fc2.bias", L, f32),
    }
    return {
        "conv1_w": _put(np.asarray(reader.get(p + ".conv1.weight")), f32),
        "conv1_b": _put(np.asarray(reader.get(p + ".conv1.bias")), f32),
        "conv2_w": _put(np.asarray(reader.get(p + ".conv2.weight")), f32),
        "conv2_b": _put(np.asarray(reader.get(p + ".conv2.bias")), f32),
        "layers": layers,
        "ln_post_w": _put(np.asarray(reader.get(p + ".ln_post.weight")), f32),
        "ln_post_b": _put(np.asarray(reader.get(p + ".ln_post.bias")), f32),
        "proj_w": _put(np.asarray(reader.get(p + ".proj.weight")), param_dtype),
        "proj_b": _put(np.asarray(reader.get(p + ".proj.bias")), f32),
        "audio_bos_eos": _put(np.asarray(reader.get(p + ".audio_bos_eos_token.weight")), f32),
    }


def load_decoder(reader, cfg: ModelConfig, param_dtype=jnp.bfloat16,
                 experts_on_host: bool = False) -> Dict[str, Any]:
    """Qwen3 / Q25 decoder weights (shared layout; optional biases / qk norms
    are None when the family lacks them).

    experts_on_host: MoE only — leave e_gate/e_up/e_down on the host (the
    caller builds a models/moe_offload.HostExpertStore over the same reader);
    only the router stays resident.  Plan B of docs/MOE_30B_PLAN.md."""
    p = DEC_PREFIX
    f32 = jnp.float32
    L = cfg.dec_layers

    # Q/K/V are fused into ONE output-stacked weight per layer (the TPU
    # analog of the reference's single fused qkv dispatch,
    # qwen_asr_kernels.c:434-460): one big matvec beats three small ones on
    # HBM utilization and per-op overhead.
    def _qkv(i):
        return np.concatenate([
            np.asarray(reader.get(f"{p}.layers.{i}.self_attn.q_proj.weight")),
            np.asarray(reader.get(f"{p}.layers.{i}.self_attn.k_proj.weight")),
            np.asarray(reader.get(f"{p}.layers.{i}.self_attn.v_proj.weight")),
        ], axis=0)

    layers: Dict[str, Any] = {
        "input_ln": _stack(reader, p + ".layers.{i}.input_layernorm.weight", L, f32),
        "post_ln": _stack(reader, p + ".layers.{i}.post_attention_layernorm.weight", L, f32),
        "wqkv": _put(np.stack([_qkv(i) for i in range(L)]), param_dtype),
        "wo": _stack(reader, p + ".layers.{i}.self_attn.o_proj.weight", L, param_dtype),
    }
    if cfg.dec_qkv_bias:
        layers["bqkv"] = _put(np.stack([
            np.concatenate([
                np.asarray(reader.get(f"{p}.layers.{i}.self_attn.q_proj.bias")),
                np.asarray(reader.get(f"{p}.layers.{i}.self_attn.k_proj.bias")),
                np.asarray(reader.get(f"{p}.layers.{i}.self_attn.v_proj.bias")),
            ]) for i in range(L)
        ]), f32)
    else:
        layers["bqkv"] = None
    if cfg.dec_qk_norm:
        layers["q_norm"] = _stack(reader, p + ".layers.{i}.self_attn.q_norm.weight", L, f32)
        layers["k_norm"] = _stack(reader, p + ".layers.{i}.self_attn.k_norm.weight", L, f32)
    else:
        layers["q_norm"] = layers["k_norm"] = None

    if cfg.is_moe:
        # Per-layer expert presence is resolved from tensor names: a layer
        # is MoE iff its router tensor exists.  This is a repo EXTENSION of
        # the reference's all-or-nothing cfg->is_moe dispatch (its layer
        # loop gates on the global flag, qwen_asr_decoder.c:91-125) to
        # decoder_sparse_step > 1 checkpoints that interleave dense FFN
        # layers between MoE layers.
        is_moe_l = [reader.has(f"{p}.layers.{i}.mlp.gate.weight")
                    for i in range(L)]
        mixed = not all(is_moe_l)
        # mixed + experts_on_host composes: MoE layers stream experts from
        # the host store while the dense interleave weights below stay
        # resident (models/moe_offload.offload_forward dispatches per layer
        # on the host-side moe flag)
        E = cfg.num_experts
        H = cfg.dec_hidden
        MI = cfg.moe_intermediate

        def _router(i):
            if is_moe_l[i]:
                return np.asarray(reader.get(f"{p}.layers.{i}.mlp.gate.weight"))
            return np.zeros((E, H), np.float32)

        def _expert(i, which, shape):
            if is_moe_l[i]:
                return np.stack([
                    np.asarray(reader.get(
                        f"{p}.layers.{i}.mlp.experts.{e}.{which}.weight"))
                    for e in range(E)])
            return np.zeros((E,) + shape, np.float32)

        layers["router"] = _put(np.stack([_router(i) for i in range(L)]), f32)
        if experts_on_host:
            # Plan B: experts stay as host mmap views (HostExpertStore)
            layers["e_gate"] = layers["e_up"] = layers["e_down"] = None
        else:
            layers["e_gate"] = _put(
                np.stack([_expert(i, "gate_proj", (MI, H)) for i in range(L)]),
                param_dtype)
            layers["e_up"] = _put(
                np.stack([_expert(i, "up_proj", (MI, H)) for i in range(L)]),
                param_dtype)
            layers["e_down"] = _put(
                np.stack([_expert(i, "down_proj", (H, MI)) for i in range(L)]),
                param_dtype)
        if mixed:
            # dense interleave: real FFN weights on dense layers, zero blocks
            # on MoE layers; the scan dispatches per layer on moe_mask
            inter = cfg.dec_intermediate

            def _gu(i):
                if is_moe_l[i]:
                    return np.zeros((2 * inter, H), np.float32)
                return np.concatenate([
                    np.asarray(reader.get(f"{p}.layers.{i}.mlp.gate_proj.weight")),
                    np.asarray(reader.get(f"{p}.layers.{i}.mlp.up_proj.weight")),
                ], axis=0)

            def _down(i):
                if is_moe_l[i]:
                    return np.zeros((H, inter), np.float32)
                return np.asarray(reader.get(f"{p}.layers.{i}.mlp.down_proj.weight"))

            layers["w_gate_up"] = _put(np.stack([_gu(i) for i in range(L)]),
                                       param_dtype)
            layers["w_down"] = _put(np.stack([_down(i) for i in range(L)]),
                                    param_dtype)
            layers["moe_mask"] = _put(
                np.asarray(is_moe_l, np.bool_), jnp.bool_)
        else:
            layers["w_gate_up"] = layers["w_down"] = None
            layers["moe_mask"] = None
    else:
        # gate+up fused the same way (reference fuses them interleaved at
        # load, qwen_asr_decoder.c:140-152; we stack [gate; up] blocks).
        layers["w_gate_up"] = _put(np.stack([
            np.concatenate([
                np.asarray(reader.get(f"{p}.layers.{i}.mlp.gate_proj.weight")),
                np.asarray(reader.get(f"{p}.layers.{i}.mlp.up_proj.weight")),
            ], axis=0) for i in range(L)
        ]), param_dtype)
        layers["w_down"] = _stack(reader, p + ".layers.{i}.mlp.down_proj.weight", L, param_dtype)
        layers["router"] = layers["e_gate"] = layers["e_up"] = layers["e_down"] = None
        layers["moe_mask"] = None

    embed = _put(np.asarray(reader.get(p + ".embed_tokens.weight")), param_dtype)
    if cfg.tied_embeddings:
        lm_head = embed  # same device buffer
    else:
        lm_head = _put(np.asarray(reader.get("thinker.lm_head.weight")), param_dtype)

    return {
        "embed": embed,
        "layers": layers,
        "final_norm": _put(np.asarray(reader.get(p + ".norm.weight")), f32),
        "lm_head": lm_head,
    }


def quantize_decoder(params: Dict[str, Any], experts: bool = True) -> Dict[str, Any]:
    """Opt-in (--q8) int8 quantization of the decoder's big matrices.

    Quantizes wqkv/wo/w_gate_up/w_down, embed/lm_head (shared when tied —
    ONE int8 copy serves both the gather and the matvec) and, when
    `experts`, the MoE expert stacks.  Norms, biases and the router stay
    f32; the KV cache is untouched.  See ops/quant.py for the numerics.
    """
    from smolvision_tpu.ops.quant import quantize_weight

    out = dict(params)
    layers = dict(params["layers"])
    for k in ("wqkv", "wo", "w_gate_up", "w_down"):
        if layers.get(k) is not None:
            layers[k] = quantize_weight(layers[k])
    if experts:
        for k in ("e_gate", "e_up", "e_down"):
            if layers.get(k) is not None:
                layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    tied = params["lm_head"] is params["embed"]
    out["embed"] = quantize_weight(params["embed"])
    out["lm_head"] = out["embed"] if tied else quantize_weight(params["lm_head"])
    return out
