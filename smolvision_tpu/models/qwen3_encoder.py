"""Qwen3-ASR audio encoder (AuT), TPU-native formulation.

Reference semantics: qwen_asr_encoder.c:171-372, MODEL.md:85-152.

TPU design choices (vs the C code's sequential per-chunk loop):
  * the Conv2D stem runs BATCHED over chunks: all full 100-frame chunks are
    one [B, 1, 128, 100] conv; the final partial chunk (if any) is a separate
    width-specialized call (zero-padding would corrupt edge outputs because
    GELU(conv(0)+bias) != 0 in layer 2+),
  * per-chunk sinusoidal PEs (restarting at 0 each chunk) are baked in right
    after the conv_out projection,
  * windowed bidirectional attention is expressed by RESHAPING the padded
    token sequence into [n_windows, window_tokens, d] and batching attention
    over windows — the hard window boundaries (no cross-window attention)
    make the block-diagonal mask a free reshape instead of a T x T mask,
  * all per-layer weights are stacked and the transformer is one `lax.scan`.

Shapes are static: callers bucket `x` to a multiple of the window token size
and pass `valid_len`; padded rows produce zeros (guarded softmax) and are
sliced off on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import ModelConfig, conv_out_width
from smolvision_tpu.ops.common import gelu_tanh, layer_norm, sinusoidal_pe


def conv_stem(params, mel_chunks, cfg: ModelConfig):
    """Conv2D stem + conv_out projection + per-chunk sinusoidal PE.

    mel_chunks: [B, 128, w] f32 (each row one chunk of <=100 mel frames; all
    the same width w — callers batch full chunks and call again for the
    partial tail).  Returns [B, w3, d_model] f32.
    """
    B, n_mel, w = mel_chunks.shape
    # serving may transfer mel as f16 (halves tunnel upload bytes); compute
    # is f32 regardless
    x = mel_chunks.astype(jnp.float32)[:, None, :, :]  # [B, 1, 128, w]
    dn = ("NCHW", "OIHW", "NCHW")
    for wkey, bkey in (("conv1", "conv1"), ("conv2", "conv2"), ("conv3", "conv3")):
        x = jax.lax.conv_general_dilated(
            x, params[f"{wkey}_w"], window_strides=(2, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        x = gelu_tanh(x + params[f"{bkey}_b"][None, :, None, None])
    # x: [B, 480, 16, w3] -> [B, w3, 480*16] (channel-major flatten,
    # matching qwen_asr_encoder.c:262-271)
    Bc, C, F, w3 = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(Bc, w3, C * F)
    x = jnp.einsum("btf,df->btd", x.astype(params["conv_out_w"].dtype),
                   params["conv_out_w"], preferred_element_type=jnp.float32)
    pe = jnp.asarray(sinusoidal_pe(w3, cfg.enc_d_model))
    return x + pe[None, :, :]


def _windowed_attention_batched(q, k, v, kv_valid):
    """q,k,v: [W, S, H, D] (windows x tokens x heads x head_dim).
    kv_valid: [W, S] bool — False keys are masked out.
    Returns [W, S, H, D] f32.  Fully-masked query rows yield zeros."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("wthd,wshd->whts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = kv_valid[:, None, None, :]
    scores = jnp.where(mask, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask, jnp.exp(scores - m), 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    probs = e / denom
    return jnp.einsum("whts,wshd->wthd", probs, v.astype(jnp.float32))


def transformer_stack(layers_params, x, valid_len, window_tokens: int,
                      n_heads: int, head_dim: int, flash=None):
    """Shared windowed-attention transformer stack (Qwen3 AuT and Q25 tower).

    x: [Tcap, d_model] f32 with Tcap % window_tokens == 0.
    flash: None = use_pallas() backend default; False forces the fused-XLA
    window attention (the encoder-SP mesh path sets this: GSPMD cannot
    partition a pallas_call over the sharded window axis — it would
    all-gather the operands and run the kernel replicated — while the XLA
    formulation shards collective-free).
    Returns [Tcap, d_model] f32 pre-ln_post hidden states.
    """
    Tcap, d = x.shape
    assert Tcap % window_tokens == 0, (Tcap, window_tokens)
    W = Tcap // window_tokens
    S = window_tokens
    H = n_heads
    D = head_dim
    wdt = layers_params["wq"].dtype

    kv_valid = (jnp.arange(Tcap) < valid_len).reshape(W, S)
    window_lens = jnp.clip(valid_len - jnp.arange(W) * S, 0, S).astype(jnp.int32)

    from smolvision_tpu.kernels import use_pallas
    from smolvision_tpu.kernels.flash_attention import window_flash_attention

    if flash is None:
        flash = use_pallas()

    def layer(h, lp):
        xn = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"], eps=1e-5)
        xc = xn.astype(wdt)
        q = jnp.einsum("td,od->to", xc, lp["wq"], preferred_element_type=jnp.float32) + lp["bq"]
        k = jnp.einsum("td,od->to", xc, lp["wk"], preferred_element_type=jnp.float32) + lp["bk"]
        v = jnp.einsum("td,od->to", xc, lp["wv"], preferred_element_type=jnp.float32) + lp["bv"]
        q = q.reshape(W, S, H, D)
        k = k.reshape(W, S, H, D)
        v = v.reshape(W, S, H, D)
        if flash:
            attn = window_flash_attention(q, k, v, window_lens).reshape(Tcap, H * D)
        else:
            attn = _windowed_attention_batched(q, k, v, kv_valid).reshape(Tcap, H * D)
        h = h + (jnp.einsum("td,od->to", attn.astype(wdt), lp["wo"],
                            preferred_element_type=jnp.float32) + lp["bo"])
        xn = layer_norm(h, lp["ffn_ln_w"], lp["ffn_ln_b"], eps=1e-5)
        mid = gelu_tanh(jnp.einsum("td,fd->tf", xn.astype(wdt), lp["fc1"],
                                   preferred_element_type=jnp.float32) + lp["fc1_b"])
        out = jnp.einsum("tf,df->td", mid.astype(wdt), lp["fc2"],
                         preferred_element_type=jnp.float32) + lp["fc2_b"]
        return h + out, None

    h, _ = jax.lax.scan(layer, x.astype(jnp.float32), layers_params)
    return h


def encoder_transformer(params, x, valid_len, cfg: ModelConfig, window_tokens: int,
                        flash=None):
    """Transformer stack + ln_post + proj1/proj2.

    x: [Tcap, d_model] f32 with Tcap % window_tokens == 0.
    valid_len: scalar int32.
    flash: see transformer_stack (None = backend default).
    Returns [Tcap, enc_output_dim] f32 (rows >= valid_len are garbage).
    """
    wdt = params["layers"]["wq"].dtype
    h = transformer_stack(params["layers"], x, valid_len, window_tokens,
                          cfg.enc_heads, cfg.enc_head_dim, flash=flash)
    h = layer_norm(h, params["ln_post_w"], params["ln_post_b"], eps=1e-5)
    h = gelu_tanh(jnp.einsum("td,od->to", h.astype(wdt), params["proj1_w"],
                             preferred_element_type=jnp.float32) + params["proj1_b"])
    h = jnp.einsum("td,od->to", h.astype(wdt), params["proj2_w"],
                   preferred_element_type=jnp.float32) + params["proj2_b"]
    return h


def partial_chunk_tokens(w: int) -> int:
    """Encoder tokens from a partial chunk of w mel frames (C arithmetic)."""
    return conv_out_width(conv_out_width(conv_out_width(w)))


def total_encoder_tokens(mel_frames: int, cfg: ModelConfig) -> int:
    """Total encoder tokens for a mel of given length (qwen_asr_encoder.c:201-213)."""
    chunk = cfg.enc_chunk_size
    n_full = mel_frames // chunk
    rem = mel_frames % chunk
    total = n_full * cfg.tokens_per_chunk
    if rem:
        total += partial_chunk_tokens(rem)
    return total
