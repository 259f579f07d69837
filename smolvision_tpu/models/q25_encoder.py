"""Qwen2.5-Omni audio tower (Conv1D stem variant).

Reference semantics: qwen25_omni_encoder.c:174-310.  Differences from the
Qwen3 AuT (qwen25_omni.h header comment):
  * Conv1D stem: k3 s1 p1 -> GELU -> k3 s2 p1 -> GELU (2x time downsample),
  * GLOBAL sinusoidal PE (not per-chunk; positions 0..T-1),
  * fixed 100-TOKEN attention windows (not mel-frame derived),
  * encoder K projection has no bias (zeros substituted at load),
  * single `proj` d_model -> output_dim,
  * learned audio_bos / audio_eos rows prepended/appended to the output.

The transformer stack itself is shared with the Qwen3 encoder
(models/qwen3_encoder.py:transformer_stack).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smolvision_tpu.config import ModelConfig
from smolvision_tpu.ops.common import gelu_tanh, layer_norm, sinusoidal_pe
from smolvision_tpu.models.qwen3_encoder import transformer_stack


def q25_conv_stem(params, mel, cfg: ModelConfig):
    """Conv1D stem + transpose + global sinusoidal PE.

    mel: [128, T] f32.  Returns [T2, d_model] f32 where T2 = (T+1)//2.
    (Static shapes: callers bucket T.)
    """
    d = cfg.enc_d_model
    x = mel[None, :, :]  # [1, 128, T] NCW
    dn = ("NCH", "OIH", "NCH")
    x = jax.lax.conv_general_dilated(
        x, params["conv1_w"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    x = gelu_tanh(x + params["conv1_b"][None, :, None])
    x = jax.lax.conv_general_dilated(
        x, params["conv2_w"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    x = gelu_tanh(x + params["conv2_b"][None, :, None])
    x = jnp.transpose(x[0], (1, 0))  # [T2, d_model]
    T2 = x.shape[0]
    pe = jnp.asarray(sinusoidal_pe(T2, d))
    return x + pe


def q25_encoder_transformer(params, x, valid_len, cfg: ModelConfig):
    """Windowed transformer + ln_post + proj.  Returns [Tcap, output_dim].

    Note: bos/eos rows are added by the caller (q25_encode in the engine)
    because they sit OUTSIDE the padded bucket layout.
    """
    h = transformer_stack(params["layers"], x, valid_len, cfg.q25_token_window,
                          cfg.enc_heads, cfg.enc_head_dim)
    h = layer_norm(h, params["ln_post_w"], params["ln_post_b"], eps=1e-5)
    wdt = params["proj_w"].dtype
    h = jnp.einsum("td,od->to", h.astype(wdt), params["proj_w"],
                   preferred_element_type=jnp.float32) + params["proj_b"]
    return h


def q25_conv_out_len(mel_frames: int) -> int:
    """Token count after the conv stem: s1 conv keeps T, s2 conv halves it
    with the C arithmetic (qwen25_omni_encoder.c:190-198)."""
    l1 = (mel_frames + 2 - 3) // 1 + 1  # == mel_frames
    return (l1 + 2 - 3) // 2 + 1
