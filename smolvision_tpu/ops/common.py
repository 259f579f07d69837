"""Core numeric ops shared by all models (jnp; fused by XLA under jit).

Parity notes vs the reference kernels (qwen_asr_kernels.c):
  * GELU is the tanh approximation with 0.7978845608... (kernels.c:937-944),
    i.e. jax.nn.gelu(approximate=True) — NOT erf GELU.
  * RMSNorm computes in f32 regardless of activation dtype (eps 1e-6 decoder).
  * LayerNorm has bias, eps 1e-5 (encoder).
  * RoPE is NeoX split-half: cos/sin of [angles, angles], rotate_half.
  * Sinusoidal PE: [sin || cos] halves with max_timescale 1e4.
All matmul callers must pass preferred_element_type=f32 (MXU accumulate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x, weight, eps: float = 1e-6):
    """RMSNorm over the last axis; f32 math, returns weight * normalized.

    Matches rms_norm (python_simple_implementation.py:223-226): the weight
    multiply happens in f32 and the result stays f32 until the caller casts.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return weight.astype(jnp.float32) * normed


def layer_norm(x, weight, bias, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)


def gelu_tanh(x):
    """Tanh-approximated GELU, matching qwen_asr_kernels.c:937-944."""
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return x * jax.nn.sigmoid(x)


def sinusoidal_pe(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """[length, channels] = [sin(pos*inv_ts) || cos(pos*inv_ts)] (host const)."""
    half = channels // 2
    log_inc = np.log(max_timescale) / (half - 1)
    inv_timescales = np.exp(-log_inc * np.arange(half, dtype=np.float64))
    scaled = np.arange(length, dtype=np.float64)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def rope_tables(positions, head_dim: int, theta: float):
    """cos/sin tables, each [*positions.shape, head_dim] (angles duplicated).
    positions may be [T] (single sequence) or [B, T] (batched)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope_neox(x, cos, sin):
    """x: [..., seq, heads, head_dim]; cos/sin: [..., seq, head_dim]."""
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[..., None, :] + rotated * sin[..., None, :]
