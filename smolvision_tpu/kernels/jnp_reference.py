"""Reference attention implementations in plain jnp.

These pin the semantics for the Pallas kernels and run everywhere (CPU/TPU).
Shapes use the convention: T=query len, K=key len, H=query heads,
KH=kv heads, D=head dim.  All softmax math is f32.

Reference semantics: qwen_asr_kernels.c:1054-1192 (windowed bidirectional +
causal GQA with online softmax, scale=1/sqrt(D)).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_softmax(scores, mask):
    scores = jnp.where(mask, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    # Guard fully-masked rows (padding): exp(-inf - -inf) would be NaN.
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def windowed_attention(q, k, v, window_ids):
    """Bidirectional attention restricted to equal window ids.

    q,k,v: [T, H, D]; window_ids: [T] int32 (pad rows get unique negative ids
    so they only attend themselves and never produce NaN).
    Returns [T, H, D] f32.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("thd,shd->hts", qf, kf) * scale      # [H, T, T]
    mask = (window_ids[:, None] == window_ids[None, :])[None, :, :]
    probs = _masked_softmax(scores, mask)
    return jnp.einsum("hts,shd->thd", probs, vf)


def causal_attention(q, k, v, q_positions, kv_valid_len):
    """Causal GQA attention over a (possibly padded) KV buffer.

    q: [T, H, D] at absolute positions q_positions [T].
    k,v: [K, KH, D] where row i holds absolute position i (KV-cache layout);
    rows >= kv_valid_len are invalid.
    Returns [T, H, D] f32.
    """
    T, H, D = q.shape
    K, KH, _ = k.shape
    G = H // KH
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.astype(jnp.float32).reshape(T, KH, G, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("tkgd,skd->kgts", qf, kf) * scale    # [KH, G, T, K]
    kv_pos = jnp.arange(K)
    mask = (kv_pos[None, :] <= q_positions[:, None]) & (kv_pos[None, :] < kv_valid_len)
    probs = _masked_softmax(scores, mask[None, None, :, :])
    out = jnp.einsum("kgts,skd->tkgd", probs, vf)
    return out.reshape(T, H, D)


def decode_attention(q, k, v, kv_len):
    """Single-position causal GQA attention (decode step).

    q: [H, D]; k,v: [K, KH, D]; kv_len: valid rows (the current position is
    row kv_len-1).  Returns [H, D] f32.
    """
    out = causal_attention(
        q[None], k, v, jnp.full((1,), kv_len - 1, dtype=jnp.int32), kv_len
    )
    return out[0]
