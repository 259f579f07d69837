"""Batched (data-parallel) model entry points.

Segments (-S mode) and independent streams are the natural DP unit
(SURVEY.md §2.3): each is an independent prompt with its own KV cache, so we
vmap the single-sequence decoder over a batch axis and shard that axis over
the "data" mesh axis.  Tensor-parallel weight shardings (mesh.py) compose
freely — GSPMD handles both.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from smolvision_tpu.config import EOS_TOKEN_IDS, ModelConfig
from smolvision_tpu.models import qwen3_decoder as dec_mod


def make_batched_kv(cfg: ModelConfig, batch: int, kv_cap: int, dtype=jnp.bfloat16):
    return jnp.zeros(
        (batch, cfg.dec_layers, 2, kv_cap, cfg.dec_kv_heads, cfg.dec_head_dim),
        dtype=dtype)


def batched_prefill(params, cfg: ModelConfig, embeds, start_pos, valid_len, kv,
                    greedy: bool = True):
    """embeds [B, Tcap, H]; start_pos/valid_len [B]; kv [B, L, 2, K, KH, D].
    Returns (tokens_or_logits [B, ...], kv')."""
    fn = lambda e, s, v, k: dec_mod.prefill(params, cfg, e, s, v, k, greedy=greedy)
    return jax.vmap(fn)(embeds, start_pos, valid_len, kv)


def batched_decode_chunk(params, cfg: ModelConfig, tokens, pos, kv, n_steps: int):
    """Greedy-decode n_steps tokens for every batch row (no early exit —
    rows that hit EOS keep decoding into the buffer; the host truncates).

    tokens [B] int32, pos [B] int32, kv [B, ...].
    Returns (buf [B, n_steps] int32, kv')."""
    def one(tok, p, k):
        def body(carry, _):
            t, p_, k_ = carry
            nxt, k_ = dec_mod.decode_step(params, cfg, t, p_, k_, greedy=True)
            return (nxt, p_ + 1, k_), nxt

        (t, p_, k), buf = jax.lax.scan(body, (tok, p, k), None, length=n_steps)
        return buf, k

    return jax.vmap(one)(tokens, pos, kv)


def trim_eos(row) -> list:
    """Cut a decoded row at the first EOS (host helper)."""
    out = []
    for t in row:
        t = int(t)
        if t in EOS_TOKEN_IDS:
            break
        out.append(t)
    return out
