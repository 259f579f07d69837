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
                    greedy: bool = True, rope_start=None, kv_min=None):
    """embeds [B, Tcap, H]; start_pos/valid_len [B]; kv [B, L, 2, K, KH, D];
    optional rope_start/kv_min [B] for the left-padded batch layout.
    Returns (tokens_or_logits [B, ...], kv')."""
    if rope_start is None:
        rope_start = start_pos
    if kv_min is None:
        kv_min = jnp.zeros_like(start_pos)
    fn = lambda e, s, v, k, rs, km: dec_mod.prefill(
        params, cfg, e, s, v, k, greedy=greedy, rope_start=rs, kv_min=km)
    return jax.vmap(fn)(embeds, start_pos, valid_len, kv, rope_start, kv_min)


def batched_decode_chunk(params, cfg: ModelConfig, tokens, pos, kv, n_steps: int,
                         rope_offset=None, kv_min=None):
    """Greedy-decode n_steps tokens for every batch row (no early exit —
    rows that hit EOS keep decoding into the buffer; the host truncates).

    tokens [B] int32; pos is a SCALAR cache row shared by all rows (the
    left-padded layout aligns all rows' cache positions — a batch-varying
    write position lowers to a catastrophic scatter on TPU); rope position
    of row b = pos - rope_offset[b]; kv [B, ...].
    Returns (buf [B, n_steps] int32, kv')."""
    if rope_offset is None:
        rope_offset = jnp.zeros_like(tokens)
    if kv_min is None:
        kv_min = jnp.zeros_like(tokens)

    def one(tok, k, off, km):
        def body(carry, i):
            t, k_ = carry
            p = pos + i
            nxt, k_ = dec_mod.decode_step(params, cfg, t, p, k_, greedy=True,
                                          rope_start=p - off, kv_min=km)
            return (nxt, k_), nxt

        (t, k), buf = jax.lax.scan(body, (tok, k), jnp.arange(n_steps))
        return buf, k

    return jax.vmap(one)(tokens, kv, rope_offset, kv_min)


def trim_eos(row) -> list:
    """Cut a decoded row at the first EOS (host helper)."""
    out = []
    for t in row:
        t = int(t)
        if t in EOS_TOKEN_IDS:
            break
        out.append(t)
    return out
