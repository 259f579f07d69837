"""Batched (data-parallel) model entry points.

Segments (-S mode) and independent streams are the natural DP unit
(SURVEY.md §2.3): each is an independent prompt with its own KV cache.  The
batch dimension is written NATIVELY into the decoder einsums
(models/qwen3_decoder.py batched_*) rather than vmapped over the
single-sequence path: a vmapped per-step cache update fails to alias in
place (XLA copies the full multi-GB cache every decode step) and a vmapped
pallas_call serializes into B kernel launches per layer.  The batch axis
shards over the "data" mesh axis; tensor-parallel weight shardings (mesh.py)
compose freely — GSPMD handles both.
"""

from __future__ import annotations

import jax.numpy as jnp

from smolvision_tpu.config import EOS_TOKEN_IDS, ModelConfig
from smolvision_tpu.models import qwen3_decoder as dec_mod

# KV cache layout [L, 2, B, KH, K, D] — see models/qwen3_decoder.py
make_batched_kv = dec_mod.make_batched_kv


def batched_prefill(params, cfg: ModelConfig, embeds, kv, rope_start=None,
                    kv_min=None, greedy: bool = True, tp: int = 1,
                    ep: bool = False):
    """Serving prefill at start_pos 0: embeds [B, Tcap, H] (left-padded: each
    row's last prompt token at Tcap-1), kv [L, 2, B, KH, K, D];
    rope_start/kv_min [B] default to zeros (no left-padding).
    Returns (tokens_or_logits [B, ...], kv')."""
    B = embeds.shape[0]
    if rope_start is None:
        rope_start = jnp.zeros((B,), jnp.int32)
    if kv_min is None:
        kv_min = jnp.zeros((B,), jnp.int32)
    return dec_mod.batched_prefill(params, cfg, embeds, kv, rope_start,
                                   kv_min, greedy=greedy, tp=tp, ep=ep)


def batched_decode_chunk(params, cfg: ModelConfig, tokens, pos, kv,
                         n_steps_cap: int, rope_offset=None, kv_min=None,
                         n_steps=None, tp: int = 1, ep: bool = False,
                         prompt_max=None, region_start=None, row_active=None):
    """Greedy-decode up to n_steps (traced, <= static n_steps_cap) tokens for
    every batch row, with on-device all-rows-EOS early exit.

    tokens [B] int32; pos is a SCALAR cache row shared by all rows (the
    left-padded layout aligns all rows' cache positions — a batch-varying
    write position lowers to a catastrophic scatter on TPU); rope position
    of row b = pos - rope_offset[b]; kv [L, 2, B, KH, K, D].
    Returns (buf [B, n_steps_cap] int32, count, last_tokens [B], kv')."""
    if rope_offset is None:
        rope_offset = jnp.zeros_like(tokens)
    if kv_min is None:
        kv_min = jnp.zeros_like(tokens)
    return dec_mod.batched_decode_chunk(params, cfg, tokens, pos, kv,
                                        n_steps_cap, rope_offset, kv_min,
                                        n_steps=n_steps, tp=tp, ep=ep,
                                        prompt_max=prompt_max,
                                        region_start=region_start,
                                        row_active=row_active)


def admit_rows(big, small, rows, G: int, src=None):
    """Copy `G` batch rows of `small` into `big` at row indices `rows[g]`
    (row axis 2 of the [L, 2, B, KH, K, D] batched-cache layout): G
    unrolled scalar-indexed dynamic_update_slice block copies — NEVER a
    batch-varying-index scatter (CLAUDE.md landmine: a vmapped DUS with
    per-row starts lowers to a ~1300 ms scatter).  `small`'s K axis may be
    shorter than `big`'s (prompt-region admit).  `src[g]` (default g)
    selects which small row feeds rows[g] — partial admission of a
    standby-prefilled wave.  Handles the QuantKV int8 cache (both leaves;
    the index tuple truncates naturally for `s`).  Shared by serving
    admission (runtime/serving.py) and the stratified multistream prefill
    (runtime/multistream._strat_jit)."""
    import jax

    from smolvision_tpu.ops.quant import QuantKV

    def leaf(b, s, row_axis=2):
        for g in range(G):
            sg = g if src is None else src[g]
            blk = jax.lax.dynamic_slice_in_dim(s, sg, 1, axis=row_axis)
            idx = ((0,) * row_axis + (rows[g],)
                   + (0,) * (b.ndim - row_axis - 1))
            b = jax.lax.dynamic_update_slice(b, blk.astype(b.dtype), idx)
        return b

    if isinstance(big, QuantKV):
        return QuantKV(leaf(big.q, small.q), leaf(big.s, small.s))
    return leaf(big, small)


def trim_eos(row) -> list:
    """Cut a decoded row at the first EOS (host helper)."""
    out = []
    for t in row:
        t = int(t)
        if t in EOS_TOKEN_IDS:
            break
        out.append(t)
    return out
