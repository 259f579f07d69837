"""Qwen3 / Qwen2.5-Omni LLM decoder — static-shape prefill + decode step.

Reference semantics: qwen_asr_decoder.c (dense + MoE), qwen25_omni_decoder.c
(biased QKV, no Q/K norm, separate lm_head), MODEL.md:156-227.

TPU design (inverting the CPU design):
  * ONE static KV cache [L, 2, Kcap, KH, D] in bf16, updated in place with
    `dynamic_update_slice` (donated by the jitted callers — no copies),
  * prefill processes a whole padded bucket [Tcap, H] and returns the logits
    of the LAST VALID row, so "prefill all-but-last + 1 decode step"
    (qwen_asr.c:761-769) collapses into one fused graph,
  * decode step is a single jitted graph: embed gather -> 28-layer scan ->
    final norm -> lm_head -> (argmax | logits); only an int32 crosses the
    host boundary per token in greedy mode,
  * the layer stack is a `lax.scan` over stacked weights,
  * activations: residual stream f32, matmul inputs cast to the bf16 weight
    dtype, MXU accumulation f32 (matches the C engine's bf16-weights /
    f32-activations numerics).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from smolvision_tpu.config import ModelConfig
from smolvision_tpu.ops.common import apply_rope_neox, rms_norm, rope_tables, silu
from smolvision_tpu.ops.quant import (QuantKV, QuantW, embed_rows, kv_dus,
                                      kv_zeros, proj, qtake,
                                      quantize_kv_rows, wdtype)


# Kcap at which the Pallas decode-attention kernel (live-context block
# clamping, but ~25 us launch overhead x layers) overtakes the fused-XLA
# two-part attention (reads the full Kcap).  Measured on v5e with the 0.6B
# geometry: jnp wins by ~0.2 ms/step at Kcap 512; the kernel's flat cost
# only pays off once whole-cache reads dominate (tools/profile_decode2.py).
FLASH_DECODE_MIN_KCAP = 4096


def make_kv_cache(cfg: ModelConfig, kv_cap: int, dtype=jnp.bfloat16):
    return jnp.zeros((cfg.dec_layers, 2, kv_cap, cfg.dec_kv_heads, cfg.dec_head_dim), dtype=dtype)


def build_embeds(params, ids, audio, audio_start, audio_len):
    """Token embeddings with audio rows spliced in.

    ids: [Tcap] int32 (prompt token ids, padded arbitrarily beyond valid_len).
    audio: [Acap, H] f32 encoder output (rows >= audio_len are garbage).
    Row i takes audio[i - audio_start] when audio_start <= i <
    audio_start+audio_len, else embed[ids[i]].  This is the "replacement"
    splice of MODEL.md:336-349 as one gather + select.
    """
    emb = embed_rows(params["embed"], ids)  # [Tcap, H] f32
    Tcap = ids.shape[0]
    pos = jnp.arange(Tcap)
    rel = pos - audio_start
    in_audio = (rel >= 0) & (rel < audio_len)
    audio_rows = audio[jnp.clip(rel, 0, audio.shape[0] - 1)].astype(jnp.float32)
    return jnp.where(in_audio[:, None], audio_rows, emb)


# Capacity dispatch kicks in for prefill with at least this many experts
# (below it the dense one-hot einsum reads less than dispatch overhead
# would save); capacity C = ceil(T*K/E * factor) bounds each expert's
# queue — standard MoE capacity semantics: (token, expert) pairs past an
# expert's capacity are dropped (their router weight contributes zero).
# Balanced loads never drop at factor 2; tests pin equality vs the dense
# path in that regime.
MOE_DISPATCH_MIN_EXPERTS = 16
MOE_CAPACITY_FACTOR = 2.0

# Tcap at which the batched Pallas causal kernel overtakes fused-XLA
# two-part attention for serving prefill (score-tensor bytes vs ~25 us
# launch overhead; measured crossover on v5e, tools/profile_serving.py)
BATCHED_FLASH_MIN_T = 1024

# Block width at which the batched CACHE flash kernel (delta prefill:
# block vs cache + itself) overtakes the fused-XLA two-part formulation.
# Measured (tools/probe_delta_prefill.py, B16/Kcap 832, 0.6B geometry):
# W=512: kernel 200 ms vs XLA 244 (matmul bound 89); W=256: 104 vs 115;
# W=128: 69 vs 66 (tie) -> crossover at 256.  The win comes from whole-
# segment VMEM tiles (one cache pass + one block pass, 832-wide MXU rhs);
# a 64-granular blocked walk measured 40% SLOWER than XLA.
BATCHED_DELTA_FLASH_MIN_T = 256


def _moe_capacity_dispatch(xc, lp, top_idx, top_w, cfg: ModelConfig, valid):
    """Scatter tokens into per-expert queues and run each expert over ONE
    contiguous block (the TPU shape of 'sort tokens by expert': ragged
    sorting is a scatter with per-expert ranks under XLA's static shapes).

    xc: [T, H] in the expert weight dtype; top_idx/top_w: [T, K];
    valid: [T] bool — pad/garbage rows get NO queue rank (they neither
    consume capacity nor receive output), so left-padded batches can't
    crowd real tokens out of an expert's queue.

    Returns (out [T, H] f32, n_dropped int32): n_dropped counts VALID
    (token, expert) pairs past capacity — the caller falls back to the
    exact dense path whenever it is nonzero, so capacity overflow is
    never a silent parity divergence (reference computes every selected
    expert exactly, qwen_asr_decoder.c:362-451).
    """
    import numpy as _np

    T, K = top_idx.shape
    E = cfg.num_experts
    H = xc.shape[-1]
    C = min(T, int(_np.ceil(T * K / E * MOE_CAPACITY_FACTOR)))

    flat_e = top_idx.reshape(-1)                              # [TK]
    vflat = jnp.repeat(valid, K)                              # [TK]
    oh = jax.nn.one_hot(flat_e, E, dtype=jnp.int32) * vflat[:, None]
    pos = jnp.sum(jnp.cumsum(oh, axis=0) * oh, axis=-1) - 1   # rank; -1 invalid
    keep = (pos >= 0) & (pos < C)
    n_dropped = jnp.sum((pos >= C).astype(jnp.int32))
    scat_pos = jnp.where(keep, pos, C)                        # C = drop slot
    tok_of = jnp.repeat(jnp.arange(T), K)

    disp = jnp.zeros((E, C, H), xc.dtype).at[flat_e, scat_pos].add(
        xc[tok_of], mode="drop")
    wdt = wdtype(lp["e_gate"])

    def _emm(eq, x, w):
        # capacity-dispatch einsums put the scale axes [E, O] around a
        # middle C axis, so trailing-broadcast proj() does not apply
        if isinstance(w, QuantW):
            y = jnp.einsum(eq, x.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y * w.s[:, None, :]
        return jnp.einsum(eq, x, w, preferred_element_type=jnp.float32)

    gate = _emm("ech,eih->eci", disp, lp["e_gate"])
    up = _emm("ech,eih->eci", disp, lp["e_up"])
    act = (silu(gate) * up).astype(wdt)
    down = _emm("eci,ehi->ech", act, lp["e_down"])            # [E, C, H] f32
    gathered = down[flat_e, jnp.minimum(scat_pos, C - 1)]     # [TK, H]
    gathered = jnp.where(keep[:, None], gathered, 0.0)
    out = jnp.sum(gathered.reshape(T, K, H) * top_w[..., None], axis=1)
    return out, n_dropped


def moe_apply_gathered(xc, g_w, u_w, d_w, top_w, wdt):
    """Per-token gathered expert SwiGLU mix: xc [T, H], expert blocks
    [T, K, MI, H] / [T, K, H, MI], router weights top_w [T, K] -> [T, H] f32.
    Shared by the resident T<=4 decode gather path and the host-offload
    engine (models/moe_offload.py), which passes host-fetched blocks."""
    gate = proj("th,tkih->tki", xc, g_w)
    up = proj("th,tkih->tki", xc, u_w)
    act = (silu(gate) * up).astype(wdt)
    down = proj("tki,tkhi->tkh", act, d_w)
    return jnp.einsum("tk,tkh->th", top_w, down)


def _moe_dense(xc, lp, top_idx, top_w, cfg: ModelConfig):
    """Exact dense one-hot routing: every expert computed once over the whole
    block — bandwidth-optimal when T >= E/K, and the exact fallback when
    capacity dispatch would drop."""
    E = cfg.num_experts
    wdt = wdtype(lp["e_gate"])
    route = jnp.sum(jax.nn.one_hot(top_idx, E, dtype=jnp.float32) * top_w[..., None], axis=1)  # [T, E]
    gate = proj("th,eih->tei", xc, lp["e_gate"])
    up = proj("th,eih->tei", xc, lp["e_up"])
    act = (silu(gate) * up).astype(wdt)
    down = proj("tei,ehi->teh", act, lp["e_down"])
    return jnp.einsum("te,teh->th", route, down)


def _moe_ffn(x, lp, cfg: ModelConfig, valid=None, ep: bool = False):
    """MoE FFN: dense router -> top-k -> softmax -> expert SwiGLU mix.

    Matches moe_forward_single (qwen_asr_decoder.c:362-451) / the python spec
    (_moe_forward): softmax over the top-k router logits, optional
    norm_topk_prob renormalization.
    x: [T, H] f32; valid: optional [T] bool (pad rows — only the capacity
    dispatch path has cross-token contention, so it alone consumes it).
    ep: static flag for EXPERT-PARALLEL execution (expert axis sharded on a
    mesh): decode then routes through the dense one-hot formulation, which
    GSPMD lowers to owner-compute — every shard runs ITS experts over the
    [T, H] activations and the weighted sum psums [T, H] over ICI (~16 KB)
    instead of gathering ~37 MB of remote expert blocks per layer
    (docs/MOE_30B_PLAN.md Plan A).  Identical math either way.
    """
    T = x.shape[0]
    E = cfg.num_experts
    K = cfg.num_experts_per_tok
    scores = jnp.einsum("th,eh->te", x, lp["router"], preferred_element_type=jnp.float32)
    top_vals, top_idx = jax.lax.top_k(scores, K)                 # [T, K]
    top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)
    if cfg.norm_topk_prob:
        top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)

    wdt = wdtype(lp["e_gate"])
    xc = x.astype(wdt)

    if T <= 4 and not ep:
        # Single-chip decode path: GATHER only the selected experts' weights
        # — the dense one-hot path below reads all E experts (~16x the bytes
        # at top-8 of 128).  Gather cost: T*K expert blocks per matrix.
        # (Under EP sharding the gather crosses shards; ep=True uses the
        # dense owner-compute formulation instead.)
        g_w = qtake(lp["e_gate"], top_idx)               # [T, K, MI, H]
        u_w = qtake(lp["e_up"], top_idx)
        d_w = qtake(lp["e_down"], top_idx)               # [T, K, H, MI]
        return moe_apply_gathered(xc, g_w, u_w, d_w, top_w, wdt)

    if E >= MOE_DISPATCH_MIN_EXPERTS:
        # Prefill with many experts (the 30B path: E=128, K=8): capacity
        # dispatch — tokens scatter into per-expert queues [E, C, H] and
        # each expert runs ONE [C, H] block through its SwiGLU.  FLOPs and
        # expert-weight reads scale with E*C ~ T*K*cf instead of the dense
        # path's T*E (16x less at top-8 of 128, cf=2).  If unbalanced
        # routing would overflow any queue, fall back to the exact dense
        # path via lax.cond — token parity is never silently broken.
        if valid is None:
            valid = jnp.ones((T,), bool)
        out, n_dropped = _moe_capacity_dispatch(xc, lp, top_idx, top_w, cfg, valid)
        return jax.lax.cond(
            n_dropped > 0,
            lambda: _moe_dense(xc, lp, top_idx, top_w, cfg),
            lambda: out)

    # Prefill with few experts: dense one-hot routing einsum.
    return _moe_dense(xc, lp, top_idx, top_w, cfg)


def _split_qkv(qkv, tp, q_dim, kv_dim, H, KH, D):
    """Undo the (optionally per-rank-interleaved) QKV output fusion.

    With tp == 1 the fused axis is [q; k; v] (load-time layout).  With
    tp > 1 the loader interleaved it per tensor-parallel rank —
    [q_0; k_0; v_0; q_1; k_1; v_1; ...] — so that sharding the fused axis
    on the "model" mesh axis gives every rank complete heads (the TP
    analog of the reference's fused qkv, qwen_asr_kernels.c:434-460).
    The reshape-based split below is shard-LOCAL under GSPMD (it splits
    the sharded axis with the sharded factor major) and restores the
    original head order exactly, so tp is purely a layout choice.

    qkv: [..., q_dim + 2*kv_dim].  Returns q [..., H, D], k/v [..., KH, D].
    """
    lead = qkv.shape[:-1]
    if tp == 1:
        q = qkv[..., :q_dim].reshape(*lead, H, D)
        k = qkv[..., q_dim : q_dim + kv_dim].reshape(*lead, KH, D)
        v = qkv[..., q_dim + kv_dim :].reshape(*lead, KH, D)
        return q, k, v
    per = (q_dim + 2 * kv_dim) // tp
    qp, kp = q_dim // tp, kv_dim // tp
    r = qkv.reshape(*lead, tp, per)
    q = r[..., :qp].reshape(*lead, H, D)
    k = r[..., qp : qp + kp].reshape(*lead, KH, D)
    v = r[..., qp + kp :].reshape(*lead, KH, D)
    return q, k, v


def _split_gate_up(gate_up, tp):
    """Undo the (optionally per-rank-interleaved) gate/up output fusion.
    gate_up: [..., 2I].  Returns (gate [..., I], up [..., I]) in original
    channel order — rank r's block is [gate_r; up_r], and gate_r is the
    contiguous chunk r of the intermediate axis, so the merge is exact."""
    I = gate_up.shape[-1] // 2
    if tp == 1:
        return gate_up[..., :I], gate_up[..., I:]
    lead = gate_up.shape[:-1]
    Ip = I // tp
    r = gate_up.reshape(*lead, tp, 2 * Ip)
    return r[..., :Ip].reshape(*lead, I), r[..., Ip:].reshape(*lead, I)


def _attention_two_part(q, k_new, v_new, k_cache, v_cache, start_pos,
                        cfg: ModelConfig, kv_min=0):
    """Causal GQA attention, split into (a) the immutable cache prefix
    [0, start_pos) and (b) the fresh in-block rows, merged by online softmax.

    This keeps the KV cache READ-ONLY inside the layer scan: the fresh rows
    are emitted as tiny scan outputs and written back with ONE
    dynamic_update_slice per forward call, instead of rewriting the whole
    cache every layer (the flash-decode formulation).  MXU consumes bf16
    directly; softmax math is f32.

    q: [T, H, D] f32 at absolute positions start_pos + arange(T).
    k_new/v_new: [T, KH, D] f32 (post-rope, this block).
    k_cache/v_cache: [K, KH, D] stored dtype; rows >= start_pos are stale.
    """
    T, H, D = q.shape
    KH = cfg.dec_kv_heads
    G = H // KH
    Kcap = k_cache.shape[0]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    cdt = k_cache.dtype
    qc = (q * scale).astype(cdt).reshape(T, KH, G, D)

    # part (a): frozen cache prefix (kv_min..start_pos); kv_min > 0 masks
    # left-padding rows in the batched-segments layout
    sa = jnp.einsum("tkgd,skd->kgts", qc, k_cache,
                    preferred_element_type=jnp.float32)          # [KH,G,T,K]
    cache_cols = jnp.arange(Kcap)
    mask_a = ((cache_cols < start_pos) & (cache_cols >= kv_min))[None, None, None, :]
    sa = jnp.where(mask_a, sa, -jnp.inf)

    # part (b): fresh rows, causal within the block (pad rows < kv_min of the
    # block itself are excluded as keys)
    sb = jnp.einsum("tkgd,skd->kgts", qc, k_new.astype(cdt),
                    preferred_element_type=jnp.float32)          # [KH,G,T,T]
    block_cols = start_pos + jnp.arange(T)
    mask_b = ((jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])
              & (block_cols >= kv_min)[None, :])[None, None, :, :]
    sb = jnp.where(mask_b, sb, -jnp.inf)

    ma = jnp.max(sa, axis=-1, keepdims=True)
    mb = jnp.max(sb, axis=-1, keepdims=True)
    m = jnp.maximum(ma, mb)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ea = jnp.where(mask_a, jnp.exp(sa - m), 0.0)
    eb = jnp.where(mask_b, jnp.exp(sb - m), 0.0)
    denom = jnp.maximum(ea.sum(-1, keepdims=True) + eb.sum(-1, keepdims=True), 1e-30)
    oa = jnp.einsum("kgts,skd->tkgd", ea.astype(cdt), v_cache,
                    preferred_element_type=jnp.float32)
    ob = jnp.einsum("kgts,skd->tkgd", eb.astype(cdt), v_new.astype(cdt),
                    preferred_element_type=jnp.float32)
    out = (oa + ob) / jnp.transpose(denom, (2, 0, 1, 3))
    return out.reshape(T, H, D)


def _attn_block(lp, h, kv_layer, cfg: ModelConfig, cos, sin, start_pos,
                valid_len, kv_min, tp, wdt, kv_dt, flash, flash_decode):
    """One layer's attention half: input RMSNorm -> fused QKV -> per-head
    Q/K norm -> RoPE -> causal GQA attention vs the cache -> o-proj residual.

    Shared by the fused layer scan (decoder_forward) and the host-offload
    MoE per-layer jits (models/moe_offload.py) so the math has exactly one
    home.  Returns (h + attn_out, out_kv) where out_kv is the full updated
    [2, K, KH, D] cache pair under `flash`, else the fresh (k, v) rows.
    """
    Tcap = h.shape[0]
    H = cfg.dec_heads
    KH = cfg.dec_kv_heads
    D = cfg.dec_head_dim
    eps = cfg.rms_norm_eps

    from smolvision_tpu.kernels.flash_attention import (
        causal_cache_flash_attention,
        decode_flash_attention,
    )

    xn = rms_norm(h, lp["input_ln"], eps)
    xc = xn.astype(wdt)
    qkv = proj("th,oh->to", xc, lp["wqkv"])
    if lp.get("bqkv") is not None:
        qkv = qkv + lp["bqkv"]
    q, k, v = _split_qkv(qkv, tp, H * D, KH * D, H, KH, D)
    if lp.get("q_norm") is not None:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q = apply_rope_neox(q, cos, sin)
    k = apply_rope_neox(k, cos, sin)

    if flash:
        k_cache = jax.lax.dynamic_update_slice(
            kv_layer[0], k.astype(kv_dt), (start_pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            kv_layer[1], v.astype(kv_dt), (start_pos, 0, 0))
        attn = causal_cache_flash_attention(
            q, k_cache, v_cache, start_pos, start_pos + valid_len,
            gqa_groups=H // KH, kv_min=kv_min)
        out_kv = jnp.stack([k_cache, v_cache])
    elif flash_decode:
        attn = decode_flash_attention(
            q[0], k[0], v[0], kv_layer[0], kv_layer[1], start_pos,
            kv_min=kv_min, gqa_groups=H // KH)[None]
        out_kv = (k.astype(kv_dt), v.astype(kv_dt))
    else:
        attn = _attention_two_part(q, k, v, kv_layer[0], kv_layer[1],
                                   start_pos, cfg, kv_min=kv_min)
        out_kv = (k.astype(kv_dt), v.astype(kv_dt))
    attn = attn.reshape(Tcap, H * D)
    return h + proj("ta,oa->to", attn.astype(wdt), lp["wo"]), out_kv


def _dense_ffn(xn, lp, tp, wdt, ein_up, ein_down):
    """Fused-SwiGLU dense FFN on [T, H] activations."""
    xc2 = xn.astype(wdt)
    gate_up = proj(ein_up, xc2, lp["w_gate_up"])
    gate, up = _split_gate_up(gate_up, tp)
    act = (silu(gate) * up).astype(wdt)
    return proj(ein_down, act, lp["w_down"])


def _ffn_block(xn, lp, cfg: ModelConfig, row_valid, ep, tp, wdt,
               ein_up, ein_down):
    """Per-layer FFN dispatch shared by the single and batched scans.

    Uniform stacks pick one branch statically.  Mixed dense/MoE stacks
    (decoder_sparse_step > 1 — per-layer presence probed from tensor names
    like the reference, qwen_asr_decoder.c:91-125) carry BOTH weight sets
    (zero-filled on the inactive side) plus a scanned per-layer `moe_mask`
    scalar; lax.cond executes only the live branch per layer.  The mask is
    identical on every shard, so the branch is uniform under pjit."""
    if lp.get("moe_mask") is not None:
        return jax.lax.cond(
            lp["moe_mask"],
            lambda x: _moe_ffn(x, lp, cfg, valid=row_valid, ep=ep),
            lambda x: _dense_ffn(x, lp, tp, wdt, ein_up, ein_down),
            xn)
    if lp.get("router") is not None:
        return _moe_ffn(xn, lp, cfg, valid=row_valid, ep=ep)
    return _dense_ffn(xn, lp, tp, wdt, ein_up, ein_down)


def decoder_forward(params, cfg: ModelConfig, embeds, start_pos, valid_len, kv,
                    rope_start=None, kv_min=None, tp: int = 1,
                    ep: bool = False, allow_flash: bool = True):
    """Run the layer stack over `embeds` [Tcap, H] written into cache rows
    start_pos..start_pos+Tcap-1.

    rope_start: logical position of row 0 for RoPE (defaults to start_pos —
    they differ only in the left-padded batched-segments layout, where cache
    index = logical position + pad).
    kv_min: cache rows below this index are never attended (masks left-pad
    garbage; default 0).
    tp: static tensor-parallel degree the fused weights were interleaved
    for (parallel/mesh.interleave_decoder_for_tp); 1 = plain fusion.

    Returns (hidden [Tcap, H] f32 pre-final-norm, kv').
    Rows >= valid_len are junk; their KV rows are progressively overwritten
    by later steps and are never visible through the causal mask.
    """
    Tcap, Hdim = embeds.shape
    H = cfg.dec_heads
    KH = cfg.dec_kv_heads
    D = cfg.dec_head_dim
    eps = cfg.rms_norm_eps
    if rope_start is None:
        rope_start = start_pos
    if kv_min is None:
        kv_min = jnp.int32(0)
    positions = rope_start + jnp.arange(Tcap)
    cos, sin = rope_tables(positions, D, cfg.rope_theta)
    wdt = wdtype(params["layers"]["wqkv"])
    assert not isinstance(kv, QuantKV), \
        "int8 KV (--kv8) is batched-path only (make_batched_kv)"
    kv_dt = kv.dtype

    # Attention strategy (both write the cache without traced-index updates):
    #  * decode (T==1) / fallback: cache READ-ONLY in the scan, fresh rows as
    #    tiny scan outputs, ONE post-scan dynamic_update_slice (flash-decode
    #    structure — no full-cache rewrite per step),
    #  * prefill on TPU: per-layer cache update + Pallas causal flash kernel
    #    (the [T, K] score matrix never hits HBM).
    from smolvision_tpu.kernels import pallas_forced, use_pallas

    Kcap = kv.shape[2]
    kcap_ok = Kcap % min(128, Kcap) == 0
    # allow_flash=False: the speculative verify forward runs T = n_draft+1
    # (~5) rows — far below useful Pallas tile sizes; force the fused-XLA
    # two-part path there
    flash = (allow_flash and use_pallas() and Tcap > 1
             and Tcap % min(128, Tcap) == 0 and kcap_ok)
    # decode: the Pallas single-row kernel pays ~25 us launch overhead per
    # layer (~0.7 ms/step over 28 layers) but reads only the LIVE context;
    # the jnp two-part formulation reads the whole Kcap but runs as fused
    # XLA ops with no launch cost.  Measured crossover on v5e is far above
    # typical ASR contexts (jnp wins by ~0.2 ms/step at Kcap 512), so the
    # kernel only takes over for large caches (tools/profile_decode2.py).
    flash_decode = (use_pallas() and Tcap == 1 and kcap_ok
                    and (Kcap >= FLASH_DECODE_MIN_KCAP or pallas_forced()))

    # rows >= valid_len are junk and rows below kv_min are left-pad: neither
    # may consume MoE expert capacity
    row_valid = (jnp.arange(Tcap) < valid_len) & (start_pos + jnp.arange(Tcap) >= kv_min)

    def layer(h, xs):
        lp, kv_layer = xs
        h, out_kv = _attn_block(lp, h, kv_layer, cfg, cos, sin, start_pos,
                                valid_len, kv_min, tp, wdt, kv_dt,
                                flash, flash_decode)

        xn = rms_norm(h, lp["post_ln"], eps)
        ffn = _ffn_block(xn, lp, cfg, row_valid, ep, tp, wdt,
                         "th,ih->ti", "ti,hi->th")
        h = h + ffn
        return h, out_kv

    h, kv_out = jax.lax.scan(layer, embeds.astype(jnp.float32),
                             (params["layers"], kv))
    if flash:
        kv_new = kv_out  # [L, 2, K, KH, D] already updated per layer
    else:
        k_rows, v_rows = kv_out  # [L, T, KH, D] each -> one write of the block
        new_block = jnp.stack([k_rows, v_rows], axis=1)
        kv_new = jax.lax.dynamic_update_slice(kv, new_block, (0, 0, start_pos, 0, 0))
    return h, kv_new


# ---------------------------------------------------------------------------
# Batch-native formulation (the serving path)
#
# A vmapped single-sequence decoder is correct but slow on TPU: the per-step
# batched dynamic_update_slice fails to alias in place and XLA materializes
# a FULL KV-cache copy every decode step (measured: 7.1 ms/step of a 13.3 ms
# step at B=32, kcap 640 — tools/profile_serving.py), and a vmapped
# pallas_call serializes into B kernel launches per layer.  The native
# formulation writes the batch dimension into the einsums, lays the cache
# out as [L, 2, B, KH, K, D], and performs ONE unbatched dynamic_update_
# slice per forward (scalar start indices — the left-padded batch layout
# makes cache positions batch-uniform), which XLA updates in place.
# ---------------------------------------------------------------------------


def make_batched_kv(cfg: ModelConfig, batch: int, kv_cap: int, dtype=jnp.bfloat16):
    """Batched KV cache [L, 2, B, KH, K, D] (K second-to-last: the decode
    write touches one K row; KH x D are the tiled trailing dims per head).
    dtype == int8 selects the quantized QuantKV layout (--kv8): int8 values
    plus per-row f32 scales [L, 2, B, KH, K] (ops/quant.py)."""
    return kv_zeros((cfg.dec_layers, 2, batch, cfg.dec_kv_heads, kv_cap,
                     cfg.dec_head_dim), dtype)


def _batched_attention_two_part(q, k_new, v_new, k_cache, v_cache, start_pos,
                                cfg: ModelConfig, kv_min, prompt_max=None,
                                region_start=None):
    """Batched causal GQA attention: frozen cache prefix [kv_min[b],
    start_pos) + fresh in-block rows, merged by online softmax.

    q: [B, T, H, D] at cache rows start_pos + arange(T) (batch-uniform).
    k_new/v_new: [B, T, KH, D]; k_cache/v_cache: [B, KH, K, D]; kv_min: [B].
    Returns [B, T, H, D] f32.
    """
    B, T, H, D = q.shape
    KH = cfg.dec_kv_heads
    G = H // KH
    Kcap = k_cache.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    kv8 = isinstance(k_cache, QuantKV)
    if kv8:
        # int8 cache (--kv8): per-row scales fold into the f32 scores (K)
        # and probabilities (V); the int8 values feed the MXU dot after a
        # widening cast only — no dequantized bf16 cache copy materializes
        ks, vs = k_cache.s, v_cache.s                            # [B, KH, K]
        k_cache, v_cache = k_cache.q, v_cache.q
        cdt = (jnp.bfloat16 if jax.default_backend() == "tpu"
               else jnp.float32)
        k_cache = k_cache.astype(cdt)
        v_cache = v_cache.astype(cdt)
    else:
        cdt = k_cache.dtype
        if jax.default_backend() != "tpu" and cdt == jnp.bfloat16:
            # XLA:CPU has no BF16 x BF16 = F32 DotThunk for multi-batch-dim
            # dots; upcasting is exact (bf16 values/products are
            # representable in f32), so CPU tests stay bit-identical to the
            # TPU bf16-input path
            cdt = jnp.float32
            k_cache = k_cache.astype(cdt)
            v_cache = v_cache.astype(cdt)
    qc = (q * scale).astype(cdt).reshape(B, T, KH, G, D)

    sa = jnp.einsum("btkgd,bksd->bkgts", qc, k_cache,
                    preferred_element_type=jnp.float32)          # [B,KH,G,T,K]
    if kv8:
        sa = sa * ks[:, :, None, None, :]
    cache_cols = jnp.arange(Kcap)
    mask_a = ((cache_cols[None, :] < start_pos)
              & (cache_cols[None, :] >= kv_min[:, None]))        # [B, K]
    if prompt_max is not None:
        # NATURAL layout (multistream KV reuse / continuous serving): live
        # rows are the prompt region [0, prompt_max[b]) plus the shared
        # decode region [region_start, start_pos); [prompt_max[b],
        # region_start) is end-pad garbage.  region_start may be per-row
        # ([B]): a row admitted mid-flight at clock c has garbage decode
        # rows below c, so its region floor is c (runtime/serving.py).
        rs = jnp.asarray(region_start)
        rs = rs[:, None] if rs.ndim == 1 else rs
        mask_a = mask_a & ((cache_cols[None, :] < prompt_max[:, None])
                           | (cache_cols[None, :] >= rs))
    mask_a = mask_a[:, None, None, None, :]
    sa = jnp.where(mask_a, sa, -jnp.inf)

    sb = jnp.einsum("btkgd,bskd->bkgts", qc, k_new.astype(cdt),
                    preferred_element_type=jnp.float32)          # [B,KH,G,T,T]
    block_cols = start_pos + jnp.arange(T)
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])  # [T, T]
    mask_b = (causal[None] & (block_cols[None, :] >= kv_min[:, None])[:, None, :])
    mask_b = mask_b[:, None, None, :, :]                         # [B,1,1,T,T]
    sb = jnp.where(mask_b, sb, -jnp.inf)

    ma = jnp.max(sa, axis=-1, keepdims=True)
    mb = jnp.max(sb, axis=-1, keepdims=True)
    m = jnp.maximum(ma, mb)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ea = jnp.where(mask_a, jnp.exp(sa - m), 0.0)
    eb = jnp.where(mask_b, jnp.exp(sb - m), 0.0)
    denom = jnp.maximum(ea.sum(-1, keepdims=True) + eb.sum(-1, keepdims=True), 1e-30)
    if kv8:
        ea = ea * vs[:, :, None, None, :]      # fold V row scales into probs
    oa = jnp.einsum("bkgts,bksd->btkgd", ea.astype(cdt), v_cache,
                    preferred_element_type=jnp.float32)
    ob = jnp.einsum("bkgts,bskd->btkgd", eb.astype(cdt), v_new.astype(cdt),
                    preferred_element_type=jnp.float32)
    out = (oa + ob) / jnp.transpose(denom, (0, 3, 1, 2, 4))
    return out.reshape(B, T, H, D)


def batched_decoder_forward(params, cfg: ModelConfig, embeds, start_pos, kv,
                            rope_start, kv_min, fresh_prefill: bool = False,
                            tp: int = 1, ep: bool = False, prompt_max=None,
                            region_start=None):
    """Run the layer stack over `embeds` [B, Tcap, H] written into cache rows
    start_pos..start_pos+Tcap-1 (batch-uniform scalar — left-padded layout).

    rope_start: [B] logical position of row 0 per row (= -pad).
    kv_min: [B] cache rows below this are left-pad garbage, never attended.
    fresh_prefill: statically True when start_pos == 0 and the whole context
    is this block (serving prefill) — enables the batched Pallas causal
    kernel; attention then never reads the (empty) cache.

    Returns (hidden [B, Tcap, H] f32, kv').
    """
    B, Tcap, Hdim = embeds.shape
    H = cfg.dec_heads
    KH = cfg.dec_kv_heads
    D = cfg.dec_head_dim
    eps = cfg.rms_norm_eps
    positions = rope_start[:, None] + jnp.arange(Tcap)[None, :]   # [B, T]
    cos, sin = rope_tables(positions, D, cfg.rope_theta)
    wdt = wdtype(params["layers"]["wqkv"])
    kv8 = isinstance(kv, QuantKV)
    kv_dt = jnp.bfloat16 if kv8 else kv.dtype

    from smolvision_tpu.kernels import pallas_forced, use_pallas
    from smolvision_tpu.kernels.flash_attention import (
        batched_cache_flash_attention,
        batched_causal_flash_attention,
    )

    # fused-XLA two-part attention wins below ~1k context (measured 366 vs
    # 404 ms at B=32/T=512 on v5e); the kernel takes over where the
    # [B, KH, G, T, T] f32 score tensor gets expensive (2 GB at T=1024)
    flash = (use_pallas() and fresh_prefill and Tcap > 1
             and Tcap % min(128, Tcap) == 0
             and (Tcap >= BATCHED_FLASH_MIN_T or pallas_forced()))
    # delta-prefill cache flash: the [B, KH, G, T, Kcap] score tensor makes
    # the XLA path ~2.7x the matmul bound at multistream round shapes
    Kcap_ = kv.shape[4]
    # Kcap/Tcap bounds keep the whole-segment VMEM tiles (cache [K, D] +
    # block [T, D] + [bq, K] scores) a few MB; the batched runtimes' caps
    # sit far below them
    delta_flash = (use_pallas() and not fresh_prefill and not kv8
                   and Tcap > 1 and Tcap % 64 == 0 and Kcap_ % 64 == 0
                   and Tcap <= 2048 and Kcap_ <= 8192
                   and (Tcap >= BATCHED_DELTA_FLASH_MIN_T or pallas_forced()))

    # pad rows must not consume MoE expert capacity — flattened [B*Tcap]
    # validity for _moe_ffn (left-pad rows below kv_min; with a natural
    # layout, also end-pad rows in [prompt_max[b], region_start))
    pos_blk = (start_pos + jnp.arange(Tcap))[None, :]
    row_valid = pos_blk >= kv_min[:, None]
    if prompt_max is not None:
        rs_ = jnp.asarray(region_start)
        rs_ = rs_[:, None] if rs_.ndim == 1 else rs_   # scalar or per-row [B]
        row_valid = row_valid & ((pos_blk < prompt_max[:, None])
                                 | (pos_blk >= rs_))
    row_valid = row_valid.reshape(B * Tcap)

    q_dim = H * D
    kv_dim = KH * D

    def layer(h, xs):
        lp, kv_layer = xs            # kv_layer [2, B, KH, K, D]
        xn = rms_norm(h, lp["input_ln"], eps)
        xc = xn.astype(wdt)
        qkv = proj("bth,oh->bto", xc, lp["wqkv"])
        if lp.get("bqkv") is not None:
            qkv = qkv + lp["bqkv"]
        q, k, v = _split_qkv(qkv, tp, q_dim, kv_dim, H, KH, D)
        if lp.get("q_norm") is not None:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope_neox(q, cos, sin)
        k = apply_rope_neox(k, cos, sin)

        if flash:
            attn = batched_causal_flash_attention(q, k, v, kv_min,
                                                  gqa_groups=H // KH)
        elif delta_flash:
            attn = batched_cache_flash_attention(
                q, k, v, kv_layer[0], kv_layer[1], start_pos, kv_min,
                prompt_max=prompt_max, region_start=region_start,
                gqa_groups=H // KH)
        else:
            attn = _batched_attention_two_part(
                q, k, v, kv_layer[0], kv_layer[1], start_pos, cfg, kv_min,
                prompt_max=prompt_max, region_start=region_start)
        attn = attn.reshape(B, Tcap, H * D)
        h = h + proj("bta,oa->bto", attn.astype(wdt), lp["wo"])

        xn = rms_norm(h, lp["post_ln"], eps)
        ffn = _ffn_block(xn.reshape(B * Tcap, Hdim), lp, cfg, row_valid, ep,
                         tp, wdt, "th,ih->ti",
                         "ti,hi->th").reshape(B, Tcap, Hdim)
        h = h + ffn
        # fresh rows in cache layout [B, KH, T, D]
        k_t = jnp.transpose(k, (0, 2, 1, 3))
        v_t = jnp.transpose(v, (0, 2, 1, 3))
        if kv8:
            out_kv = (quantize_kv_rows(k_t), quantize_kv_rows(v_t))
        else:
            out_kv = (k_t.astype(kv_dt), v_t.astype(kv_dt))
        return h, out_kv

    h, kv_out = jax.lax.scan(layer, embeds.astype(jnp.float32),
                             (params["layers"], kv))
    k_rows, v_rows = kv_out                      # [L, B, KH, T, D] each
    if kv8:
        new_block = QuantKV(
            jnp.stack([k_rows.q, v_rows.q], axis=1),
            jnp.stack([k_rows.s, v_rows.s], axis=1))  # [L, 2, B, KH, T(, D)]
    else:
        new_block = jnp.stack([k_rows, v_rows], axis=1)
    kv_new = kv_dus(kv, new_block, (0, 0, 0, 0, start_pos, 0))
    return h, kv_new


def batched_logits(params, cfg: ModelConfig, hidden_rows):
    """Final RMSNorm + lm_head for one row per batch element [B, H] -> [B, V]."""
    h = rms_norm(hidden_rows, params["final_norm"], cfg.rms_norm_eps)
    wdt = wdtype(params["lm_head"])
    return proj("bh,vh->bv", h.astype(wdt), params["lm_head"])


def batched_prefill(params, cfg: ModelConfig, embeds, kv, rope_start, kv_min,
                    greedy: bool = True, tp: int = 1, ep: bool = False):
    """Serving prefill: start_pos = 0, every row valid through Tcap (the
    left-padded layout puts each row's last prompt token at Tcap-1).
    embeds [B, Tcap, H]; kv [L, 2, B, KH, K, D].  Returns (tokens|logits, kv')."""
    B, Tcap, _ = embeds.shape
    hidden, kv = batched_decoder_forward(
        params, cfg, embeds, jnp.int32(0), kv, rope_start, kv_min,
        fresh_prefill=True, tp=tp, ep=ep)
    logits = batched_logits(params, cfg, hidden[:, Tcap - 1])
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv
    return logits, kv


def batched_prefill_delta(params, cfg: ModelConfig, embeds, start_pos, kv,
                          rope_start, kv_min, greedy: bool = True,
                          tp: int = 1, ep: bool = False, last_rows=None,
                          prompt_max=None, region_start=None):
    """Streaming-serving TAIL prefill: the block writes cache rows
    [start_pos, start_pos+T) for every row, with each row's LAST prompt
    token at start_pos+T-1 (left-padded ends align at Tcap).

    Per-row frozen context is [kv_min[b], start_pos) — the rows kept by
    batched KV reuse (runtime/multistream.py): the coordinator picks the
    batch-uniform start_pos = min_b(pad_b + reused_b), so every row's
    kept prefix fully covers [kv_min[b], start_pos) and rows with deeper
    reuse simply recompute a few kept tokens (bit-identical by greedy
    determinism).  rope position of block row j for sequence b is
    start_pos + j - pad_b (rope_start[b] = start_pos - pad_b).

    Returns (tokens | logits, kv')."""
    B, T, _ = embeds.shape
    hidden, kv = batched_decoder_forward(
        params, cfg, embeds, start_pos, kv, rope_start, kv_min, tp=tp, ep=ep,
        prompt_max=prompt_max, region_start=region_start)
    if last_rows is None:
        h_last = hidden[:, T - 1]     # left-padded: ends align at T-1
    else:
        # natural layout: row b's last prompt token sits at last_rows[b]
        h_last = jnp.take_along_axis(
            hidden, last_rows[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = batched_logits(params, cfg, h_last)
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv
    return logits, kv


def batched_decode_chunk(params, cfg: ModelConfig, tokens, pos, kv,
                         n_steps_cap: int, rope_offset, kv_min, n_steps=None,
                         tp: int = 1, ep: bool = False, prompt_max=None,
                         region_start=None, row_active=None):
    """Greedy-decode up to n_steps tokens for every batch row, exiting early
    once EVERY row has emitted an EOS (rows that finish first keep decoding
    garbage into the buffer until then — the host truncates at EOS).

    tokens [B]; pos scalar cache row (batch-uniform); rope position of row b
    = pos - rope_offset[b].  n_steps_cap is the static buffer width; n_steps
    (traced, defaults to the cap) bounds the loop so short tails don't pay
    for full chunks.  row_active [B] bool (optional) marks pad/duplicate
    rows as pre-done so the early exit waits only on real rows — pad rows
    decode promptless garbage that may never emit EOS.  Returns
    (buf [B, n_steps_cap], count, last_tokens [B], kv')."""
    from smolvision_tpu.config import EOS_TOKEN_IDS

    B = tokens.shape[0]
    eos = jnp.asarray(sorted(EOS_TOKEN_IDS), dtype=jnp.int32)
    if n_steps is None:
        n_steps = jnp.int32(n_steps_cap)
    buf0 = jnp.zeros((B, n_steps_cap), jnp.int32)
    done0 = jnp.any(tokens[:, None] == eos[None, :], axis=1)
    if row_active is not None:
        done0 = done0 | ~row_active

    def cond(c):
        i, _, _, _, done = c
        return (i < n_steps) & ~jnp.all(done)

    def body(c):
        i, toks, kv_, buf_, done = c
        p = pos + i
        embeds = embed_rows(params["embed"], toks)[:, None, :]
        hidden, kv_ = batched_decoder_forward(
            params, cfg, embeds, p, kv_, p - rope_offset, kv_min, tp=tp, ep=ep,
            prompt_max=prompt_max, region_start=region_start)
        logits = batched_logits(params, cfg, hidden[:, 0])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        buf_ = jax.lax.dynamic_update_slice(buf_, nxt[:, None], (0, i))
        done = done | jnp.any(nxt[:, None] == eos[None, :], axis=1)
        return (i + 1, nxt, kv_, buf_, done)

    i, toks, kv, buf, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, kv, buf0, done0))
    return buf, i, toks, kv


def logits_at(params, cfg: ModelConfig, hidden, row):
    """Final RMSNorm + lm_head logits for one row of the hidden states."""
    h = jax.lax.dynamic_index_in_dim(hidden, row, axis=0, keepdims=False)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    wdt = wdtype(params["lm_head"])
    return proj("h,vh->v", h.astype(wdt), params["lm_head"])


def prefill(params, cfg: ModelConfig, embeds, start_pos, valid_len, kv,
            greedy: bool = True, rope_start=None, kv_min=None,
            tp: int = 1, ep: bool = False) -> Tuple[Any, Any]:
    """Prefill the bucket; return (first_token | logits, kv')."""
    hidden, kv = decoder_forward(params, cfg, embeds, start_pos, valid_len, kv,
                                 rope_start=rope_start, kv_min=kv_min, tp=tp,
                                 ep=ep)
    logits = logits_at(params, cfg, hidden, valid_len - 1)
    if greedy:
        return jnp.argmax(logits).astype(jnp.int32), kv
    return logits, kv


def decode_step(params, cfg: ModelConfig, token, pos, kv,
                greedy: bool = True, rope_start=None, kv_min=None,
                tp: int = 1, ep: bool = False) -> Tuple[Any, Any]:
    """One autoregressive step writing cache row `pos` (scalar int32)."""
    embed = embed_rows(params["embed"], token)[None]  # [1, H] f32
    hidden, kv = decoder_forward(params, cfg, embed, pos, jnp.int32(1), kv,
                                 rope_start=rope_start, kv_min=kv_min, tp=tp,
                                 ep=ep)
    logits = logits_at(params, cfg, hidden, jnp.int32(0))
    if greedy:
        return jnp.argmax(logits).astype(jnp.int32), kv
    return logits, kv
