"""Pallas TPU flash-attention kernels.

TPU-native replacements for the reference's hand-vectorized attention loops
(qwen_asr_kernels.c:1054-1192; AVX/NEON kernels qwen_asr_kernels_avx.c):

  * `window_flash_attention` — bidirectional attention within hard windows
    (encoder).  One grid program per (window, head); the whole window fits
    VMEM (<= 104 tokens), so scores never touch HBM.
  * `causal_cache_flash_attention` — causal GQA attention of a query block
    against the KV cache (decoder prefill).  Online-softmax accumulation
    over KV blocks with a revisited output block; the [T, K] score matrix is
    never materialized in HBM (XLA's einsum formulation writes ~134 MB of
    f32 scores for a 1k x 2k prefill).

Both kernels run in interpret mode off-TPU and are unit-tested against
kernels/jnp_reference.py (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Encoder: windowed bidirectional attention
# ---------------------------------------------------------------------------

def _window_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: q/k/v/o [1, 1, S, D] (head-major so the trailing block dims are
    # TPU-tileable); kv_len_ref in SMEM [W]
    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale      # [S, D]
    k = k_ref[0, 0, :, :].astype(jnp.float32)
    v = v_ref[0, 0, :, :].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [S, S]
    S = s.shape[1]
    w = pl.program_id(0)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) < kv_len_ref[w]
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (o / denom).astype(o_ref.dtype)


def window_flash_attention(q, k, v, kv_valid_lens):
    """q,k,v: [W, S, H, D]; kv_valid_lens: [W] int32 (valid keys per window).
    Returns [W, S, H, D] f32.  Fully-masked query rows yield zeros... rows
    beyond the valid length attend the valid prefix like any other row; the
    caller slices them away (identical contract to the jnp reference except
    pad rows are garbage-but-finite)."""
    W, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    grid = (W, H)
    # head-major layout: trailing block dims (S, D) satisfy TPU tiling
    qT = jnp.transpose(q, (0, 2, 1, 3))
    kT = jnp.transpose(k, (0, 2, 1, 3))
    vT = jnp.transpose(v, (0, 2, 1, 3))
    spec = pl.BlockSpec((1, 1, S, D), lambda w, h, *refs: (w, h, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_window_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct((W, H, S, D), jnp.float32),
        interpret=_interpret(),
    )(kv_valid_lens, qT, kT, vT)
    return jnp.transpose(out, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# Decoder prefill: causal GQA flash over the KV cache
# ---------------------------------------------------------------------------

def _causal_kernel(start_ref, kvlen_ref, kvmin_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref, *, scale, bq, bk, n_kb):
    kb = pl.program_id(2)
    tb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, :, :].astype(jnp.float32) * scale          # [BQ, D]
    k = k_ref[0, :, :].astype(jnp.float32)                  # [BK, D]
    v = v_ref[0, :, :].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BQ, BK]

    start = start_ref[0]
    kv_len = kvlen_ref[0]
    kv_min = kvmin_ref[0]
    rows = start + tb * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = (cols <= rows) & (cols < kv_len) & (cols >= kv_min)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kb == n_kb - 1)
    def _():
        o_ref[0, :, :] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _decode_kernel(start_ref, kvmin_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                   o_ref, m_ref, l_ref, acc_ref, *, scale, bk, n_kb):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = start_ref[0]
    kv_min = kvmin_ref[0]
    # blocks past the last cache row are never fetched (the index map clamps
    # to the last valid block) nor computed
    last_valid = jnp.maximum((start - 1) // bk, 0)

    @pl.when((kb <= last_valid) & (start > 0))
    def _():
        q = q_ref[0].astype(jnp.float32) * scale            # [G, D]
        k = k_ref[0].astype(jnp.float32)                    # [BK, D]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G, BK]
        cols = kb * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (cols < start) & (cols >= kv_min)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == n_kb - 1)
    def _():
        # merge the fresh (self) row, always attended
        q = q_ref[0].astype(jnp.float32) * scale            # [G, D]
        kn = kn_ref[0, 0].astype(jnp.float32)               # [D]
        vn = vn_ref[0, 0].astype(jnp.float32)
        s_self = jnp.sum(q * kn[None, :], axis=-1, keepdims=True)  # [G, 1]
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vn[None, :]
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def decode_flash_attention(q, k_new, v_new, k_cache, v_cache, start_pos,
                           kv_min=None, *, gqa_groups: int, block_k: int = 256):
    """Single-position GQA flash attention over the cache + the fresh row.

    q: [H, D] at cache row start_pos; k_new/v_new: [KH, D] (this row's K/V,
    NOT yet in the cache); k_cache/v_cache: [K, KH, D], rows [kv_min,
    start_pos) are attended.  Cache blocks past start_pos are neither
    fetched nor computed (index-map clamping), so attention cost follows the
    LIVE context length, not the bucket capacity.
    Returns [H, D] f32.
    """
    H, D = q.shape
    K, KH, _ = k_cache.shape
    G = gqa_groups
    assert H == KH * G
    if kv_min is None:
        kv_min = jnp.int32(0)
    bk = min(block_k, K)
    if K % bk:
        bk = 128 if K % 128 == 0 else K  # 128-granular caps
    assert K % bk == 0
    n_kb = K // bk
    scale = 1.0 / (D ** 0.5)

    qT = q.reshape(KH, G, D)
    knT = k_new.reshape(KH, 1, D)
    vnT = v_new.reshape(KH, 1, D)
    kT = jnp.transpose(k_cache, (1, 0, 2))
    vT = jnp.transpose(v_cache, (1, 0, 2))

    start_arr = jnp.reshape(jnp.asarray(start_pos).astype(jnp.int32), (1,))
    kvmin_arr = jnp.reshape(jnp.asarray(kv_min).astype(jnp.int32), (1,))

    q_spec = pl.BlockSpec((1, G, D), lambda kh, kb, *refs: (kh, 0, 0),
                          memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, 1, D), lambda kh, kb, *refs: (kh, 0, 0),
                            memory_space=pltpu.VMEM)

    def kv_index(kh, kb, start_ref, kvmin_ref):
        last_valid = jnp.maximum((start_ref[0] - 1) // bk, 0)
        return (kh, jnp.minimum(kb, last_valid), 0)

    kv_spec = pl.BlockSpec((1, bk, D), kv_index, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk, n_kb=n_kb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(KH, n_kb),
            in_specs=[q_spec, new_spec, new_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((KH, G, D), jnp.float32),
        interpret=_interpret(),
    )(start_arr, kvmin_arr, qT, knT, vnT, kT, vT)
    return out.reshape(H, D)


def _batched_causal_kernel(kvmin_ref, q_ref, k_ref, v_ref, o_ref,
                           m_ref, l_ref, acc_ref, *, scale, bq, bk, n_kb):
    b = pl.program_id(0)
    tb = pl.program_id(2)
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal block skip: key blocks strictly above the query block's last
    # row are fully masked — neither fetched (index-map clamp) nor computed
    @pl.when(kb * bk <= tb * bq + bq - 1)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale          # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)                  # [BK, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [BQ, BK]
        rows = tb * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = (cols <= rows) & (cols >= kvmin_ref[b])
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == n_kb - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def batched_causal_flash_attention(q, k, v, kv_min, *, gqa_groups: int,
                                   block_q: int = 128, block_k: int = 256):
    """Batched causal GQA self-attention over a fresh block (serving
    prefill: the whole context IS the block, cache starts empty).

    q: [B, T, H, D]; k/v: [B, T, KH, D]; kv_min: [B] int32 — rows/cols below
    kv_min[b] are left-padding (masked as keys; their outputs are garbage and
    never read).  Returns [B, T, H, D] f32.  One kernel launch for the whole
    batch — a vmapped pallas_call serializes into B launches per layer
    (measured: 896 launches, ~40% of batched prefill time).
    """
    B, T, H, D = q.shape
    KH = k.shape[2]
    G = gqa_groups
    assert H == KH * G
    bq = min(block_q, T)
    bk = min(block_k, T)
    if T % bk:
        bk = 128 if T % 128 == 0 else T
    assert T % bq == 0 and T % bk == 0, (T, bq, bk)
    n_tb = T // bq
    n_kb = T // bk
    scale = 1.0 / (D ** 0.5)

    qT = jnp.transpose(q, (0, 2, 1, 3))          # [B, H, T, D]
    kT = jnp.transpose(k, (0, 2, 1, 3))          # [B, KH, T, D]
    vT = jnp.transpose(v, (0, 2, 1, 3))

    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, tb, kb, *refs: (b, h, tb, 0),
                          memory_space=pltpu.VMEM)

    def kv_index(b, h, tb, kb, *refs):
        last = (tb * bq + bq - 1) // bk
        return (b, h // G, jnp.minimum(kb, last), 0)

    kv_spec = pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_batched_causal_kernel, scale=scale, bq=bq, bk=bk,
                          n_kb=n_kb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_tb, n_kb),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(kv_min, dtype=jnp.int32), qT, kT, vT)
    return jnp.transpose(out, (0, 2, 1, 3))


def _batched_cache_kernel(start_ref, kvmin_ref, pm_ref, rs_ref,
                          q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref,
                          m_ref, l_ref, acc_ref, *, scale, bq, t_len):
    # G-folded layout: the q block holds bq rows of [B, KH, G*T, D] — all
    # GQA groups of one KV head share the block, so each K/V segment is
    # fetched ONCE per KV head (not once per query head).  Row r's block
    # position is r % T (T % bq == 0, so a q block never straddles group
    # boundaries and t is contiguous within it).  The K axis is TWO whole
    # segments (kb=0: the full cache; kb=1: the full fresh block) — at the
    # runtime's shapes both fit VMEM comfortably (<= ~1 MB each), and whole
    # segments give the MXU full-width rhs tiles where a 64-granular
    # blocked walk measured 40% slower than the fused-XLA formulation.
    b = pl.program_id(0)
    tb = pl.program_id(2)
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = start_ref[0]
    kv_min = kvmin_ref[b]
    pm = pm_ref[b]
    rs = rs_ref[b]
    t0 = (tb * bq) % t_len          # block position of the q block's row 0

    # ---- kb 0: the cache segment (skipped entirely when start == 0) -----
    @pl.when((kb == 0) & (start > 0))
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale          # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)                  # [K, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = ((cols < start) & (cols >= kv_min)
                & ((cols < pm) | (cols >= rs)))
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    # ---- kb 1: the fresh block (causal within the block) ----------------
    @pl.when(kb == 1)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        k = kn_ref[0, 0].astype(jnp.float32)                 # [T, D]
        v = vn_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rows = t0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (cols <= rows) & (start + cols >= kv_min)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def batched_cache_flash_attention(q, k_new, v_new, k_cache, v_cache,
                                  start_pos, kv_min, prompt_max=None,
                                  region_start=None, *, gqa_groups: int,
                                  block_q: int = 256, block_k: int = 256):
    """Batched GQA flash attention of a fresh query block against the cache
    PLUS the block's own fresh K/V (the batched delta-prefill shape —
    models/qwen3_decoder._batched_attention_two_part's semantics, but the
    [B, KH, G, T, K] f32 score tensor never reaches HBM: ~440 MB/layer at
    B=16, T=512, Kcap 832, which made the XLA formulation ~2.7x the matmul
    bound; measured in docs/MULTISTREAM.md round 3).

    q: [B, T, H, D] at cache rows start_pos + arange(T); k_new/v_new:
    [B, T, KH, D] (the block's K/V, NOT yet written to the cache);
    k_cache/v_cache: [B, KH, K, D].  Cache cols attended for row b:
    [kv_min[b], start_pos) ∩ ([0, prompt_max[b]) ∪ [region_start[b], K))
    — the natural-layout end-pad mask; pass prompt_max=None for the plain
    left-padded contract (all cols live).  Returns [B, T, H, D] f32.
    """
    B, T, H, D = q.shape
    KH = k_cache.shape[1]
    K = k_cache.shape[2]
    G = gqa_groups
    assert H == KH * G
    bq = min(block_q, T)
    if T % bq:
        bq = 64 if T % 64 == 0 else T
    assert T % bq == 0, (T, bq)
    n_tb = (G * T) // bq            # q grid runs over the G-folded rows
    scale = 1.0 / (D ** 0.5)

    # G-folded layout [B, KH, G*T, D]: all query groups of one KV head are
    # contiguous rows, so each K/V tile is fetched once per KV head (the
    # flat [B, H, T, D] layout refetches it G times)
    qT = jnp.transpose(q.reshape(B, T, KH, G, D), (0, 2, 3, 1, 4)) \
            .reshape(B, KH, G * T, D)
    knT = jnp.transpose(k_new, (0, 2, 1, 3))      # [B, KH, T, D]
    vnT = jnp.transpose(v_new, (0, 2, 1, 3))

    kv_min = jnp.asarray(kv_min, jnp.int32).reshape(B)
    if prompt_max is None:
        pm = jnp.full((B,), K, jnp.int32)
        rs = jnp.zeros((B,), jnp.int32)
    else:
        pm = jnp.asarray(prompt_max, jnp.int32).reshape(B)
        rs = jnp.broadcast_to(jnp.asarray(region_start, jnp.int32),
                              (B,)) if jnp.ndim(region_start) == 0 else \
            jnp.asarray(region_start, jnp.int32).reshape(B)
    start_arr = jnp.reshape(jnp.asarray(start_pos, jnp.int32), (1,))

    q_spec = pl.BlockSpec((1, 1, bq, D),
                          lambda b, kh, tb, kb, *refs: (b, kh, tb, 0),
                          memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((1, 1, K, D),
                              lambda b, kh, tb, kb, *refs: (b, kh, 0, 0),
                              memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, 1, T, D),
                            lambda b, kh, tb, kb, *refs: (b, kh, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_batched_cache_kernel, scale=scale, bq=bq, t_len=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, KH, n_tb, 2),
            in_specs=[q_spec, new_spec, new_spec, cache_spec, cache_spec],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KH, G * T, D), jnp.float32),
        interpret=_interpret(),
    )(start_arr, kv_min, pm, rs, qT, knT, vnT, k_cache, v_cache)
    return jnp.transpose(out.reshape(B, KH, G, T, D),
                         (0, 3, 1, 2, 4)).reshape(B, T, H, D)


def causal_cache_flash_attention(q, k_cache, v_cache, start_pos, kv_valid_len,
                                 *, gqa_groups: int, block_q: int = 128,
                                 block_k: int = 256, kv_min=None):
    """Causal GQA attention of a fresh query block against the cache.

    q: [T, H, D] at cache rows start_pos + arange(T); the cache ALREADY
    CONTAINS this block's K/V rows (written before the call).
    k_cache/v_cache: [K, KH, D]; rows >= kv_valid_len or < kv_min are masked.
    Returns [T, H, D] f32.
    """
    if kv_min is None:
        kv_min = jnp.int32(0)
    T, H, D = q.shape
    K, KH, _ = k_cache.shape
    G = gqa_groups
    assert H == KH * G
    bq = min(block_q, T)
    bk = min(block_k, K)
    if K % bk:
        bk = 128 if K % 128 == 0 else K
    assert T % bq == 0 and K % bk == 0, (T, bq, K, bk)
    n_tb = T // bq
    n_kb = K // bk
    scale = 1.0 / (D ** 0.5)

    grid = (H, n_tb, n_kb)
    # head-major layout for TPU tiling of the trailing (rows, D) block dims
    qT = jnp.transpose(q, (1, 0, 2))            # [H, T, D]
    kT = jnp.transpose(k_cache, (1, 0, 2))      # [KH, K, D]
    vT = jnp.transpose(v_cache, (1, 0, 2))
    q_spec = pl.BlockSpec((1, bq, D), lambda h, tb, kb, *refs: (h, tb, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, D), lambda h, tb, kb, *refs: (h // G, kb, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, bq, D), lambda h, tb, kb, *refs: (h, tb, 0),
                          memory_space=pltpu.VMEM)

    start_arr = jnp.reshape(jnp.asarray(start_pos).astype(jnp.int32), (1,))
    kvlen_arr = jnp.reshape(jnp.asarray(kv_valid_len).astype(jnp.int32), (1,))
    kvmin_arr = jnp.reshape(jnp.asarray(kv_min).astype(jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_causal_kernel, scale=scale, bq=bq, bk=bk, n_kb=n_kb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, T, D), jnp.float32),
        interpret=_interpret(),
    )(start_arr, kvlen_arr, kvmin_arr, qT, kT, vT)
    return jnp.transpose(out, (1, 0, 2))
