"""Opt-in int8 weight quantization for the decoder hot path (--q8).

docs/DECODE_PROFILE.md closed the exact-bf16 decode step at its HBM
speed-of-light (~2.45 ms/token = 1.25 GB of weight stream at 485 GB/s on
one v5e).  The one lever left is halving the bytes: per-output-channel
symmetric int8 weights.  This module is that lever, kept strictly OPT-IN
because the repo's token-parity contract (tests/oracle.py, BASELINE.json)
is defined against bf16 weights — `--q8` trades bounded quantization noise
for ~1.7x decode bandwidth.

Design:
  * `QuantW(q, s)` — a pytree (NamedTuple) of int8 weights `q` laid out
    like the bf16 original ([..., O, H], contraction axis LAST) plus f32
    per-output-channel scales `s` ([..., O]).  It flows through `lax.scan`
    / jit boundaries exactly like the plain array it replaces.
  * the matmul computes in bf16 on the MXU (int8 -> bf16 convert is exact
    for |q| <= 127 and fuses into the dot's operand fetch; measured
    0.887 -> 0.734 ms on the lm_head matvec, tools/probe_int8.py) and the
    scale is folded into the f32 OUTPUT — higher precision than
    dequantizing the weights, since each product is scaled once after
    exact accumulation.
  * quantization is symmetric round-to-nearest over the contraction axis:
    s = max|w| / 127, q = round(w / s).  Rows whose max is a power of two
    times 127 quantize losslessly — tests exploit this for an exactness
    check of the machinery itself.

The reference has no quantized path (it streams bf16 from mmap,
qwen_asr_kernels.c:231-484); this is a TPU-side extension beyond parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantW(NamedTuple):
    """int8 weight + f32 per-output-channel scale; drop-in pytree leaf pair.

    q: int8 [..., O, H] (same layout as the bf16 weight it replaces)
    s: f32  [..., O]    (scale of each output channel / row)
    """

    q: jax.Array
    s: jax.Array

    @property
    def dtype(self):  # compute dtype seen by activation casts
        return jnp.bfloat16

    @property
    def shape(self):
        return self.q.shape


def wdtype(w):
    """Activation cast target for a weight that may be quantized."""
    return jnp.bfloat16 if isinstance(w, QuantW) else w.dtype


def quantize_weight(w) -> QuantW:
    """Symmetric per-output-channel int8 over the LAST axis (contraction)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s[..., None]), -127, 127).astype(jnp.int8)
    return QuantW(q, s)


# einsum equations with the plain GEMM structure x [T, C] @ w [O, C] ->
# [T, O] (contraction LAST on both operands) — the int8xint8 fast path
# below only fires for these
_GEMM_EQS = frozenset({"th,oh->to", "ta,oa->to", "th,ih->ti", "ti,hi->th",
                       "bh,vh->bv"})
# batched variants: x [B, T, C] collapses to [B*T, C] around the same GEMM
_GEMM_EQS_B = frozenset({"bth,oh->bto", "bta,oa->bto"})

# int8 activations pay off only for COMPUTE-bound blocks: measured on v5e
# (tools/probe_int8_prefill.py, M=12288 prefill shapes) int8xint8 runs
# 1.3-1.65x bf16 INCLUDING the per-token quant cost, while decode matvecs
# (M <= slots) stay bandwidth-bound where the dequant-in-fetch path is
# already optimal (tools/probe_int8.py).  Threshold = collapsed token
# count; tiny-model tests and all decode steps sit far below it.
_ACTQ_MIN_M = 1024


def _actq_enabled():
    import os

    return os.environ.get("SMOLVISION_Q8_ACTQ", "") != "0"


def _actq_min() -> int:
    """SMOLVISION_Q8_ACTQ_MIN overrides the collapsed-token threshold
    (trace-time, like SMOLVISION_Q8_ACTQ).  Sweep knob for the serving
    ceiling: at B=64 continuous decode M=64, far below the default 1024 —
    lowering the floor routes the decode-chunk GEMMs through the MXU's
    int8xint8 mode with per-token activation quant instead of the
    dequant-to-bf16 weight path (VERDICT r4 Next #2 experiment)."""
    import os

    return int(os.environ.get("SMOLVISION_Q8_ACTQ_MIN", "") or _ACTQ_MIN_M)


def proj(eq: str, x, w):
    """einsum(eq, x, w) with f32 accumulate; w may be a QuantW.

    Requires (and every decoder call site satisfies) that the quantized
    weight's non-contraction axes are the TRAILING output axes, so the
    scale broadcasts right-aligned onto the f32 result.

    QuantW GEMMs over >= _ACTQ_MIN_M collapsed tokens (q8 PREFILL blocks)
    additionally quantize the activations per token and run the MXU's
    int8xint8 mode — ~1.3-1.65x the bf16 dot at those shapes.  Decode
    matvecs and small blocks keep the exact-activation dequant path.
    SMOLVISION_Q8_ACTQ=0 reverts (measurement/debug) — but the flag is
    read at TRACE time: it must be set before the engine's q8 jits are
    first traced (i.e. before warmup); flipping it later in the same
    process does nothing for already-traced programs (ADVICE r4;
    tools/probe_serving_q8kv8.py runs each arm in a fresh trace for this
    reason).
    """
    if isinstance(w, QuantW):
        batched = eq in _GEMM_EQS_B and x.ndim == 3
        if ((eq in _GEMM_EQS and x.ndim == 2 or batched) and w.q.ndim == 2
                and _actq_enabled()):
            x2 = x.reshape(-1, x.shape[-1]) if batched else x
            if x2.shape[0] >= _actq_min():
                xs = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=1,
                             keepdims=True) / 127.0
                xs = jnp.maximum(xs, 1e-12)
                xq = jnp.round(x2.astype(jnp.float32) / xs)
                xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w.q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * xs * w.s[None, :]
                if batched:
                    y = y.reshape(*x.shape[:2], w.q.shape[0])
                return y
        y = jnp.einsum(eq, x.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y * w.s
    return jnp.einsum(eq, x, w, preferred_element_type=jnp.float32)


def embed_rows(emb, ids):
    """Embedding-table gather -> f32 rows; table may be a QuantW."""
    if isinstance(emb, QuantW):
        return emb.q[ids].astype(jnp.float32) * emb.s[ids][..., None]
    return emb[ids].astype(jnp.float32)


def qtake(w, idx):
    """Index the leading axes of a (possibly quantized) weight — the MoE
    decode gather `e_gate[top_idx]`."""
    if isinstance(w, QuantW):
        return QuantW(w.q[idx], w.s[idx])
    return w[idx]


# ---------------------------------------------------------------------------
# int8 KV cache (--kv8) — the BATCHED decode paths' bandwidth lever
#
# At serving/multistream batch sizes the KV read is the dominant decode
# term (B=32 x kcap 320: ~1.17 GB/step bf16 vs 0.63 GB of q8 weights;
# B=8 x kcap ~830: ~0.76 GB — docs/SERVING_ROOFLINE.md, docs/
# MULTISTREAM.md).  Per-row symmetric int8 over the head dim halves those
# bytes.  Scales fold into the attention math exactly once:
#   scores  = (q . k8) * ks      (ks is per K-row — scales the f32 score)
#   context = (p * vs) . v8      (vs folds into the f32 probabilities)
# so the int8 values go straight into the MXU dot after a widening cast;
# nothing is dequantized into a bf16 cache copy.  Strictly OPT-IN: the
# token-parity contract is defined against the bf16 cache.
#
# The reference has no KV quantization (bf16 cache, qwen_asr.c); this is
# a TPU-side extension beyond parity.
# ---------------------------------------------------------------------------


class QuantKV(NamedTuple):
    """int8 KV cache + per-row f32 scales; pytree drop-in for the bf16
    cache arrays.  Leading axes of `q` and `s` coincide — every cache
    operation the runtime performs (layer unstack, batch-row slice/copy,
    K-axis grow, position DUS) indexes axes before D, so it applies to
    both leaves with the index tuple truncated for `s`.

    q: int8 [..., K, D]
    s: f32  [..., K]     (scale of each cache row over D)
    """

    q: jax.Array
    s: jax.Array

    @property
    def dtype(self):  # marker used by make_batched_kv round-trips
        return jnp.int8

    @property
    def shape(self):
        return self.q.shape

    def __getitem__(self, idx):
        """Basic indexing on the shared leading axes (ints/slices only —
        e.g. kv[0] to unstack K vs V).  An index tuple deeper than `s`'s
        rank reaches into the D axis (fence reads like kv[0,0,0,0,0,0])
        and returns the raw int8 values."""
        tup = idx if isinstance(idx, tuple) else (idx,)
        if len(tup) > self.s.ndim:
            return self.q[idx]
        return QuantKV(self.q[idx], self.s[idx])


def quantize_kv_rows(x) -> QuantKV:
    """Symmetric per-row int8 over the LAST axis: x [..., D] -> QuantKV."""
    xf = jnp.asarray(x).astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return QuantKV(q, s)


def kv_zeros(shape, dtype):
    """Allocate a KV cache; dtype == int8 selects the quantized layout."""
    if dtype == jnp.int8:
        return QuantKV(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape[:-1], jnp.float32))
    return jnp.zeros(shape, dtype)


def kv_dus(kv, new, idx):
    """dynamic_update_slice on a (possibly quantized) cache.  `idx` is the
    full-rank index tuple of the q leaf; `s` takes it truncated."""
    if isinstance(kv, QuantKV):
        return QuantKV(jax.lax.dynamic_update_slice(kv.q, new.q, idx),
                       jax.lax.dynamic_update_slice(kv.s, new.s, idx[:-1]))
    return jax.lax.dynamic_update_slice(kv, new, idx)


def kv_grow_k(kv, kcap_new: int, k_axis: int = 4):
    """Zero-grow the K (cache position) axis to kcap_new."""
    if isinstance(kv, QuantKV):
        qs = kv.q.shape
        new_q = jnp.zeros(qs[:k_axis] + (kcap_new,) + qs[k_axis + 1:],
                          kv.q.dtype)
        new_s = jnp.zeros(kv.s.shape[:k_axis] + (kcap_new,)
                          + kv.s.shape[k_axis + 1:], kv.s.dtype)
        z = (0,) * kv.q.ndim
        return QuantKV(jax.lax.dynamic_update_slice(new_q, kv.q, z),
                       jax.lax.dynamic_update_slice(new_s, kv.s, z[:-1]))
    new = jnp.zeros(kv.shape[:k_axis] + (kcap_new,) + kv.shape[k_axis + 1:],
                    kv.dtype)
    return jax.lax.dynamic_update_slice(new, kv, (0,) * kv.ndim)


def kv_rows_gather(kv, rows, axis: int = 2):
    """Gather batch rows by STATIC indices (row compaction) — per-leaf
    stacked static slices, never a per-row dynamic gather (landmine:
    batched take_along_axis over the cache lowers catastrophically)."""
    if isinstance(kv, QuantKV):
        return QuantKV(
            jnp.stack([jax.lax.index_in_dim(kv.q, r, axis, keepdims=False)
                       for r in rows], axis=axis),
            jnp.stack([jax.lax.index_in_dim(kv.s, r, axis, keepdims=False)
                       for r in rows], axis=axis))
    return jnp.stack([jax.lax.index_in_dim(kv, r, axis, keepdims=False)
                      for r in rows], axis=axis)
