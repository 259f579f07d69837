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


def proj(eq: str, x, w):
    """einsum(eq, x, w) with f32 accumulate; w may be a QuantW.

    Requires (and every decoder call site satisfies) that the quantized
    weight's non-contraction axes are the TRAILING output axes, so the
    scale broadcasts right-aligned onto the f32 result.
    """
    if isinstance(w, QuantW):
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
