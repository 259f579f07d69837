"""Host-offload MoE expert streaming — Plan B of docs/MOE_30B_PLAN.md.

The reference executes Qwen3-Omni-30B (48 layers x 128 experts ≈ 58 GB of
expert weights) on ONE host by mmap-ing the expert tensors and paging them
on demand per selected expert (qwen_asr_decoder.c:321-451).  This module is
the TPU analog for chips whose HBM cannot hold the expert set:

  * dense/attention weights, norms, router and the KV cache stay RESIDENT
    on device (~2.5 GB for the 30B);
  * expert weights stay on HOST as zero-copy mmap views (`HostExpertStore`)
    — untouched experts never even page in from disk, exactly like the
    reference's lazy mmap;
  * decode streams only the selected top-k experts' blocks per layer
    (~37 MB for the 30B) through `jax.device_put`; prefill streams each
    layer's full expert stack once (the dense/capacity paths read all
    experts anyway for long prompts);
  * the layer's attention half and the expert SwiGLU mix reuse the SAME
    functions as the resident decoder (`_attn_block`, `moe_apply_gathered`,
    `_moe_ffn`), so the two execution modes cannot drift numerically.

This is the single-chip escape hatch; multi-chip expert parallelism
(Plan A, parallel/mesh.py) remains the production path.  Throughput is
host-link-bound: ~1.8 GB of active expert bytes per decoded token needs
PCIe-class bandwidth to be practical (see the plan doc's arithmetic).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import ModelConfig
from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.models.params import DEC_PREFIX
from smolvision_tpu.ops.common import rms_norm, rope_tables
from smolvision_tpu.ops.quant import wdtype


class HostExpertStore:
    """Per-(layer, expert) zero-copy mmap views of the expert tensors.

    Mirrors the reference's expert pointer table (qwen_asr_decoder.c:91-125):
    nothing is read at construction; a page faults in the first time its
    expert is gathered.  `preload()` is the `--moe-preload` analog.
    """

    def __init__(self, reader, cfg: ModelConfig, prefix: str = DEC_PREFIX):
        L, E = cfg.dec_layers, cfg.num_experts
        self.cfg = cfg
        # Per-layer expert presence via a tensor-name probe.  This EXTENDS
        # the reference's all-or-nothing cfg->is_moe dispatch (its layer
        # loop gates on the global flag, qwen_asr_decoder.c:91-125; it has
        # no decoder_sparse_step support) to mixed checkpoints that
        # interleave dense FFN layers: those layers have no experts, their
        # rows stay None, and offload_forward takes the resident dense-FFN
        # branch instead
        self.is_moe = [reader.has(
            f"{prefix}.layers.{l}.mlp.gate.weight") for l in range(L)]
        t = f"{prefix}.layers.{{l}}.mlp.experts.{{e}}.{{m}}.weight"

        def _row(l, m):
            if not self.is_moe[l]:
                return None
            return [reader.get(t.format(l=l, e=e, m=m)) for e in range(E)]

        self._g = [_row(l, "gate_proj") for l in range(L)]
        self._u = [_row(l, "up_proj") for l in range(L)]
        self._d = [_row(l, "down_proj") for l in range(L)]

    def gather(self, layer: int, idx: np.ndarray):
        """idx [T, K] -> (gate [T,K,MI,H], up [T,K,MI,H], down [T,K,H,MI])
        host arrays in the checkpoint dtype (pages in only those experts)."""
        g = np.stack([[self._g[layer][e] for e in row] for row in idx])
        u = np.stack([[self._u[layer][e] for e in row] for row in idx])
        d = np.stack([[self._d[layer][e] for e in row] for row in idx])
        return g, u, d

    def layer_full(self, layer: int):
        """Full expert stacks (gate [E,MI,H], up, down [E,H,MI]) for one
        layer — the prefill stream (1.2 GB transient for the 30B)."""
        g = np.stack(self._g[layer])
        u = np.stack(self._u[layer])
        d = np.stack(self._d[layer])
        return g, u, d

    def preload(self) -> int:
        """Touch every expert page (the --moe-preload / madvise analog,
        qwen_asr_decoder.c:321-356).  Returns bytes touched."""
        total = 0
        for rows in (self._g, self._u, self._d):
            for layer in rows:
                for v in layer or ():
                    _ = v.reshape(-1)[:: max(1, 4096 // v.itemsize)].sum()
                    total += v.nbytes
        return total


def _topk_desc(scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest, sorted descending with ties broken by lower
    index — identical selection semantics to jax.lax.top_k."""
    return np.argsort(-scores, kind="stable")[:k].astype(np.int32)


def build_offload_fns(cfg: ModelConfig, tp: int = 1):
    """Jitted per-layer halves of the decoder layer.

    part1: attention half + post-norm + router scores (writes its layer's
           KV rows in place — the cache is donated).
    part2_gathered: expert mix from host-fetched top-k blocks (decode).
    part2_full: expert mix with the layer's full expert stack on device
           (prefill) — routes through the SAME _moe_ffn as the resident
           decoder (dense one-hot or capacity dispatch by E).
    """
    eps = cfg.rms_norm_eps
    D = cfg.dec_head_dim

    @functools.partial(jax.jit, donate_argnums=(2,))
    def part1(lp, h, kv_l, pos, valid_len):
        Tcap = h.shape[0]
        positions = pos + jnp.arange(Tcap)
        cos, sin = rope_tables(positions, D, cfg.rope_theta)
        wdt = wdtype(lp["wqkv"])
        h_attn, (k_rows, v_rows) = dec_mod._attn_block(
            lp, h.astype(jnp.float32), kv_l, cfg, cos, sin, pos, valid_len,
            jnp.int32(0), tp, wdt, kv_l.dtype, False, False)
        new_block = jnp.stack([k_rows, v_rows])          # [2, T, KH, D]
        kv_l = jax.lax.dynamic_update_slice(kv_l, new_block, (0, pos, 0, 0))
        xn = rms_norm(h_attn, lp["post_ln"], eps)
        scores = jnp.einsum("th,eh->te", xn, lp["router"],
                            preferred_element_type=jnp.float32)
        return h_attn, xn, scores, kv_l

    @jax.jit
    def part2_gathered(h_attn, xn, scores, idx, g, u, d):
        top_vals = jnp.take_along_axis(scores, idx, axis=1)   # [T, K]
        top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)
        if cfg.norm_topk_prob:
            top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
        wdt = g.dtype
        ffn = dec_mod.moe_apply_gathered(xn.astype(wdt), g, u, d, top_w, wdt)
        return h_attn + ffn

    @jax.jit
    def part2_full(h_attn, xn, router, g, u, d, valid):
        lp = {"router": router, "e_gate": g, "e_up": u, "e_down": d}
        return h_attn + dec_mod._moe_ffn(xn, lp, cfg, valid=valid)

    @jax.jit
    def part2_dense(h_attn, xn, w_gate_up, w_down):
        # mixed sparse_step > 1: dense interleave layers keep their FFN
        # weights RESIDENT (params.py w_gate_up/w_down) — same fused-SwiGLU
        # math as the resident decoder's dense branch
        lp = {"w_gate_up": w_gate_up, "w_down": w_down}
        ffn = dec_mod._dense_ffn(xn, lp, tp, wdtype(w_gate_up),
                                 "th,ih->ti", "ti,hi->th")
        return h_attn + ffn

    return part1, part2_gathered, part2_full, part2_dense


def offload_forward(layers_list: List[Dict[str, Any]], store: HostExpertStore,
                    cfg: ModelConfig, fns, embeds, start_pos: int,
                    valid_len: int, kv_list: List[jnp.ndarray],
                    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Layer-stack forward with host-streamed experts.

    embeds [Tcap, H]; kv_list: per-layer [2, Kcap, KH, D] caches (updated in
    place via donation).  Decode (Tcap == 1) fetches each layer's router
    scores to the host, gathers only the top-k experts' blocks and streams
    them up; prefill streams the full stack per layer.  Mixed
    decoder_sparse_step checkpoints dispatch per layer on store.is_moe:
    dense interleave layers run their RESIDENT fused-SwiGLU FFN (no host
    traffic, router scores ignored — the stacked router is zero there).
    Returns (hidden [Tcap, H] f32 pre-final-norm, kv_list).
    """
    part1, part2_gathered, part2_full, part2_dense = fns
    Tcap = embeds.shape[0]
    K = cfg.num_experts_per_tok
    decode = Tcap == 1
    pos = jnp.int32(start_pos)
    vlen = jnp.int32(valid_len)
    valid = jnp.arange(Tcap) < vlen

    h = embeds
    for li, lp in enumerate(layers_list):
        h_attn, xn, scores, kv_list[li] = part1(lp, h, kv_list[li], pos, vlen)
        if not store.is_moe[li]:
            h = part2_dense(h_attn, xn, lp["w_gate_up"], lp["w_down"])
        elif decode:
            s = np.asarray(jax.device_get(scores))[0]          # [E]
            idx = _topk_desc(s, K)[None, :]                    # [1, K]
            g, u, d = store.gather(li, idx)
            h = part2_gathered(h_attn, xn, scores, jnp.asarray(idx),
                               jnp.asarray(g), jnp.asarray(u), jnp.asarray(d))
        else:
            g, u, d = store.layer_full(li)
            h = part2_full(h_attn, xn, lp["router"], jnp.asarray(g),
                           jnp.asarray(u), jnp.asarray(d), valid)
    return h, kv_list
