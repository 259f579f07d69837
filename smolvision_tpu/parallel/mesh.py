"""Device mesh + sharding layouts.

The reference is single-process CPU; its only parallelism is a pthread pool
(qwen_asr_kernels.c:34-153) and *sequential* independent segments in -S mode.
On TPU the equivalents are (SURVEY.md §2.3):
  * "data" mesh axis — segments/streams are embarrassingly parallel; batch
    them across chips (vmapped model + batch sharding),
  * "model" mesh axis — tensor-parallel sharding of the decoder (attention
    heads / MLP rows / vocab) for large variants, and expert-parallel MoE;
    XLA/GSPMD inserts the all-reduces over ICI from the shardings alone.

Everything here is plain NamedSharding over a Mesh: pick a mesh, annotate,
let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smolvision_tpu.config import ModelConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Mesh of shape (data, model).  tp defaults to the largest power of two
    <= 4 dividing the device count (v5e pods ride ICI within a slice)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    dp = n // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def decoder_shardings(cfg: ModelConfig, mesh: Mesh):
    """NamedSharding pytree matching models/params.load_decoder output.

    Tensor-parallel layout (Megatron-style, collectives inserted by GSPMD):
      wq/wk/wv: output rows (heads) sharded on "model",
      wo:       input columns sharded (psum after),
      MLP:      gate/up rows sharded, down columns sharded,
      embed/lm_head: vocab-sharded (argmax over shards is a tiny all-reduce),
      experts (MoE): expert axis sharded = expert parallelism,
      norms/biases: replicated.
    """
    rep = _ns(mesh)
    row = _ns(mesh, None, MODEL_AXIS, None)   # [L, out, in] -> shard out
    col = _ns(mesh, None, None, MODEL_AXIS)   # [L, out, in] -> shard in
    layers = {
        "input_ln": rep, "post_ln": rep,
        # wqkv/w_gate_up are output-fused: replicate rather than row-shard
        # (sharding the concatenated axis would split q/kv blocks unevenly;
        # a TP-aware interleaved fusion is a planned refinement)
        "wqkv": rep, "wo": col,
        "bqkv": rep,
        "q_norm": rep, "k_norm": rep,
        "w_gate_up": rep, "w_down": col,
        "router": rep,
        "e_gate": _ns(mesh, None, MODEL_AXIS, None, None),
        "e_up": _ns(mesh, None, MODEL_AXIS, None, None),
        "e_down": _ns(mesh, None, MODEL_AXIS, None, None),
    }
    return {
        "embed": _ns(mesh, MODEL_AXIS, None),
        "layers": layers,
        "final_norm": rep,
        "lm_head": _ns(mesh, MODEL_AXIS, None),
    }


def batched_kv_sharding(mesh: Mesh):
    """KV cache [L, 2, B, KH, K, D]: batch over data, kv heads over model."""
    return _ns(mesh, None, None, DATA_AXIS, MODEL_AXIS, None, None)


def batch_sharding(mesh: Mesh, rank: int):
    """Activations [B, ...]: batch over data, rest replicated."""
    return _ns(mesh, DATA_AXIS, *([None] * (rank - 1)))


def shard_params(params, template):
    """device_put a params dict onto a sharding template.

    Walks the dicts manually: params may contain None leaves (absent biases /
    MoE-vs-dense branches) where the template still has a sharding, and tied
    embed/lm_head must stay one buffer."""
    memo = {}

    def go(p, t):
        if p is None:
            return None
        if isinstance(p, dict):
            return {k: go(v, t[k]) for k, v in p.items()}
        key = id(p)
        if key not in memo:
            memo[key] = jax.device_put(p, t)
        return memo[key]

    return go(params, template)
