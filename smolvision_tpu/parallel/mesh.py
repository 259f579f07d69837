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
        # wqkv/w_gate_up shard their fused output axis on "model" — the
        # loader interleaves the fusion per TP rank (interleave_decoder_for_tp)
        # so each rank's contiguous slice is complete heads [q_r; k_r; v_r]
        # (resp. [gate_r; up_r]); the decoder's tp-aware split is shard-local
        "wqkv": row, "wo": col,
        "bqkv": _ns(mesh, None, MODEL_AXIS),
        "q_norm": rep, "k_norm": rep,
        "w_gate_up": row, "w_down": col,
        "router": rep,
        "e_gate": _ns(mesh, None, MODEL_AXIS, None, None),
        "e_up": _ns(mesh, None, MODEL_AXIS, None, None),
        "e_down": _ns(mesh, None, MODEL_AXIS, None, None),
        "moe_mask": rep,
    }
    return {
        "embed": _ns(mesh, MODEL_AXIS, None),
        "layers": layers,
        "final_norm": rep,
        "lm_head": _ns(mesh, MODEL_AXIS, None),
    }


def interleave_decoder_for_tp(params, cfg: ModelConfig, tp: int):
    """Permute the fused-output decoder weights for a tp-way "model" axis.

    The single-chip loader fuses QKV as [q; k; v] and the MLP as [gate; up]
    (models/params.py) — one big matmul per block.  Sharding those
    concatenated axes directly would split q/kv (or gate/up) unevenly across
    ranks, so for TP the rows are permuted per rank:
        [q_0; k_0; v_0; q_1; k_1; v_1; ...]   resp.   [gate_0; up_0; ...]
    where x_r is heads (channels) chunk r.  The decoder's tp-aware split
    (_split_qkv / _split_gate_up) restores the original order with
    shard-local reshapes, so the math — and therefore the emitted tokens —
    is independent of tp.  Fusion semantics per the reference's interleaved
    gate_up load (qwen_asr_decoder.c:140-152, qwen_asr_kernels.c:434-460).

    Returns a NEW params dict (wqkv/bqkv/w_gate_up replaced); call BEFORE
    shard_params.  tp must divide kv heads, q heads, and the intermediate.
    """
    if tp == 1:
        return params
    q_dim = cfg.dec_heads * cfg.dec_head_dim
    kv_dim = cfg.dec_kv_heads * cfg.dec_head_dim
    assert cfg.dec_heads % tp == 0 and cfg.dec_kv_heads % tp == 0, \
        f"tp={tp} must divide heads ({cfg.dec_heads}/{cfg.dec_kv_heads})"

    def perm(sizes):
        offs = np.concatenate([[0], np.cumsum(sizes)])
        idx = []
        for r in range(tp):
            for j, s in enumerate(sizes):
                blk = s // tp
                start = int(offs[j]) + r * blk
                idx.extend(range(start, start + blk))
        return np.asarray(idx, dtype=np.int32)

    import jax.numpy as jnp

    layers = dict(params["layers"])
    qkv_perm = jnp.asarray(perm([q_dim, kv_dim, kv_dim]))
    layers["wqkv"] = jnp.take(layers["wqkv"], qkv_perm, axis=1)
    if layers.get("bqkv") is not None:
        layers["bqkv"] = jnp.take(layers["bqkv"], qkv_perm, axis=1)
    if layers.get("w_gate_up") is not None:
        I = layers["w_gate_up"].shape[1] // 2
        assert I % tp == 0, f"tp={tp} must divide intermediate ({I})"
        gu_perm = jnp.asarray(perm([I, I]))
        layers["w_gate_up"] = jnp.take(layers["w_gate_up"], gu_perm, axis=1)
    return {**params, "layers": layers}


def batched_kv_sharding(mesh: Mesh, quant: bool = False):
    """KV cache [L, 2, B, KH, K, D]: batch over data, kv heads over model.
    quant=True returns the QuantKV pytree of shardings (scales [L,2,B,KH,K]
    shard the same axes, minus D)."""
    full = _ns(mesh, None, None, DATA_AXIS, MODEL_AXIS, None, None)
    if not quant:
        return full
    from smolvision_tpu.ops.quant import QuantKV

    return QuantKV(full, _ns(mesh, None, None, DATA_AXIS, MODEL_AXIS, None))


def batch_sharding(mesh: Mesh, rank: int):
    """Activations [B, ...]: batch over data, rest replicated."""
    return _ns(mesh, DATA_AXIS, *([None] * (rank - 1)))


def mesh_tp(mesh: Optional[Mesh]) -> int:
    """The tensor-parallel degree a mesh implies (1 for no mesh): the
    "model" axis size.  Schedulers key their jitted programs on this so a
    TP-interleaved+sharded engine gets the matching tp-aware fused-weight
    split inside the decoder."""
    if mesh is None:
        return 1
    return int(mesh.shape.get(MODEL_AXIS, 1))


def mesh_dp(mesh: Optional[Mesh]) -> int:
    """The data-parallel degree a mesh implies (1 for no mesh)."""
    if mesh is None:
        return 1
    return int(mesh.shape.get(DATA_AXIS, 1))


def shard_engine(engine, mesh: Mesh):
    """Move a loaded Engine onto `mesh` and enable the DP(xTP) scheduler
    paths (runtime/serving.py, runtime/multistream.py, batched segments):
    interleaves the fused decoder weights for the mesh's TP degree, shards
    them per decoder_shardings, replicates the encoder params, and sets
    engine.serving_mesh.  Every engine-resident array must live on the
    mesh — a jit may not mix single-device-committed and mesh-committed
    inputs.  Returns the engine.

    NOTE: only the BATCHED row-sharded paths are mesh-aware.  The solo
    single-stream jits are tp-unaware, so a tp>1 engine must not be driven
    through Engine.transcribe / the threaded multistream mode (the batched
    coordinators guard this)."""
    tp = mesh_tp(mesh)
    if tp > 1:
        engine.dec_params = interleave_decoder_for_tp(
            engine.dec_params, engine.cfg, tp)
    engine.dec_params = shard_params(
        engine.dec_params, decoder_shardings(engine.cfg, mesh))
    rep = _ns(mesh)
    engine.enc_params = jax.tree.map(
        lambda a: jax.device_put(a, rep), engine.enc_params)
    engine.serving_mesh = mesh
    # Encoder sequence parallelism (SURVEY §2.3 SP — the "optional
    # cross-chip window sharding"): encoder windows are HARD (no
    # cross-window attention, models/qwen3_encoder.py), so the batched
    # group encode shards its CLIP axis and the conv stem its chunk-block
    # axis over "data", partitioning the encoder collective-free — without
    # this a dp mesh computes the full encoder REPLICATED on every device.
    # Both shardings keep every per-clip/per-block shape identical, so
    # they are BITWISE-exact (tests/test_enc_sp.py); the solo flat-token
    # transformer is deliberately left replicated (sharding its token axis
    # changes GEMM tiling = f32 summation order, runtime/engine._build_jits
    # note).  dp>1 qwen3-family only: under a pure-TP mesh the constraint
    # is a no-op that would just trade the Pallas window kernel for the
    # XLA formulation (the batched SP path forces flash=False — GSPMD
    # cannot partition a pallas_call, it would all-gather and run it
    # replicated).
    engine._enc_sp_mesh = (mesh if mesh_dp(mesh) > 1
                           and engine.cfg.family != "q25" else None)
    # the batched-encode jit is cached on the engine without a mesh key;
    # drop it so the next group encode retraces with the SP constraint
    # (the _build_jits encoder jits retrace on their own: the resharded
    # params change their jit cache key)
    engine._batched_enc_jit = None
    return engine


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
