"""Tensor-parallel interleaved fusion: tokens must be independent of tp.

The loader interleaves the fused QKV / gate_up output axes per TP rank
(parallel/mesh.interleave_decoder_for_tp) so they shard cleanly on the
"model" mesh axis; the decoder's tp-aware split restores original head /
channel order.  These tests pin:
  * the pure layout identity (single device, no mesh): tp-interleaved
    weights + tp-aware split produce BIT-identical hidden states/logits,
  * end-to-end on the 8-virtual-device CPU mesh: greedy tokens from
    batched prefill + decode chunk are identical at tp = 1 / 2 / 4.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import QWEN3_ASR_06B
from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.models.synthetic import synthetic_decoder
from smolvision_tpu.parallel import batch as batch_mod
from smolvision_tpu.parallel import mesh as mesh_mod

CFG = dataclasses.replace(
    QWEN3_ASR_06B, dec_hidden=128, dec_layers=2, dec_heads=16,
    dec_kv_heads=8, dec_head_dim=16, dec_intermediate=256, vocab_size=2048)


def test_interleave_split_is_identity_single_device():
    """tp-interleaved weights + tp-aware split == plain fusion, bitwise."""
    params = synthetic_decoder(CFG, param_dtype=jnp.float32, seed=0)
    T, Kcap = 8, 64
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((T, CFG.dec_hidden)).astype(np.float32))
    kv = dec_mod.make_kv_cache(CFG, Kcap, jnp.float32)

    ref_h, ref_kv = dec_mod.decoder_forward(
        params, CFG, embeds, jnp.int32(0), jnp.int32(T), kv)
    for tp in (2, 4, 8):
        p_tp = mesh_mod.interleave_decoder_for_tp(params, CFG, tp)
        h, kv_out = dec_mod.decoder_forward(
            p_tp, CFG, embeds, jnp.int32(0), jnp.int32(T), kv, tp=tp)
        np.testing.assert_array_equal(np.asarray(h), np.asarray(ref_h))
        np.testing.assert_array_equal(np.asarray(kv_out), np.asarray(ref_kv))


def test_interleave_preserves_bqkv_and_gate_up():
    """Biased-QKV (Q25 family) weights interleave consistently too."""
    cfg = dataclasses.replace(CFG, dec_qkv_bias=True, dec_qk_norm=False)
    params = synthetic_decoder(cfg, param_dtype=jnp.float32, seed=3)
    assert params["layers"]["bqkv"] is not None
    T, Kcap = 4, 64
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.standard_normal((T, cfg.dec_hidden)).astype(np.float32))
    kv = dec_mod.make_kv_cache(cfg, Kcap, jnp.float32)
    ref_h, _ = dec_mod.decoder_forward(
        params, cfg, embeds, jnp.int32(0), jnp.int32(T), kv)
    p_tp = mesh_mod.interleave_decoder_for_tp(params, cfg, 2)
    h, _ = dec_mod.decoder_forward(
        p_tp, cfg, embeds, jnp.int32(0), jnp.int32(T), kv, tp=2)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(ref_h))


def _run_meshed(tp: int, n_devices: int = 8):
    """Batched prefill + 4-step greedy decode on a (dp, tp) mesh."""
    mesh = mesh_mod.make_mesh(n_devices, tp=tp)
    params = synthetic_decoder(CFG, param_dtype=jnp.float32, seed=7)
    params = mesh_mod.interleave_decoder_for_tp(params, CFG, tp)
    shardings = mesh_mod.decoder_shardings(CFG, mesh)

    B, Tcap, Kcap, steps = 8, 16, 64, 4  # B divisible by dp = 8/4/2
    rng = np.random.default_rng(11)
    embeds_np = rng.standard_normal((B, Tcap, CFG.dec_hidden)).astype(np.float32)

    with mesh:
        params = mesh_mod.shard_params(params, shardings)
        kv = jax.device_put(
            batch_mod.make_batched_kv(CFG, B, Kcap, jnp.float32),
            mesh_mod.batched_kv_sharding(mesh))
        embeds = jax.device_put(jnp.asarray(embeds_np),
                                mesh_mod.batch_sharding(mesh, 3))
        zeros = jax.device_put(jnp.zeros((B,), jnp.int32),
                               mesh_mod.batch_sharding(mesh, 1))
        prefill = jax.jit(lambda p, e, k, rs, km: batch_mod.batched_prefill(
            p, CFG, e, k, rope_start=rs, kv_min=km, tp=tp))
        tokens, kv = prefill(params, embeds, kv, zeros, zeros)
        decode = jax.jit(lambda p, t, pos, k: batch_mod.batched_decode_chunk(
            p, CFG, t, pos, k, steps, tp=tp))
        buf, count, last, kv = decode(params, tokens, jnp.int32(Tcap), kv)
        return np.asarray(tokens), np.asarray(buf)


def test_tokens_identical_across_tp_degrees():
    tok1, buf1 = _run_meshed(tp=1)
    for tp in (2, 4):
        tok, buf = _run_meshed(tp=tp)
        np.testing.assert_array_equal(tok, tok1)
        np.testing.assert_array_equal(buf, buf1)
