"""int8 weight quantization (--q8, ops/quant.py).

The q8 path trades bounded quantization noise for ~1.7x decode bandwidth
and is OUTSIDE the bf16 token-parity contract; these tests pin
  (1) the machinery itself exactly (weights on the int8 x pow2-scale grid
      quantize losslessly, so any divergence would be a routing bug),
  (2) closeness + argmax agreement on the tiny random checkpoint,
  (3) every MoE formulation (decode gather / dense one-hot / capacity
      dispatch) under quantized expert stacks,
  (4) the batched serving path with quantized params.
"""

import dataclasses

import numpy as np
import pytest


def _grid_weight(rng, rows, cols, scale=2.0 ** -6):
    """Weights exactly on the int8 x 2^-6 grid with per-row max pinned to
    127*2^-6: quantize_weight recovers s = 2^-6 and the int8 values exactly
    (max|w|/127 = scale), so dequantization is lossless."""
    q = rng.integers(-127, 128, size=(rows, cols)).astype(np.float32)
    q[np.arange(rows), rng.integers(0, cols, size=rows)] = 127.0
    return q * scale


def test_quantize_roundtrip_exact():
    import jax.numpy as jnp

    from smolvision_tpu.ops.quant import proj, quantize_weight, wdtype

    rng = np.random.default_rng(0)
    w = _grid_weight(rng, 64, 48)
    qw = quantize_weight(jnp.asarray(w))
    assert qw.q.dtype == jnp.int8 and qw.s.dtype == jnp.float32
    assert wdtype(qw) == jnp.bfloat16
    # lossless dequantization on the grid
    deq = np.asarray(qw.q, np.float32) * np.asarray(qw.s)[:, None]
    np.testing.assert_array_equal(deq, w)

    # proj == the f32 reference matmul on bf16-representable activations
    x = jnp.asarray(rng.standard_normal((4, 48)).astype(np.float32))
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    got = np.asarray(proj("th,oh->to", x.astype(jnp.bfloat16), qw))
    expect = np.asarray(x) @ w.T
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_q8_engine_logits_close(tiny_model_dir, speech_like_audio):
    import jax.numpy as jnp

    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.engine import Engine

    e0 = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    e1 = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32,
                q8=True)
    from smolvision_tpu.ops.quant import QuantW
    assert isinstance(e1.dec_params["layers"]["wqkv"], QuantW)
    # tied embeddings share ONE int8 array
    assert e1.dec_params["lm_head"] is e1.dec_params["embed"]

    audio, n_audio = e0.encode(speech_like_audio)
    ids, astart = prompt_mod.build_asr_prompt(e0.cfg, n_audio, [], [], None)
    e0.reset_kv()
    l0, _ = e0.prefill_ids(ids, audio, astart, n_audio, greedy=False)
    audio1, n1 = e1.encode(speech_like_audio)
    assert n1 == n_audio
    e1.reset_kv()
    l1, _ = e1.prefill_ids(ids, audio1, astart, n1, greedy=False)
    l0 = np.asarray(l0)
    l1 = np.asarray(l1)
    cos = float(np.dot(l0, l1) / (np.linalg.norm(l0) * np.linalg.norm(l1)))
    assert cos > 0.999, cos
    assert int(np.argmax(l0)) == int(np.argmax(l1))

    # end-to-end greedy decode runs (embed gather + decode chunks under q8)
    text, _ = e1.transcribe_segment(speech_like_audio)
    assert isinstance(text, str)


def test_q8_moe_engine(tiny_moe_model_dir, speech_like_audio):
    import jax.numpy as jnp

    from smolvision_tpu.ops.quant import QuantW
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, q8=True)
    assert isinstance(eng.dec_params["layers"]["e_gate"], QuantW)
    text, _ = eng.transcribe_segment(speech_like_audio)  # gather path (T<=4)
    assert isinstance(text, str)


def _moe_fixture(rng, T, K, E, H, MI):
    import jax.numpy as jnp

    from smolvision_tpu.config import QWEN3_ASR_06B

    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=False)
    x = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    x = x.astype(jnp.bfloat16).astype(jnp.float32)  # bf16-representable
    lp = {
        "router": jnp.asarray(rng.standard_normal((E, H)).astype(np.float32)),
        "e_gate": jnp.asarray(np.stack([_grid_weight(rng, MI, H) for _ in range(E)])),
        "e_up": jnp.asarray(np.stack([_grid_weight(rng, MI, H) for _ in range(E)])),
        "e_down": jnp.asarray(np.stack([_grid_weight(rng, H, MI) for _ in range(E)])),
    }
    return cfg, x, lp


def _quant_lp(lp):
    from smolvision_tpu.ops.quant import quantize_weight

    qlp = dict(lp)
    for k in ("e_gate", "e_up", "e_down"):
        qlp[k] = quantize_weight(lp[k])
    return qlp


@pytest.mark.parametrize("T,E", [(1, 4), (32, 4), (32, 16)])
def test_q8_moe_matches_bf16_on_grid(T, E):
    """Grid-exact expert weights: the quantized MoE paths (decode gather at
    T=1, dense one-hot at E<16, capacity dispatch at E>=16) must match the
    plain path with bf16 weights — grid values are bf16-exact and the scale
    (2^-6) is a power of two, so the only difference is einsum scheduling.
    (The f32-weights path differs more: its activations skip the bf16 cast.)
    """
    import jax.numpy as jnp

    from smolvision_tpu.models import qwen3_decoder as dm

    rng = np.random.default_rng(7)
    cfg, x, lp = _moe_fixture(rng, T, K=2, E=E, H=32, MI=16)
    lp16 = {k: (v.astype(jnp.bfloat16) if k.startswith("e_") else v)
            for k, v in lp.items()}
    ref = np.asarray(dm._moe_ffn(x, lp16, cfg))
    got = np.asarray(dm._moe_ffn(x, _quant_lp(lp), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_q8_batched_path():
    """Quantized params flow through the batch-native serving decoder."""
    import jax.numpy as jnp

    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm
    from smolvision_tpu.models.params import quantize_decoder
    from smolvision_tpu.models.synthetic import synthetic_decoder

    cfg = dataclasses.replace(
        QWEN3_ASR_06B, dec_layers=2, dec_hidden=48, dec_heads=4,
        dec_kv_heads=2, dec_head_dim=16, dec_intermediate=96, vocab_size=512)
    params = synthetic_decoder(cfg, param_dtype=jnp.float32, seed=3)
    qparams = quantize_decoder(params)

    B, T, Kcap = 2, 8, 64
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (B, T)), jnp.int32)
    from smolvision_tpu.ops.quant import embed_rows
    embeds = embed_rows(qparams["embed"], ids)
    kv = dm.make_batched_kv(cfg, B, Kcap, jnp.float32)
    rope_start = jnp.zeros((B,), jnp.int32)
    kv_min = jnp.zeros((B,), jnp.int32)
    toks, kv = dm.batched_prefill(qparams, cfg, embeds, kv, rope_start, kv_min)
    buf, cnt, last, kv = dm.batched_decode_chunk(
        qparams, cfg, toks, jnp.int32(T), kv, 4, rope_start, kv_min)
    assert buf.shape == (B, 4)
    assert int(cnt) >= 0


def test_proj_int8_activation_gemm_path():
    """The q8 PREFILL fast path (int8 activations -> MXU int8xint8,
    ops/quant.proj): fires only at >= _ACTQ_MIN_M collapsed tokens, and
    is exact when both operands are already integer-valued (xs folds to
    1, pow2 weight scales are lossless)."""
    import jax.numpy as jnp
    import numpy as np

    from smolvision_tpu.ops import quant as q

    rng = np.random.default_rng(5)
    M, C, O = q._ACTQ_MIN_M, 64, 32
    # integer activations with EVERY row's max exactly 127 -> xs == 1
    # per row -> xq == x (the quant round-trip is the identity)
    x = rng.integers(-127, 128, (M, C)).astype(np.float32)
    x[:, 0] = 127.0
    # pow2-scaled integer weights quantize losslessly
    wq = rng.integers(-127, 128, (O, C)).astype(np.float32)
    w = q.QuantW(jnp.asarray(wq, jnp.int8), jnp.full((O,), 2.0, jnp.float32))

    got = np.asarray(q.proj("th,oh->to", jnp.asarray(x), w))
    want = (x @ wq.T) * 2.0
    np.testing.assert_array_equal(got, want)

    # below the threshold the dequant path runs (bf16 rounding differs
    # from the exact-int path almost surely on random inputs)
    small = np.asarray(q.proj("th,oh->to", jnp.asarray(x[: M // 2]), w))
    np.testing.assert_allclose(small, want[: M // 2], rtol=1e-2, atol=1e-2)

    # batched eq collapses and reshapes back
    xb = x.reshape(4, M // 4, C)
    got_b = np.asarray(q.proj("bth,oh->bto", jnp.asarray(xb), w))
    np.testing.assert_array_equal(got_b.reshape(M, O), want)

    # kill switch reverts to the dequant path
    import os

    os.environ["SMOLVISION_Q8_ACTQ"] = "0"
    try:
        off = np.asarray(q.proj("th,oh->to", jnp.asarray(x), w))
        np.testing.assert_allclose(off, want, rtol=1e-2, atol=1e-2)
    finally:
        os.environ.pop("SMOLVISION_Q8_ACTQ")


def test_proj_actq_min_override_and_lm_head_eq():
    """SMOLVISION_Q8_ACTQ_MIN lowers the int8-activation floor (the
    serving-ceiling decode experiment): at MIN=1 even an M=8 GEMM takes
    the int8xint8 path, and the "bh,vh->bv" lm_head eq is eligible."""
    import os

    import jax.numpy as jnp

    from smolvision_tpu.ops import quant as q

    rng = np.random.default_rng(9)
    M, C, O = 8, 64, 32
    x = rng.integers(-127, 128, (M, C)).astype(np.float32)
    x[:, 0] = 127.0
    wq = rng.integers(-127, 128, (O, C)).astype(np.float32)
    w = q.QuantW(jnp.asarray(wq, jnp.int8), jnp.full((O,), 2.0, jnp.float32))
    want = (x @ wq.T) * 2.0

    os.environ["SMOLVISION_Q8_ACTQ_MIN"] = "1"
    try:
        got = np.asarray(q.proj("th,oh->to", jnp.asarray(x), w))
        np.testing.assert_array_equal(got, want)   # exact on the int grid
        got_lm = np.asarray(q.proj("bh,vh->bv", jnp.asarray(x), w))
        np.testing.assert_array_equal(got_lm, want)
    finally:
        os.environ.pop("SMOLVISION_Q8_ACTQ_MIN")

    # default floor: both fall back to the dequant path at M=8
    small = np.asarray(q.proj("bh,vh->bv", jnp.asarray(x), w))
    np.testing.assert_allclose(small, want, rtol=1e-2, atol=1e-2)
