"""int8 KV cache (--kv8, ops/quant.py QuantKV) — the batched decode paths'
bandwidth lever (docs/SERVING_ROOFLINE.md, docs/MULTISTREAM.md).

kv8 is OUTSIDE the bf16 token-parity contract, so these tests pin what IS
guaranteed:
  * the quantization machinery itself is exact on lossless-by-construction
    rows (integer values, power-of-two scales) — same trick as test_q8.py;
  * attention with a losslessly-quantized cache bit-matches the plain-cache
    attention (scales are powers of two, so score/prob folding is exact);
  * the serving scheduler == one-shot batch equivalence contract holds
    UNDER kv8 (both paths run the identical quantized math);
  * cache plumbing (grow, admit, row compaction) preserves QuantKV.
"""

import numpy as np
import pytest

from tests.workloads import serving_clips as _clips


def _lossless_rows(rng, shape):
    """f32 rows whose per-row int8 quantization is exact: integer levels in
    [-127, 127] scaled by a power of two, with max |level| pinned at 127."""
    levels = rng.integers(-127, 128, size=shape).astype(np.float32)
    levels[..., 0] = 127.0 * np.sign(levels[..., 0] + 0.5)  # pin the max
    return levels * (2.0 ** -3)


def test_quantize_kv_rows_lossless_roundtrip():
    from smolvision_tpu.ops.quant import quantize_kv_rows

    rng = np.random.default_rng(0)
    x = _lossless_rows(rng, (3, 5, 16))
    qkv = quantize_kv_rows(x)
    assert qkv.q.dtype == np.int8 and qkv.s.shape == (3, 5)
    back = np.asarray(qkv.q, np.float32) * np.asarray(qkv.s)[..., None]
    np.testing.assert_array_equal(back, x)


def test_quantize_kv_rows_error_bound():
    from smolvision_tpu.ops.quant import quantize_kv_rows

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    qkv = quantize_kv_rows(x)
    back = np.asarray(qkv.q, np.float32) * np.asarray(qkv.s)[..., None]
    # round-to-nearest: |err| <= scale/2 per element
    bound = np.asarray(qkv.s)[..., None] * 0.5 + 1e-7
    assert np.all(np.abs(back - x) <= bound)


def test_batched_attention_kv8_exact_on_lossless():
    """With power-of-two row scales, folding scales into scores (K) and
    probabilities (V) is bit-exact vs the plain f32 cache on CPU."""
    import jax.numpy as jnp

    from smolvision_tpu.config import ModelConfig
    from smolvision_tpu.models.qwen3_decoder import (
        _batched_attention_two_part,
    )
    from smolvision_tpu.ops.quant import quantize_kv_rows

    cfg = ModelConfig(dec_hidden=64, dec_layers=2, dec_heads=4,
                      dec_kv_heads=2, dec_head_dim=16, dec_intermediate=96)
    B, T, H, D = 2, 1, cfg.dec_heads, cfg.dec_head_dim
    KH, K = cfg.dec_kv_heads, 32
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.float32)
    kc = jnp.asarray(_lossless_rows(rng, (B, KH, K, D)), jnp.float32)
    vc = jnp.asarray(_lossless_rows(rng, (B, KH, K, D)), jnp.float32)
    start = jnp.int32(K - 4)
    kv_min = jnp.zeros((B,), jnp.int32)

    plain = _batched_attention_two_part(q, k_new, v_new, kc, vc, start, cfg,
                                        kv_min)
    quant = _batched_attention_two_part(q, k_new, v_new,
                                        quantize_kv_rows(kc),
                                        quantize_kv_rows(vc), start, cfg,
                                        kv_min)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(quant))


@pytest.fixture(scope="module")
def kv8_engine(tiny_model_dir):
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, kv8=True)
    eng.max_tokens = 8
    return eng




def test_batched_cache_is_quantized(kv8_engine):
    import jax.numpy as jnp

    from smolvision_tpu.ops.quant import QuantKV
    from smolvision_tpu.parallel import batch as pbatch

    kv = pbatch.make_batched_kv(kv8_engine.cfg, 2, 64,
                                kv8_engine.batched_kv_dtype)
    assert isinstance(kv, QuantKV)
    assert kv.dtype == jnp.int8 and kv.shape[4] == 64
    assert kv.s.shape == kv.q.shape[:-1]


def test_serving_matches_one_shot_under_kv8(kv8_engine):
    """The admission/retirement scheduler and the one-shot batch run the
    same quantized math — their equivalence contract survives kv8.
    Slot reuse + mid-flight admission exercise admit/grow on QuantKV."""
    from smolvision_tpu.runtime.batch_segments import (
        transcribe_segments_batched,
    )
    from smolvision_tpu.runtime.serving import serve_continuous

    clips = _clips(5)
    one_shot = transcribe_segments_batched(kv8_engine, clips)
    assert serve_continuous(kv8_engine, clips, slots=2) == one_shot


def test_kv_grow_and_gather_preserve_quant():
    import jax.numpy as jnp

    from smolvision_tpu.ops.quant import (QuantKV, kv_grow_k, kv_rows_gather,
                                          kv_zeros, quantize_kv_rows)

    rng = np.random.default_rng(3)
    kv = kv_zeros((2, 2, 4, 2, 8, 16), jnp.int8)
    rows = quantize_kv_rows(rng.standard_normal((2, 2, 4, 2, 8, 16))
                            .astype(np.float32))
    from smolvision_tpu.ops.quant import kv_dus

    kv = kv_dus(kv, rows, (0, 0, 0, 0, 0, 0))
    grown = kv_grow_k(kv, 16)
    assert isinstance(grown, QuantKV)
    assert grown.q.shape[4] == 16 and grown.s.shape[4] == 16
    np.testing.assert_array_equal(np.asarray(grown.q[..., :8, :]),
                                  np.asarray(kv.q))
    np.testing.assert_array_equal(np.asarray(grown.s[..., :8]),
                                  np.asarray(kv.s))

    picked = kv_rows_gather(kv, (3, 1))
    assert picked.q.shape[2] == 2
    np.testing.assert_array_equal(np.asarray(picked.q[:, :, 0]),
                                  np.asarray(kv.q[:, :, 3]))
    np.testing.assert_array_equal(np.asarray(picked.s[:, :, 1]),
                                  np.asarray(kv.s[:, :, 1]))


def test_multistream_kv8_smoke(tiny_model_dir):
    """The batched coordinator end-to-end under kv8: rounds, KV reuse,
    delta prefill, decode, row compaction — runs and yields per-session
    transcripts with the same structure as bf16."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.multistream import run_streams_batched

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, kv8=True)
    eng.max_tokens = 64
    rng = np.random.default_rng(7)
    srcs = [(0.2 * rng.standard_normal(int(16000 * 1.5))).astype(np.float32)
            for _ in range(3)]
    res = run_streams_batched(eng, srcs)
    assert len(res) == 3
    for r in res:
        assert isinstance(r, str)


def test_serving_matches_one_shot_under_kv8_moe(moe_visible_model_dir):
    """kv8 + MoE: the quantized batched cache must plumb through the MoE
    decode (capacity-dispatch prefill + expert gather) identically in the
    scheduler and the one-shot batch.  NON-vacuous: forced language + the
    moe_visible checkpoint make the compared transcripts real token
    traces (an earlier version compared ['']*5 == ['']*5)."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, kv8=True)
    eng.max_tokens = 6
    assert eng.set_force_language("English")
    clips = _clips(5, seed=3)
    one_shot = transcribe_segments_batched(eng, clips)
    assert serve_continuous(eng, clips, slots=2) == one_shot
    assert any(t for t in one_shot), "comparison vacuous"


def test_kv8_dp_mesh_serving_matches_single_device(moe_visible_model_dir):
    """QuantKV under the DP serving mesh: the quantized cache's int8 rows
    AND its per-row scales shard over the 8-virtual-device "data" axis
    (parallel/mesh.batched_kv_sharding quant=True), through admission DUS,
    decode chunks, and kv growth.  Texts must be identical to the unsharded
    kv8 run (kv8 vs kv8 — kv8 itself is outside the bf16 parity contract).
    NON-vacuous via forced language + the moe_visible checkpoint."""
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.parallel import mesh as mesh_mod
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import serve_continuous

    def mk():
        e = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32, kv8=True)
        e.max_tokens = 8
        assert e.set_force_language("English")
        return e

    clips = _clips(10, seed=11)      # slots=8 -> partial second wave
    ref = serve_continuous(mk(), clips, slots=8, encode_group=4)
    assert any(t for t in ref), "comparison vacuous"

    eng = mesh_mod.shard_engine(mk(), mesh_mod.make_mesh(8, tp=1))
    got = serve_continuous(eng, clips, slots=8, encode_group=4)
    assert got == ref, "DP-sharded kv8 serving changed texts"


def test_kv8_dp_mesh_multistream_matches_single_device(tiny_model_dir,
                                                       monkeypatch):
    """QuantKV under the DP multistream mesh (run_streams_batched's
    quant-aware batched_kv_sharding): raw per-chunk tokens identical to
    the unsharded kv8 coordinator run."""
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.parallel import mesh as mesh_mod
    from smolvision_tpu.runtime import multistream as ms
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    def mk():
        e = Engine(tiny_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32, kv8=True)
        e.stream_max_new_tokens = 6
        e.max_tokens = 16
        return e

    log = []
    orig = stream_mod.StreamState.finish_chunk

    def spy(self, w, chunk_tokens, n_generated, decode_ms):
        log.append(list(chunk_tokens))
        return orig(self, w, chunk_tokens, n_generated, decode_ms)

    monkeypatch.setattr(stream_mod.StreamState, "finish_chunk", spy)

    rng = np.random.default_rng(13)
    srcs = [(0.25 * np.sin(2 * np.pi * (130 + 40 * i)
                           * np.arange((2 + i) * 16000) / 16000.0)
             + 0.02 * rng.standard_normal((2 + i) * 16000))
            .astype(np.float32) for i in range(3)]
    log.clear()
    ms.run_streams_batched(mk(), srcs)
    ref = list(log)
    assert any(ref), "no chunks decoded: vacuous"

    eng = mesh_mod.shard_engine(mk(), mesh_mod.make_mesh(8, tp=1))
    log.clear()
    ms.run_streams_batched(eng, srcs)
    assert list(log) == ref, "DP-sharded kv8 multistream changed tokens"
