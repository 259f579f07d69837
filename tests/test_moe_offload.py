"""Host-offload MoE expert streaming (models/moe_offload.py, --moe-offload).

Plan B of docs/MOE_30B_PLAN.md: experts live on host mmap and stream per
layer.  The offload path reuses the resident decoder's _attn_block /
moe_apply_gathered / _moe_ffn, so outputs must match the resident engine —
these tests pin that equivalence end-to-end on the tiny MoE checkpoint.
Reference capability being covered: qwen_asr_decoder.c:321-451 (mmap expert
paging + --moe-preload).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engines(tiny_moe_model_dir):
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    res = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    off = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, moe_offload=True)
    return res, off


def test_offload_engine_setup(engines):
    _, off = engines
    assert off.moe_offload
    assert off.dec_params["layers"]["e_gate"] is None       # not resident
    assert off.expert_store is not None
    assert not off.batch_segments
    touched = off.expert_store.preload()
    assert touched > 0


def test_offload_prefill_logits_match(engines, speech_like_audio):
    from smolvision_tpu.runtime import prompt as prompt_mod

    res, off = engines
    audio, n_audio = res.encode(speech_like_audio)
    ids, astart = prompt_mod.build_asr_prompt(res.cfg, n_audio, [], [], None)

    res.reset_kv()
    l0, _ = res.prefill_ids(ids, audio, astart, n_audio, greedy=False)
    off.reset_kv()
    l1, _ = off.prefill_ids(ids, audio, astart, n_audio, greedy=False)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)


def test_offload_greedy_decode_matches(engines, speech_like_audio):
    """Same greedy token sequence from both engines (prefill + decode steps,
    covering the per-layer host gather path)."""
    from smolvision_tpu.runtime import prompt as prompt_mod

    res, off = engines
    seqs = []
    for eng in (res, off):
        audio, n_audio = eng.encode(speech_like_audio)
        ids, astart = prompt_mod.build_asr_prompt(eng.cfg, n_audio, [], [], None)
        eng.reset_kv()
        first, pos = eng.prefill_ids(ids, audio, astart, n_audio)
        got = []

        def on_token(tid, got=got):
            got.append(tid)
            return len(got) < 12

        eng.decode_greedy(first, pos, 16, on_token)
        seqs.append(got)
    assert seqs[0] == seqs[1], seqs


def test_offload_kv_reuse_matches(engines, speech_like_audio):
    """Streaming-style delta prefill (prefill_with_reuse) equivalence."""
    from smolvision_tpu.runtime import prompt as prompt_mod

    res, off = engines
    audio, n_audio = res.encode(speech_like_audio)
    ids, astart = prompt_mod.build_asr_prompt(res.cfg, n_audio, [], [], None)
    ext = list(ids) + [100, 200, 300]

    outs = []
    for eng in (res, off):
        eng.reset_kv()
        eng.prefill_ids(ids, audio, astart, n_audio, greedy=False)
        out, total = eng.prefill_with_reuse(ext, audio, astart, n_audio,
                                            reused=len(ids), greedy=False)
        assert total == len(ext)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_offload_thinker_greedy_matches(engines):
    res, off = engines
    texts = []
    for eng in (res, off):
        eng.temperature = 0.0
        eng.thinker_max_tokens = 10
        texts.append(eng.thinker_generate(None, "hello there"))
    assert texts[0] == texts[1]


def test_offload_thinker_sampled_runs(engines):
    """Sampled thinker through the host-side per-token loop (reproducible
    seed; just pin that it runs and is deterministic given the seed)."""
    _, off = engines
    off.temperature = 0.7
    off.top_k = 8
    off.seed = 123
    off.thinker_max_tokens = 8
    a = off.thinker_generate(None, "hi")
    b = off.thinker_generate(None, "hi")
    assert a == b


def test_offload_transcribe_segment_matches(engines, speech_like_audio):
    res, off = engines
    t0, n0 = res.transcribe_segment(speech_like_audio)
    t1, n1 = off.transcribe_segment(speech_like_audio)
    assert (t0, n0) == (t1, n1)


def test_offload_with_q8(tiny_moe_model_dir, speech_like_audio):
    """--moe-offload composes with --q8: resident weights quantize, experts
    stay in the host store (checkpoint dtype), the gathered-block einsum
    path takes plain arrays."""
    import jax.numpy as jnp

    from smolvision_tpu.ops.quant import QuantW
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, moe_offload=True, q8=True)
    assert eng.moe_offload and eng.q8
    # the HOT PATH (per-layer offload list) carries the int8 weights; the
    # stacked [L, ...] copies are dropped so nothing is resident twice
    assert isinstance(eng._dec_layers_list[0]["wqkv"], QuantW)
    assert isinstance(eng._dec_layers_list[0]["wo"], QuantW)
    assert eng.dec_params["layers"]["wqkv"] is None
    assert eng.dec_params["layers"]["e_gate"] is None
    assert isinstance(eng.dec_params["lm_head"], QuantW)
    text, _ = eng.transcribe_segment(speech_like_audio)
    assert isinstance(text, str)


@pytest.fixture(scope="module")
def mixed_engines(tiny_moe_mixed_model_dir):
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    res = Engine(tiny_moe_mixed_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    off = Engine(tiny_moe_mixed_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, moe_offload=True)
    return res, off


def test_mixed_offload_setup(mixed_engines):
    """Mixed decoder_sparse_step composes with --moe-offload (round-3
    VERDICT Next #5): MoE layers stream from the host store, dense
    interleave layers keep a RESIDENT fused FFN."""
    _, off = mixed_engines
    assert off.moe_offload
    store = off.expert_store
    assert any(store.is_moe) and not all(store.is_moe)
    # dense layers have no host expert rows; MoE layers do
    for li, moe in enumerate(store.is_moe):
        assert (store._g[li] is not None) == moe
    # resident per-layer slices carry the dense interleave weights
    assert "w_gate_up" in off._dec_layers_list[0]
    assert off.dec_params["layers"]["e_gate"] is None
    assert store.preload() > 0


def test_mixed_offload_greedy_decode_matches(mixed_engines, speech_like_audio):
    """Offload-vs-resident token identity on the mixed checkpoint: covers
    the host gather path (MoE layers) AND the resident dense branch
    (interleave layers) in one decode."""
    from smolvision_tpu.runtime import prompt as prompt_mod

    res, off = mixed_engines
    seqs = []
    for eng in (res, off):
        audio, n_audio = eng.encode(speech_like_audio)
        ids, astart = prompt_mod.build_asr_prompt(eng.cfg, n_audio, [], [], None)
        eng.reset_kv()
        first, pos = eng.prefill_ids(ids, audio, astart, n_audio)
        got = []

        def on_token(tid, got=got):
            got.append(tid)
            return len(got) < 12

        eng.decode_greedy(first, pos, 16, on_token)
        seqs.append(got)
    assert seqs[0] == seqs[1], seqs


def test_mixed_offload_prefill_logits_match(mixed_engines, speech_like_audio):
    from smolvision_tpu.runtime import prompt as prompt_mod

    res, off = mixed_engines
    audio, n_audio = res.encode(speech_like_audio)
    ids, astart = prompt_mod.build_asr_prompt(res.cfg, n_audio, [], [], None)
    res.reset_kv()
    l0, _ = res.prefill_ids(ids, audio, astart, n_audio, greedy=False)
    off.reset_kv()
    l1, _ = off.prefill_ids(ids, audio, astart, n_audio, greedy=False)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)


def test_mixed_offload_thinker_greedy_matches(mixed_engines):
    res, off = mixed_engines
    texts = []
    for eng in (res, off):
        eng.temperature = 0.0
        eng.thinker_max_tokens = 10
        texts.append(eng.thinker_generate(None, "hello there"))
    assert texts[0] == texts[1]
