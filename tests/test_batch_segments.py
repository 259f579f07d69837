"""Batched segment decoding must produce the same tokens as sequential."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    eng.max_tokens = 8
    return eng


def _long_audio():
    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(6 * sr) / sr
    sig = (0.3 * np.sin(2 * np.pi * 180 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
           + 0.01 * rng.standard_normal(len(t)))
    sig[int(2.9 * sr) : int(3.1 * sr)] *= 0.01
    return sig.astype(np.float32)


def test_batched_matches_sequential(seg_engine):
    from smolvision_tpu.runtime import segment as segment_mod

    eng = seg_engine
    audio = _long_audio()
    eng.segment_sec = 2.0
    eng.search_sec = 0.5
    eng.past_text_conditioning = False

    eng.batch_segments = True
    batched = segment_mod.transcribe_audio(eng, audio)
    eng.batch_segments = False
    sequential = segment_mod.transcribe_audio(eng, audio)
    eng.batch_segments = True

    assert batched == sequential


def test_batched_segments_over_dp_mesh(seg_engine):
    """transcribe_segments_batched(mesh=...) — the serving wrapper's
    multi-chip DP path — must produce the same texts as the single-device
    call (8 virtual CPU devices, batch axis sharded over "data")."""
    import jax

    from smolvision_tpu.parallel import mesh as mesh_mod
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    eng = seg_engine
    rng = np.random.default_rng(17)
    segs = [(rng.standard_normal(12000 + 2000 * i) * 0.2).astype(np.float32)
            for i in range(8)]
    ref = transcribe_segments_batched(eng, segs)
    mesh = mesh_mod.make_mesh(8, tp=1)
    got = transcribe_segments_batched(eng, segs, mesh=mesh)
    assert got == ref


def test_batched_raw_tokens_match_per_segment(seg_engine):
    """Compare raw per-segment token ids batched vs engine.transcribe path."""
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime import prompt as prompt_mod
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched

    eng = seg_engine
    rng = np.random.default_rng(3)
    segs = [
        (rng.standard_normal(16000) * 0.2).astype(np.float32),
        (rng.standard_normal(24000) * 0.2).astype(np.float32),
        (rng.standard_normal(32000) * 0.2).astype(np.float32),
    ]
    texts = transcribe_segments_batched(eng, segs)
    assert len(texts) == 3
    for seg, text in zip(segs, texts):
        ref, _ = eng.transcribe_segment(seg)
        assert text == ref


def test_device_mel_batch_matches_host(seg_engine, monkeypatch):
    """Forced device-mel serving path (i16 upload + matmul-DFT) vs the
    host-mel batched path: mel agreement is ~1e-4 in normalized units, so
    greedy tokens should survive on the tiny checkpoint."""
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched

    eng = seg_engine
    rng = np.random.default_rng(5)
    segs = [(rng.standard_normal(16000 * (1 + i)) * 0.2).astype(np.float32)
            for i in range(3)]
    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "0")
    host_texts = transcribe_segments_batched(eng, segs)
    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "1")
    dev_texts = transcribe_segments_batched(eng, segs)
    assert dev_texts == host_texts


def test_log_mel_batch_jax_matches_host():
    import jax.numpy as jnp
    from smolvision_tpu.ops import mel as M

    rng = np.random.default_rng(9)
    clips = [(rng.standard_normal(16000 * n) * 0.3).astype(np.float32)
             for n in (1, 2)]
    frames = [M.num_frames(len(c)) for c in clips]
    fcap = ((max(frames) + 99) // 100) * 100
    pcap = fcap * M.HOP_LENGTH + M.N_FFT
    buf = np.zeros((2, pcap), np.float16)
    for b, c in enumerate(clips):
        p = M.reflect_pad(c)
        buf[b, : len(p)] = p.astype(np.float16)
    out = np.asarray(M.log_mel_batch_jax(
        jnp.asarray(buf), jnp.asarray(frames, jnp.int32), fcap))
    for b, c in enumerate(clips):
        ref = M.log_mel(c)
        got = out[b, :, : frames[b]]
        # f16 audio transfer: typical error is ~1e-4 in normalized-mel
        # units, but bins where the windowed DFT nearly cancels lose
        # relative precision (log10 amplifies) — bound the bulk tightly
        # and the cancelling tail loosely (0.05 ~ 0.2 dB on a near-silent
        # bin; the C reference's f32 naive DFT has the same failure mode)
        err = np.abs(got - ref)
        assert np.mean(err) < 1e-3
        assert np.max(err) < 5e-2


def test_batched_decode_chunk_contract(seg_engine):
    """Traced-step bound and all-rows-EOS early exit of the batched decode
    chunk: count == n_steps when rows keep decoding; count == 0 when every
    input token is already EOS; last_tokens == buf[:, count-1]."""
    import jax.numpy as jnp
    from smolvision_tpu.config import EOS_TOKEN_IDS
    from smolvision_tpu.models import qwen3_decoder as dm

    eng = seg_engine
    cfg = eng.cfg
    B, kcap, cap = 2, 64, 8
    kv = dm.make_batched_kv(cfg, B, kcap, jnp.float32)
    toks = jnp.asarray([3, 5], jnp.int32)
    z = jnp.zeros((B,), jnp.int32)

    buf, count, last, kv = dm.batched_decode_chunk(
        eng.dec_params, cfg, toks, jnp.int32(16), kv, cap, z, z,
        n_steps=jnp.int32(5))
    buf, count, last = map(np.asarray, (buf, count, last))
    assert count == 5
    assert np.all(buf[:, 5:] == 0)
    np.testing.assert_array_equal(last, buf[:, 4])

    eos = sorted(EOS_TOKEN_IDS)[0]
    toks_eos = jnp.full((B,), eos, jnp.int32)
    buf2, count2, last2, kv = dm.batched_decode_chunk(
        eng.dec_params, cfg, toks_eos, jnp.int32(16), kv, cap, z, z)
    assert int(count2) == 0
    np.testing.assert_array_equal(np.asarray(last2), np.asarray(toks_eos))


def test_length_sorted_subbatches_match_sequential(seg_engine, monkeypatch):
    """Mixed-duration batches split into length-sorted sub-batches; outputs
    must stay token-identical to the sequential engine and input-ordered."""
    import numpy as np

    from smolvision_tpu.runtime import batch_segments as bs

    eng = seg_engine
    rng = np.random.default_rng(9)
    # strongly mixed durations: 1 s vs 16 s prompts land in different
    # 128-buckets; tiny OVERHEAD forces the DP to split
    segs = [
        (rng.standard_normal(16000) * 0.2).astype(np.float32),
        (rng.standard_normal(16 * 16000) * 0.2).astype(np.float32),
        (rng.standard_normal(16000) * 0.2).astype(np.float32),
        (rng.standard_normal(16 * 16000) * 0.2).astype(np.float32),
    ]
    monkeypatch.setenv("SMOLVISION_SUBBATCH_OVERHEAD", "1")
    groups = bs._length_groups(eng, segs)
    assert len(groups) == 2
    assert sorted(sum(groups, [])) == [0, 1, 2, 3]

    texts = bs.transcribe_segments_batched(eng, segs)
    for seg, text in zip(segs, texts):
        ref, _ = eng.transcribe_segment(seg)
        assert text == ref


def test_same_length_segments_stay_one_group(seg_engine):
    import numpy as np

    from smolvision_tpu.runtime import batch_segments as bs

    rng = np.random.default_rng(10)
    segs = [(rng.standard_normal(16000) * 0.2).astype(np.float32)
            for _ in range(4)]
    assert bs._length_groups(seg_engine, segs) == [[0, 1, 2, 3]]


def test_cap_granularity_is_transparent(seg_engine, monkeypatch):
    """Prompt-cap granularity (64 vs the round-2 128 buckets,
    SMOLVISION_CAP128=1) only changes padding, never texts: pad rows are
    masked via kv_min/prompt_max, so both cap ladders must produce
    identical output on mixed-length segments."""
    from smolvision_tpu.runtime import batch_segments as bs

    eng = seg_engine
    rng = np.random.default_rng(11)
    segs = [(rng.standard_normal(16000 * (1 + i)) * 0.2).astype(np.float32)
            for i in range(3)]
    monkeypatch.delenv("SMOLVISION_CAP128", raising=False)
    cap64 = bs.transcribe_segments_batched(eng, segs)
    monkeypatch.setenv("SMOLVISION_CAP128", "1")
    cap128 = bs.transcribe_segments_batched(eng, segs)
    assert cap128 == cap64


def test_upload_audio_fits_exact_chunk_multiple(seg_engine):
    """A clip whose frame count is an exact conv-bucket multiple while
    n % HOP != 0 makes len(reflect_pad) > pcap; the row copy must truncate
    the (unused) tail instead of overflowing (broadcast ValueError)."""
    from smolvision_tpu.ops.mel import HOP_LENGTH, num_frames
    from smolvision_tpu.runtime.batch_segments import _upload_audio

    chunk = seg_engine.cfg.enc_chunk_size
    n = 2 * chunk * HOP_LENGTH + 1  # frames = 2*chunk exactly, n % HOP = 1
    assert num_frames(n) % (2 * chunk) == 0 and n % HOP_LENGTH != 0
    clips = [np.zeros(n, np.float32), np.zeros(n // 2, np.float32)]
    buf, frames, fcap = _upload_audio(seg_engine, clips)
    assert buf.shape[0] == 2 and frames[0] == 2 * chunk


def test_batched_segments_moe_matches_sequential_nonvacuous(
        moe_visible_model_dir):
    """Batched segments over the MoE decoder (the batch-native capacity-
    dispatch prefill + gather decode), NON-vacuous: force_language opens
    the <asr_text> gate and the moe_visible checkpoint keeps greedy
    trajectories on visible full-vocab pieces, so text equality IS
    token-trace equality."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    eng.max_tokens = 8
    assert eng.set_force_language("English")
    rng = np.random.default_rng(9)
    segs = [(rng.standard_normal(16000 * (1 + i)) * 0.2).astype(np.float32)
            for i in range(3)]
    texts = transcribe_segments_batched(eng, segs)
    refs = [eng.transcribe_segment(s)[0] for s in segs]
    assert texts == refs
    assert any(t for t in texts), "gate never opened: comparison vacuous"


def test_batched_segments_sharded_engine_pads_to_mesh(tiny_model_dir):
    """A fully mesh-sharded engine (parallel/mesh.shard_engine) must run
    one-shot batched segments at ANY group size: mesh defaults to
    engine.serving_mesh and the group pads its row axis up to a data-axis
    multiple (pad rows duplicate the last clip; their texts are dropped).
    Regression: a 3-clip group on an (8,1) mesh previously crashed with
    'dimension 2 should be divisible by 8'."""
    import jax.numpy as jnp

    from smolvision_tpu.parallel import mesh as mesh_mod
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.engine import Engine

    def mk():
        e = Engine(tiny_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32)
        e.max_tokens = 6
        return e

    rng = np.random.default_rng(23)
    segs = [(rng.standard_normal(16000) * 0.2).astype(np.float32)
            for _ in range(3)]          # one group of 3: 3 % 8 != 0
    ref = transcribe_segments_batched(mk(), segs)
    eng = mesh_mod.shard_engine(mk(), mesh_mod.make_mesh(8, tp=1))
    got = transcribe_segments_batched(eng, segs)   # mesh from serving_mesh
    assert got == ref
