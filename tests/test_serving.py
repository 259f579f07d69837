"""Continuous-batching serving (runtime/serving.py) must produce exactly the
one-shot batch results: admission/retirement, the per-row region_min masking
of late-admitted rows, and slot reuse may never change greedy tokens."""

import numpy as np
import pytest

from tests.workloads import serving_clips as _clips


@pytest.fixture(scope="module")
def srv_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    eng.max_tokens = 8
    return eng




def test_continuous_matches_one_shot(srv_engine):
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(5)
    one_shot = transcribe_segments_batched(eng, clips)
    cont = serve_continuous(eng, clips, slots=2)
    assert cont == one_shot


def test_continuous_single_wave(srv_engine):
    """slots >= clips: one admission wave, pure batched decode."""
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(3, seed=5)
    assert serve_continuous(eng, clips, slots=8) == \
        transcribe_segments_batched(eng, clips)


def test_continuous_slot_reuse_many_waves(srv_engine):
    """More clips than slots by 4x: retired slots are re-admitted with new
    prompts; late rows must not attend earlier rows' decode region."""
    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(8, seed=21)
    assert serve_continuous(eng, clips, slots=2) == \
        transcribe_segments_batched(eng, clips)


def test_pipelined_matches_legacy_schedule(srv_engine, monkeypatch):
    """SMOLVISION_SERVE_NO_PIPE3=1 reverts the round-3 pipelining (prefill-
    shadow encode, encode top-up, wave-boundary clock reset).  Scheduling
    must never change greedy tokens: uniform-length clips make every slot
    retire together, so the wave boundary actually exercises the clock
    reset on the pipelined side."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    rng = np.random.default_rng(77)
    t = np.arange(int(16000 * 1.1)) / 16000
    clips = [(0.3 * np.sin(2 * np.pi * (150 + 30 * i) * t)
              + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
             for i in range(6)]
    piped = serve_continuous(eng, clips, slots=2, encode_group=2)
    monkeypatch.setenv("SMOLVISION_SERVE_NO_PIPE3", "1")
    legacy = serve_continuous(eng, clips, slots=2, encode_group=2)
    assert piped == legacy


def test_upload_split_matches_combined(srv_engine, monkeypatch):
    """The two-stage encode queue (audio upload shadow-staged ahead of the
    encode dispatches, SMOLVISION_SERVE_NO_UPSPLIT toggles) is a pure
    re-schedule of identical device programs: greedy tokens must be
    byte-identical either way.  Forces the device-mel front end so the
    upload stage actually runs on CPU."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(6, seed=9)
    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "1")
    split = serve_continuous(eng, clips, slots=2, encode_group=3)
    monkeypatch.setenv("SMOLVISION_SERVE_NO_UPSPLIT", "1")
    combined = serve_continuous(eng, clips, slots=2, encode_group=3)
    assert split == combined


def test_prestaged_uploads_match_live(srv_engine, monkeypatch):
    """prestage_uploads + serve_continuous(prestaged=...) is the same device
    program fed the same bytes — greedy tokens must be byte-identical to the
    live-upload schedule.  (The prestaged path exists so bench can report the
    on-chip serving rate without the axon tunnel-upload artifact.)"""
    from smolvision_tpu.runtime.serving import prestage_uploads, serve_continuous

    eng = srv_engine
    clips = _clips(6, seed=5)
    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "1")
    live = serve_continuous(eng, clips, slots=2, encode_group=3)
    pre = prestage_uploads(eng, clips, encode_group=3)
    staged = serve_continuous(eng, clips, slots=2, encode_group=3,
                              prestaged=pre)
    assert staged == live


def test_prestaged_mismatch_rejected(srv_engine, monkeypatch):
    """A prestaged object built with different clips/encode_group must be
    rejected up front (silent mismatch would decode the wrong audio)."""
    import pytest as _pytest

    from smolvision_tpu.runtime.serving import prestage_uploads, serve_continuous

    eng = srv_engine
    clips = _clips(6, seed=5)
    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "1")
    pre = prestage_uploads(eng, clips, encode_group=3)
    with _pytest.raises(ValueError):
        serve_continuous(eng, clips, slots=2, encode_group=2, prestaged=pre)
    with _pytest.raises(ValueError):
        serve_continuous(eng, clips[:5], slots=2, encode_group=3,
                         prestaged=pre)


def test_standby_prefill_matches_boundary_prefill(srv_engine, monkeypatch):
    """Standby wave prefill (the next wave's group prefill dispatched in a
    decode-chunk shadow instead of at the wave boundary) is a pure
    re-schedule of the identical prefill program over identical inputs —
    greedy tokens must be byte-identical with it disabled."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(7, seed=21)
    on = serve_continuous(eng, clips, slots=2)
    monkeypatch.setenv("SMOLVISION_SERVE_NO_STANDBY", "1")
    off = serve_continuous(eng, clips, slots=2)
    assert on == off


def test_admit_cap_matches_full_wave(srv_engine):
    """admit_cap (the latency knob: bounded admission sub-waves) must be
    token-invisible — rows are independent under greedy decoding and
    sub-wave admission reuses the tested mid-flight admission machinery."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(7, seed=13)
    full = serve_continuous(eng, clips, slots=4)
    capped = serve_continuous(eng, clips, slots=4, admit_cap=2)
    assert capped == full
    lat = eng.perf.serving_latency
    assert lat["clips"] == 7 and lat["admit_ttft_p50_ms"] >= 0


def test_continuous_latency_percentiles(srv_engine):
    """serve_continuous records per-clip TTFT/completion percentiles on
    engine.perf (the serving analog of the upstream TTFT baseline,
    MODEL.md:466-468) — monotone, complete, and in milliseconds."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    serve_continuous(eng, _clips(6, seed=3), slots=2)
    lat = eng.perf.serving_latency
    assert lat is not None and lat["clips"] == 6
    assert 0 <= lat["ttft_p50_ms"] <= lat["ttft_p99_ms"]
    assert lat["ttft_p50_ms"] <= lat["done_p50_ms"] <= lat["done_p99_ms"]
    # admission->first-token (the per-request TTFT analog) is bounded by
    # the queue-wait-inclusive TTFT
    assert 0 <= lat["admit_ttft_p50_ms"] <= lat["admit_ttft_p99_ms"]
    assert lat["admit_ttft_p99_ms"] <= lat["ttft_p99_ms"] + 1e-6
    # steady-state variant (first admission wave excluded): present,
    # monotone, and computed over the expected population
    assert 0 <= lat["admit_ttft_steady_p50_ms"] <= lat["admit_ttft_steady_p99_ms"]
    assert lat["first_wave_clips"] == 2   # slots=2, 6 clips -> 2 in wave 1


def test_continuous_dp_mesh_matches_single_device(moe_visible_model_dir):
    """Data-parallel serving (engine.serving_mesh, runtime/serving.py): the
    big cache's slot axis shards over the 8-virtual-device "data" axis and
    every serving jit compiles to a GSPMD program — admission DUS into
    sharded slots, shared-clock decode chunks, retirement, a partial
    second-wave admit, and kv growth mid-wave (max_tokens > 2*DECODE_CHUNK
    forces grow_j + the sharding re-assert).  Texts must be byte-identical
    to the single-device run; the moe_visible checkpoint + forced language
    make that a real token-trace comparison (and route the MoE expert
    stacks through the mesh shardings)."""
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.parallel import mesh as mesh_mod
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    eng.max_tokens = 200            # > 2*DECODE_CHUNK: growth path fires
    assert eng.set_force_language("English")
    clips = _clips(10, seed=5)      # slots=8 -> wave 2 is a partial admit
    ref = serve_continuous(eng, clips, slots=8, encode_group=4)
    assert any(t for t in ref), "comparison vacuous"

    # pure-DP (8, 1) mesh; shard_engine moves every engine-resident array
    # onto the mesh (a jit may not mix single-device-committed and
    # mesh-committed inputs)
    mesh_mod.shard_engine(eng, mesh_mod.make_mesh(8, tp=1))
    got = serve_continuous(eng, clips, slots=8, encode_group=4)
    assert got == ref

    # DP x TP (4, 2): fused QKV/gate_up (and the MoE expert axis)
    # interleaved per TP rank then sharded on "model" (shard_engine does
    # both); the serving jits re-key on mesh_tp so the decoder's tp-aware
    # fused-weight split matches.  Texts must still be byte-identical.
    eng2 = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32)
    eng2.max_tokens = 200
    assert eng2.set_force_language("English")
    mesh_mod.shard_engine(eng2, mesh_mod.make_mesh(8, tp=2))
    got_tp = serve_continuous(eng2, clips, slots=8, encode_group=4)
    assert got_tp == ref, "DP x TP serving changed texts vs single-device"

    # + expert-parallel owner-compute (engine.serving_ep): the MoE FFN
    # dispatches tokens to shard-resident experts and psums, instead of
    # gathering expert weights across shards — must be token-invisible
    # (same contract the dryrun pins at the batch_mod level)
    eng2.serving_ep = True
    got_ep = serve_continuous(eng2, clips, slots=8, encode_group=4)
    assert got_ep == ref, "EP owner-compute serving changed texts"


def test_continuous_moe_matches_one_shot_nonvacuous(moe_visible_model_dir):
    """Continuous serving over the MoE decoder (slot admission + batched
    MoE decode), NON-vacuous via the shared moe_visible checkpoint +
    forced language."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = Engine(moe_visible_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    eng.max_tokens = 6
    assert eng.set_force_language("English")
    clips = _clips(5, seed=7)
    one_shot = transcribe_segments_batched(eng, clips)
    cont = serve_continuous(eng, clips, slots=2)
    assert cont == one_shot
    assert any(t for t in cont), "comparison vacuous"


def test_serve_chunk_depth_token_invariant(srv_engine):
    """engine.serve_chunk (the ceiling-sweep decode-chunk knob) changes
    scheduling granularity only — greedy tokens must be identical at any
    depth, and the jit cache must key on the depth."""
    from smolvision_tpu.runtime.serving import serve_continuous

    eng = srv_engine
    clips = _clips(5, seed=11)
    ref = serve_continuous(eng, clips, slots=2)
    try:
        eng.serve_chunk = 3   # forces several chunks per row at max_tokens=8
        got = serve_continuous(eng, clips, slots=2)
    finally:
        eng.serve_chunk = 0
    assert got == ref
