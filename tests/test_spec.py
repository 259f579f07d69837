"""Speculative int8-draft decoding (--spec, runtime/engine.py) must emit
EXACTLY the plain greedy sequence: every emitted token is the verify
forward's argmax over the true accepted prefix, so the draft quality can
only affect speed, never output.  On these f32 tiny checkpoints the int8
draft disagrees with the verify often, which exercises the
reject/partial-accept paths (acceptance is near 1.0 on the engineered
bench checkpoint — tools/probe notes)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spec_engines(tiny_model_dir):
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    plain = Engine(tiny_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32)
    spec = Engine(tiny_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32, spec=True)
    assert spec.spec and spec.dec_params_draft is not None
    return plain, spec


def _greedy_tokens(eng, audio, max_tokens):
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime import prompt as prompt_mod

    mel = log_mel(audio)
    enc, n_audio = eng.encode_mel(mel)
    ids, astart = prompt_mod.build_asr_prompt(
        eng.cfg, n_audio, eng._prompt_tokens, eng._force_tokens, None)
    eng.reset_kv()
    first, pos = eng.prefill_ids(ids, enc, astart, n_audio)
    out = []
    n = eng.decode_greedy(first, pos, max_tokens,
                          lambda t: (out.append(t) or True))
    return n, out


@pytest.mark.parametrize("max_tokens", [1, 5, 23, 48])
def test_spec_matches_plain_greedy(spec_engines, speech_like_audio, max_tokens):
    plain, spec = spec_engines
    ref = _greedy_tokens(plain, speech_like_audio, max_tokens)
    got = _greedy_tokens(spec, speech_like_audio, max_tokens)
    assert got == ref


def test_spec_draft_depths(spec_engines, speech_like_audio, monkeypatch):
    """Exactness must hold for every draft depth (the depth only changes
    how many positions share one verify pass)."""
    import smolvision_tpu.runtime.engine as eng_mod

    plain, spec = spec_engines
    ref = _greedy_tokens(plain, speech_like_audio, 17)
    for depth in (1, 2, 7):
        monkeypatch.setattr(eng_mod, "SPEC_DRAFT", depth)
        spec._spec_chunk_jit = None     # rebuild the chunk at this depth
        assert _greedy_tokens(spec, speech_like_audio, 17) == ref, depth
    spec._spec_chunk_jit = None


def test_spec_cli_thinker_stdout_identical(tiny_model_dir):
    """CLI-level contract: --spec must not change a greedy thinker
    transcript byte-for-byte (thinker emits EVERY token — no <asr_text>
    gate — so this comparison cannot pass vacuously)."""
    import os
    import subprocess
    import sys

    def run(extra):
        env = dict(os.environ, SMOLVISION_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "smolvision_tpu.cli", "-d", tiny_model_dir,
             "--thinker", "--text", "hello world", "--temperature", "0",
             "--max-tokens", "12", "--silent"] + extra,
            capture_output=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        return r.stdout

    assert run(["--spec"]) == run([])


def test_spec_moe_matches_plain(tiny_moe_model_dir, speech_like_audio):
    """Spec over the MoE decoder: the int8 draft routes through the
    quantized expert gather (qtake on QuantW stacks); exactness must hold."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    plain = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32)
    spec = Engine(tiny_moe_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32, spec=True)
    ref = _greedy_tokens(plain, speech_like_audio, 12)
    got = _greedy_tokens(spec, speech_like_audio, 12)
    assert got == ref


def test_spec_ignored_with_q8(tiny_model_dir):
    """--spec --q8 is contradictory (the draft IS the target): spec turns
    itself off rather than silently changing the q8 contract."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32,
                 kv_dtype=jnp.float32, q8=True, spec=True)
    assert not eng.spec


def test_spec_streaming_matches_plain(spec_engines):
    """--spec under --stream: the bounded per-chunk decodes run through
    decode_greedy's spec path while the stream machinery rolls back,
    reuses KV by prefix LCP, and prefills deltas OVER the unaccepted
    draft rows the last verify block left past the accepted position.
    Those garbage rows are never attended (position masks) and are
    overwritten as pos advances, so the stream transcript must be
    byte-identical to the plain engine's."""
    from smolvision_tpu.runtime import stream as stream_mod

    plain, spec = spec_engines
    rng = np.random.default_rng(21)
    sr = 16000
    t = np.arange(6 * sr) / sr
    clip = (0.3 * np.sin(2 * np.pi * 200 * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t))
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    outs = {}
    for tag, eng in (("plain", plain), ("spec", spec)):
        eng.segment_sec = 0.0
        eng.past_text_conditioning = True
        pieces = []
        eng.token_cb = lambda piece, _p=pieces: _p.append(piece)
        try:
            text = stream_mod.transcribe_stream(eng, clip)
        finally:
            eng.token_cb = None
            eng.past_text_conditioning = False
        outs[tag] = (text, b"".join(pieces))
    assert outs["spec"] == outs["plain"]


def test_spec_flag_toggle_matches_plain(spec_engines, speech_like_audio):
    """Toggling engine.spec OFF on a spec-initialized engine must reproduce
    the plain engine exactly (the flag is consulted per dispatch_and_fetch;
    the resident int8 draft stays unused).  This is the single-engine A/B
    methodology tools/probe_spec17.py relies on — two resident 1.7B engines
    OOM the chip, so the probe toggles one engine between arms."""
    plain, spec = spec_engines
    ref = _greedy_tokens(plain, speech_like_audio, 23)
    spec.spec = False
    try:
        off = _greedy_tokens(spec, speech_like_audio, 23)
    finally:
        spec.spec = True
    assert off == ref
    # and back on: still the exact spec==plain contract
    assert _greedy_tokens(spec, speech_like_audio, 23) == ref


def test_spec_mixed_moe_matches_plain(tiny_moe_mixed_model_dir,
                                      speech_like_audio):
    """Spec over the MIXED dense/MoE stack (decoder_sparse_step=2): the
    int8 draft must quantize and route BOTH layer kinds — dense layers'
    fused gate_up and sparse layers' expert stacks — and still verify to
    the plain engine's exact greedy tokens."""
    import jax.numpy as jnp

    from smolvision_tpu.runtime.engine import Engine

    plain = Engine(tiny_moe_mixed_model_dir, param_dtype=jnp.float32,
                   kv_dtype=jnp.float32)
    spec = Engine(tiny_moe_mixed_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32, spec=True)
    ref = _greedy_tokens(plain, speech_like_audio, 12)
    got = _greedy_tokens(spec, speech_like_audio, 12)
    assert got == ref
