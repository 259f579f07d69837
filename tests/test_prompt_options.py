"""Prompt options vs the oracle: forced language, system prompt, past text."""

import numpy as np
import pytest
import torch

from smolvision_tpu.config import TOKEN_ASR_TEXT, detect_config
from smolvision_tpu.io.safetensors import MultiSafetensors
from smolvision_tpu.ops.mel import log_mel
from smolvision_tpu.runtime import prompt as prompt_mod

from tests.oracle import oracle_transcribe_tokens


@pytest.fixture(scope="module")
def opt_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    return Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)


def _engine_tokens(eng, mel, past_tokens=None, max_tokens=10):
    audio, n_audio = eng.encode_mel(mel)
    ids, astart = prompt_mod.build_asr_prompt(
        eng.cfg, n_audio, eng._prompt_tokens, eng._force_tokens, past_tokens)
    eng.reset_kv()
    first, pos = eng.prefill_ids(ids, audio, astart, n_audio)
    got = []
    eng.decode_greedy(first, pos, max_tokens, lambda t: (got.append(t) or True))
    return got


def _trim(ref, n):
    out = []
    for t in ref[:n]:
        if t in (151643, 151645):
            break
        out.append(t)
    return out


def test_forced_language_prompt(opt_engine, tiny_model_dir, speech_like_audio):
    eng = opt_engine
    assert eng.set_force_language("english")  # normalization: english -> English
    assert eng.force_language == "English"
    assert not eng.set_force_language("klingon")
    eng.set_force_language("English")
    eng.prepare_prompt()
    assert eng._force_tokens[-1] == TOKEN_ASR_TEXT
    assert len(eng._force_tokens) > 1

    mel = log_mel(speech_like_audio)
    reader = MultiSafetensors(tiny_model_dir)
    ref = oracle_transcribe_tokens(reader, eng.cfg, mel, max_tokens=10,
                                   force_tokens=eng._force_tokens)
    got = _engine_tokens(eng, mel)
    assert got == _trim(ref, 10), (got, ref)
    eng.set_force_language(None)
    eng.prepare_prompt()


def test_force_language_byte_semantics(opt_engine):
    """normalize_language_name is BYTE-level per the C locale
    (qwen_asr.c:74-96): C isspace trim + ASCII toupper/tolower only.
    Unicode-semantic Python normalization diverges on exactly these cases
    (cross-checked vs the C binary in tools/fuzz_parity_c.py lang cases)."""
    eng = opt_engine
    # ASCII whitespace trims (C isspace: space \t \n \r \v \f)
    assert eng.set_force_language("\tenglish \t")
    assert eng.force_language == "English"
    assert eng.set_force_language(" \r\nCHINESE\x0b\x0c")
    assert eng.force_language == "Chinese"
    # Turkish dotless i: Python 'ıtalian'.upper() == 'ITALIAN' would accept;
    # C-locale toupper leaves the 2-byte UTF-8 sequence alone -> reject
    assert not eng.set_force_language("ıtalian")
    # NBSP (U+00A0): str.strip() would remove it; C isspace does not -> reject
    assert not eng.set_force_language(" English")
    # 64-byte buffer cap (qwen_asr.c:77): 63 + NUL fits, 64 + NUL does not —
    # both reject anyway (not a language), but must not crash; a real
    # language padded past the cap rejects
    assert not eng.set_force_language("English" + " " * 100 + "x")
    assert not eng.set_force_language("x" * 64)
    # reset
    eng.set_force_language(None)
    eng.prepare_prompt()


def test_system_prompt_tokens(opt_engine, tiny_model_dir, speech_like_audio):
    eng = opt_engine
    eng.set_prompt("the theme")
    eng.prepare_prompt()
    assert eng._prompt_tokens  # tokenized system prompt
    mel = log_mel(speech_like_audio)
    reader = MultiSafetensors(tiny_model_dir)
    ref = oracle_transcribe_tokens(reader, eng.cfg, mel, max_tokens=10,
                                   prompt_tokens=eng._prompt_tokens)
    got = _engine_tokens(eng, mel)
    assert got == _trim(ref, 10), (got, ref)
    eng.set_prompt(None)
    eng.prepare_prompt()


def test_past_text_conditioning_tokens(opt_engine, tiny_model_dir, speech_like_audio):
    eng = opt_engine
    eng.prepare_prompt()
    past = [300, 301, 302]
    mel = log_mel(speech_like_audio)
    reader = MultiSafetensors(tiny_model_dir)
    ref = oracle_transcribe_tokens(reader, eng.cfg, mel, max_tokens=10,
                                   past_tokens=past)
    got = _engine_tokens(eng, mel, past_tokens=past)
    assert got == _trim(ref, 10), (got, ref)
