"""Tunable encoder attention window (--enc-window-sec) vs the oracle."""

import numpy as np
import pytest

from smolvision_tpu.io.safetensors import MultiSafetensors
from smolvision_tpu.ops.mel import log_mel

from tests.oracle import oracle_encoder


def test_enc_window_1s_multiwindow(tiny_model_dir, speech_like_audio):
    """enc_window_sec=1 -> 13-token windows; 3 s audio spans 3 windows."""
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32,
                 enc_window_sec=1.0)
    assert eng.cfg.enc_n_window_infer == 100
    assert eng.cfg.window_token_size() == 13

    mel = log_mel(speech_like_audio)
    enc, n_tok = eng.encode_mel(mel)
    reader = MultiSafetensors(tiny_model_dir)
    ref = oracle_encoder(reader, eng.cfg, mel).numpy()
    reader.close()
    assert n_tok == ref.shape[0] and n_tok > 26  # >2 windows
    got = np.asarray(enc)[:n_tok]
    assert np.max(np.abs(got - ref)) < 5e-3

    # and the result must DIFFER from the default 8 s window (windows bind)
    eng8 = Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
    enc8, _ = eng8.encode_mel(mel)
    assert np.max(np.abs(np.asarray(enc8)[:n_tok] - got)) > 1e-4
