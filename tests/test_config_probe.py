"""Variant detection: config.json first, tensor-name probe as fallback."""

import os
import shutil

from smolvision_tpu.config import detect_config


def test_probe_fallback_without_config_json(tiny_model_dir, tmp_path):
    """Without config.json the reference's tensor-name probe decides the
    variant (qwen_asr.c:142-150).  A 2-encoder-layer checkpoint has neither
    layer 18 nor 31 nor audio_bos_eos -> 0.6B dims."""
    d = tmp_path / "noconfig"
    shutil.copytree(tiny_model_dir, d)
    os.remove(d / "config.json")
    cfg = detect_config(str(d))
    assert cfg.name == "qwen3-asr-0.6b"
    assert cfg.enc_layers == 18 and cfg.dec_hidden == 1024


def test_q25_probe_without_config_json(tiny_q25_model_dir, tmp_path):
    d = tmp_path / "noconfig-q25"
    shutil.copytree(tiny_q25_model_dir, d)
    os.remove(d / "config.json")
    cfg = detect_config(str(d))
    assert cfg.family == "q25"
    assert cfg.vocab_size == 152064
