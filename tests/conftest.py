"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax loads.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count); the real TPU is exercised by
bench.py and the driver's dryrun, not by unit tests.
"""

import os
import sys

# Hard-override: the machine presets JAX_PLATFORMS=axon (the TPU tunnel);
# tests must never grab the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Parity tests compare f32 activations against a torch oracle; JAX's DEFAULT
# matmul precision rounds f32 matmul inputs to bf16 (TPU-style), which is the
# right production default but breaks exact comparisons.
import jax  # noqa: E402

# This jax build ignores the JAX_PLATFORMS env var (the axon plugin wins);
# only the config flag reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache makes repeat test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/smolvision_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    from tools.make_tiny_model import build

    path = tmp_path_factory.mktemp("models") / "tiny"
    build("tiny", str(path), seed=0, dtype="f32")
    return str(path)


@pytest.fixture(scope="session")
def tiny_moe_model_dir(tmp_path_factory):
    from tools.make_tiny_model import build

    path = tmp_path_factory.mktemp("models") / "tiny-moe"
    build("tiny-moe", str(path), seed=1, dtype="f32")
    return str(path)


@pytest.fixture(scope="session")
def tiny_moe_mixed_model_dir(tmp_path_factory):
    from tools.make_tiny_model import build

    path = tmp_path_factory.mktemp("models") / "tiny-moe-mixed"
    build("tiny-moe-mixed", str(path), seed=3, dtype="f32")
    return str(path)


@pytest.fixture(scope="session")
def tiny_q25_model_dir(tmp_path_factory):
    from tools.make_tiny_model import build

    path = tmp_path_factory.mktemp("models") / "tiny-q25"
    build("tiny-q25", str(path), seed=2, dtype="f32")
    return str(path)


@pytest.fixture(scope="session")
def moe_visible_model_dir(tmp_path_factory):
    """tiny-moe with the full-coverage vocab and the special-id embed
    region downscaled: random greedy trajectories land on visible tok{id}
    pieces instead of attracting to <asr_text> (which decodes to "") —
    combined with set_force_language, transcript comparisons over this
    checkpoint are NON-vacuous token-trace comparisons."""
    import os

    from tools.engineer_checkpoint import EMBED_NAME, patch_rows, read_rows
    from tools.make_tiny_model import build

    d = str(tmp_path_factory.mktemp("models") / "moe-visible")
    build("tiny-moe", d, seed=1, dtype="bf16", full_vocab=True)
    st = os.path.join(d, "model.safetensors")
    special = list(range(151643, 151936))
    orig = read_rows(st, EMBED_NAME, special)
    patch_rows(st, EMBED_NAME, {k: v * 0.05 for k, v in orig.items()})
    return d


@pytest.fixture(scope="session")
def speech_like_audio():
    """Deterministic synthetic 'speech': a few seconds of AM-modulated tones
    with pauses — enough structure for mel/encoder/segmenter tests."""
    rng = np.random.default_rng(42)
    sr = 16000
    dur = 3.0
    t = np.arange(int(sr * dur)) / sr
    sig = (
        0.30 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.15 * np.sin(2 * np.pi * 880 * t) * (t % 1.0 < 0.4)
        + 0.01 * rng.standard_normal(len(t))
    )
    sig[int(1.4 * sr) : int(1.7 * sr)] *= 0.02  # a pause
    return sig.astype(np.float32)
