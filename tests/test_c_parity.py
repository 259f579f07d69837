"""Cross-engine token parity vs the reference C binary (BASELINE.md's
north-star acceptance, run for real).

Builds the reference engine from a source copy in /tmp (sources are never
committed here), drives both engines greedy on the full-geometry synthetic
0.6B checkpoint, and asserts byte-exact stdout.  The full-coverage vocab
("tok{id}" pieces, tools/make_tiny_model.make_vocab(full=True)) makes every
greedy token visible text, so stdout equality IS token-trace equality: a
single argmax flip anywhere in prefill/decode changes the bytes.

The C engine computes f32 from bf16 weights; our side runs CPU + --f32 —
the same arithmetic family — so exact agreement is required, not hoped for.
(The TPU bf16 path is compared by tools/cross_parity_c.py, reported in
docs/PARITY_C.md.)

Cost: one-time C build (~20 s, cached in /tmp/sv_ref_build), one-time 0.6B
checkpoint build (~60 s, cached in .bench_cache), then ~1-2 min/run —
dominated by the C engine's single-core scalar kernels (~1 s/token).
Skip knob: SMOLVISION_SKIP_C_PARITY=1.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")

pytestmark = pytest.mark.skipif(
    os.environ.get("SMOLVISION_SKIP_C_PARITY") == "1"
    or not os.path.isdir("/root/reference")
    or shutil.which("gcc") is None
    or shutil.which("make") is None,
    reason="reference sources / toolchain unavailable",
)


@pytest.fixture(scope="module")
def c_binary():
    sys.path.insert(0, REPO)
    from tools.cross_parity_c import ensure_binary

    return ensure_binary()


@pytest.fixture(scope="module")
def parity_model_dir():
    """Full-geometry 0.6B checkpoint with the full-coverage vocab.  Reuses
    the engineered bench checkpoint when present; otherwise builds the plain
    full-vocab variant + EOS downscale (no jax needed) — thinker-text parity
    does not require the ASR chain surgery."""
    if os.path.exists(os.path.join(MODEL, "model.safetensors")):
        return MODEL
    sys.path.insert(0, REPO)
    from tools.engineer_checkpoint import (EMBED_NAME, EOS_SCALE, patch_rows,
                                           read_rows)
    from tools.make_tiny_model import build
    from smolvision_tpu.config import TOKEN_ENDOFTEXT, TOKEN_IM_END

    build("0.6b", MODEL, seed=7, dtype="bf16", full_vocab=True)
    st = os.path.join(MODEL, "model.safetensors")
    orig = read_rows(st, EMBED_NAME, [TOKEN_ENDOFTEXT, TOKEN_IM_END])
    patch_rows(st, EMBED_NAME,
               {TOKEN_ENDOFTEXT: orig[TOKEN_ENDOFTEXT] * EOS_SCALE,
                TOKEN_IM_END: orig[TOKEN_IM_END] * EOS_SCALE})
    open(os.path.join(MODEL, ".eos_downscaled"), "w").close()
    return MODEL


def test_thinker_text_greedy_byte_exact(c_binary, parity_model_dir):
    # TEXT_PROMPT/K_TEXT_CHAIN from tools/engineer_checkpoint.py: the
    # engineered text chain gives this trajectory fat argmax margins
    # (unengineered random trajectories sit on ~0.3% top-2 gaps that flip
    # under cross-engine summation-order differences)
    flags = ["-d", parity_model_dir, "--thinker",
             "--text", "the English language and",
             "--temperature", "0", "--max-tokens", "12"]
    c = subprocess.run([c_binary] + flags, capture_output=True, timeout=1200)
    assert c.returncode == 0, c.stderr.decode(errors="replace")[-500:]

    env = dict(os.environ, SMOLVISION_PLATFORM="cpu")
    ours = subprocess.run(
        [sys.executable, "-m", "smolvision_tpu.cli"] + flags + ["--f32"],
        capture_output=True, timeout=1200, env=env, cwd=REPO)
    assert ours.returncode == 0, ours.stderr.decode(errors="replace")[-500:]

    assert len(c.stdout) > 10, "vacuous comparison: C emitted no text"
    assert ours.stdout == c.stdout, (
        f"token divergence: C={c.stdout[:120]!r} ours={ours.stdout[:120]!r}")


MOE_MODEL = os.path.join(REPO, ".bench_cache", "qwen3-moe-synth")


@pytest.fixture(scope="module")
def moe_model_dir():
    """Full-vocab MoE checkpoint: full 0.6B encoder + a 12-layer 16-expert
    top-8 decoder with the real 0.6B attention dims (make_tiny_model
    PRESETS['moe-c'] — a geometry the patched C binary can actually run;
    the reference's only hardcoded MoE variant is the ~58 GB 30B)."""
    if not os.path.exists(os.path.join(MOE_MODEL, "model.safetensors")):
        sys.path.insert(0, REPO)
        from tools.make_tiny_model import build

        build("moe-c", MOE_MODEL, seed=0, dtype="bf16", full_vocab=True)
    return MOE_MODEL


@pytest.fixture(scope="module")
def c_binary_moe(moe_model_dir):
    """Reference binary with ONLY its detect_config constants regenerated
    for the runnable MoE geometry (cross_parity_c._moe_geometry_patch);
    all MoE code (qwen_asr_decoder.c:358-452) compiles unmodified."""
    import json

    sys.path.insert(0, REPO)
    from tools.cross_parity_c import ensure_binary

    with open(os.path.join(moe_model_dir, "config.json")) as f:
        cfg = json.load(f)
    return ensure_binary(moe_cfg=cfg)


def test_moe_thinker_text_greedy_byte_exact(c_binary_moe, moe_model_dir):
    """The reference's full MoE decode path (router matvec, top-8 softmax
    renorm, expert SwiGLU accumulate) vs our gather-decode MoE path,
    byte-exact in the shared f32 arithmetic family.  The greedy trajectory
    on this checkpoint also matched byte-exact in audio mode
    (docs/PARITY_C.md run 2026-08-18); text mode alone is pinned here to
    bound CI cost (~45 s warm)."""
    flags = ["-d", moe_model_dir, "--thinker",
             "--text", "the English language and",
             "--temperature", "0", "--max-tokens", "12"]
    c = subprocess.run([c_binary_moe] + flags, capture_output=True,
                       timeout=1200)
    assert c.returncode == 0, c.stderr.decode(errors="replace")[-500:]

    env = dict(os.environ, SMOLVISION_PLATFORM="cpu")
    ours = subprocess.run(
        [sys.executable, "-m", "smolvision_tpu.cli"] + flags + ["--f32"],
        capture_output=True, timeout=1200, env=env, cwd=REPO)
    assert ours.returncode == 0, ours.stderr.decode(errors="replace")[-500:]

    assert len(c.stdout) > 10, "vacuous comparison: C emitted no text"
    assert ours.stdout == c.stdout, (
        f"token divergence: C={c.stdout[:120]!r} ours={ours.stdout[:120]!r}")
