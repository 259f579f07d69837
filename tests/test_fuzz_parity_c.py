"""Input-space differential parity vs the reference C binary (CI subset).

tools/fuzz_parity_c.py sweeps ~50 input-space cases (WAV container edges,
resample rates, channel mixes, duration boundaries, tokenizer-hostile
text); this pins a representative fast subset in CI so regressions in the
parsers/resampler/mel/prompt/tokenizer surface as byte divergences, not
just unit-test drift.  One case per input-handling subsystem:

  text_cjk            tokenizer multi-byte BPE (no pre-tokenizer regex)
  text_emoji          surrogate-pair / ZWJ byte pieces
  wav_370ms           conv partial-tail chunk arithmetic
  wav_rate44k         Kaiser-sinc resampler (44.1k -> 16k, non-integer)
  wav_stereo_distinct channel averaging (qwen_asr_audio.c:83-92 semantics)
  wav_junk_mid        RIFF chunk walk w/ odd-size padding (qwen_asr_audio.c:51-69)

Both engines run the same arithmetic family (C: bf16 weights/f32 math;
ours: CPU --f32), so byte-exact stdout is required.  The fuzz-c checkpoint
(4-layer/256-dim, full 480-ch conv stem, full vocab) keeps the C engine's
single-core scalar run to seconds per case.  Skip knob shared with
test_c_parity: SMOLVISION_SKIP_C_PARITY=1.
"""

import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("SMOLVISION_SKIP_C_PARITY") == "1"
    or not os.path.isdir("/root/reference")
    or shutil.which("gcc") is None
    or shutil.which("make") is None,
    reason="reference sources / toolchain unavailable",
)

CASES = ["text_cjk", "text_emoji", "wav_370ms", "wav_rate44k",
         "wav_stereo_distinct", "wav_junk_mid"]


@pytest.fixture(scope="module")
def fuzz_env():
    sys.path.insert(0, REPO)
    from tools import fuzz_parity_c as fz
    from tools.cross_parity_c import ensure_binary

    cfg = fz.ensure_model()
    bin_path = ensure_binary(dense_cfg=cfg)
    audio = fz.build_audio_cases(np.random.default_rng(0xF022))
    os.makedirs(fz.WAV_DIR, exist_ok=True)
    return fz, bin_path, audio


@pytest.mark.parametrize("name", CASES)
def test_fuzz_case_byte_exact(fuzz_env, name):
    fz, bin_path, audio = fuzz_env
    if name in fz.TEXT_CASES:
        tail = ["--thinker", "--text", fz.TEXT_CASES[name],
                "--temperature", "0", "--max-tokens", "12"]
    else:
        wav_path = os.path.join(fz.WAV_DIR, name + ".wav")
        with open(wav_path, "wb") as f:
            f.write(audio[name])
        tail = ["--thinker", "-i", wav_path,
                "--temperature", "0", "--max-tokens", "16"]
    args = ["-d", fz.MODEL] + tail
    res = fz.run_case(name, args, args, bin_path)
    assert res["match"], (
        f"{name}: c_rc={res['c_rc']} our_rc={res['our_rc']} "
        f"div@{res['divergence_byte']} C={res['c_stdout'][:100]!r} "
        f"ours={res['our_stdout'][:100]!r}\n"
        f"our stderr: {res['our_stderr_tail']}")


# --- Qwen2.5-Omni family subset -------------------------------------------
# One case per q25-specific surface (full corpus: fuzz_parity_c --q25):
#   q25_win_plus1tok   flat 100-token window boundary + stride-2 conv count
#   q25_asr_win        ungated ASR->thinker routing w/ default system prompt
#   q25_text           tokenizer through the q25 prompt layout + separate
#                      lm_head / biased-QKV / no-qk-norm decoder

@pytest.fixture(scope="module")
def q25_env():
    sys.path.insert(0, REPO)
    from tools import fuzz_parity_c as fz
    from tools.cross_parity_c import ensure_binary

    cfg = fz.ensure_model(q25=True)
    bin_path = ensure_binary(q25_cfg=cfg)
    audio = fz.build_q25_audio_cases(np.random.default_rng(0xF022))
    os.makedirs(fz.WAV_DIR, exist_ok=True)
    return fz, bin_path, audio


Q25_CASES = ["q25_text", "q25_win_plus1tok", "q25_asr_win"]


@pytest.mark.parametrize("name", Q25_CASES)
def test_q25_fuzz_case_byte_exact(q25_env, name):
    fz, bin_path, audio = q25_env
    if name == "q25_text":
        tail = ["--thinker", "--text", fz.TEXT_CASES["text_cjk"],
                "--temperature", "0", "--max-tokens", "12"]
    elif name in fz.Q25_MODE_CASES:
        wav_name, flags = fz.Q25_MODE_CASES[name]
        tail = list(flags)
        if wav_name is not None:
            wav_path = os.path.join(fz.WAV_DIR, wav_name + ".wav")
            with open(wav_path, "wb") as f:
                f.write(audio[wav_name])
            tail += ["-i", wav_path]
    else:
        wav_path = os.path.join(fz.WAV_DIR, name + ".wav")
        with open(wav_path, "wb") as f:
            f.write(audio[name])
        tail = ["--thinker", "-i", wav_path,
                "--temperature", "0", "--max-tokens", "16"]
    args = ["-d", fz.MODEL_Q25] + tail
    res = fz.run_case(name, args, args, bin_path)
    assert res["match"], (
        f"{name}: c_rc={res['c_rc']} our_rc={res['our_rc']} "
        f"div@{res['divergence_byte']} C={res['c_stdout'][:100]!r} "
        f"ours={res['our_stdout'][:100]!r}\n"
        f"our stderr: {res['our_stderr_tail']}")


# --- SAMPLED-mode subset ----------------------------------------------------
# temperature > 0: the one decode mode greedy parity cannot cover.  The C
# arm's srand48 is pinned via QWEN_SEED (cross_parity_c._seed_patch in the
# geometry-patched build); our arm replays the same drand48 stream through
# the compiled sample_token's exact arithmetic (--sampler cref,
# runtime/sampling.CRefSampler — sampler-level exactness pinned separately
# in tests/test_sampling_c_exact.py + tools/fuzz_sampler_c.py).  A single
# flipped multinomial draw diverges every later byte, so byte-exact stdout
# pins the whole stochastic trajectory.  Full corpus: fuzz_parity_c.py
# SAMPLED_CASES / SAMPLED_Q25_CASES.

SAMPLED_PIN = ["samp_text_default", "samp_audio_default"]


# --- randomized-generator subset --------------------------------------------
# Deterministic seeded random cases (fuzz_parity_c --random N --seed S):
# pins the GENERATOR itself (unicode text pools, wav geometry synthesis,
# asr-mode flag wiring, sampled-config clamps) so the round-5 campaign
# corpus keeps reproducing byte-for-byte (dense 80 cases, seed 20260821:
# 78/80 first run — the 2 hot-text full-vocab sampled cases straddled a
# multinomial cumsum bin on adjacent token ids, the documented
# measurement limit, and the generator now bounds hot text at top-k 256;
# docs/PARITY_C.md "Randomized campaign").  Fast subset: one per random
# category.

RANDOM_SEED = 20260821
RANDOM_PIN = ["text_rnd0", "wav_rnd2", "asr_seg_rnd6", "samp_text_rnd0"]


@pytest.fixture(scope="module")
def random_env(fuzz_env):
    fz, bin_path, audio = fuzz_env
    fz.inject_random_cases(np.random.default_rng(RANDOM_SEED), 16, audio)
    return fz, bin_path, audio


@pytest.mark.parametrize("name", RANDOM_PIN)
def test_random_case_byte_exact(random_env, name):
    fz, bin_path, audio = random_env
    ours_extra = []
    c_env = None
    if name in fz.TEXT_CASES:
        tail = ["--thinker", "--text", fz.TEXT_CASES[name],
                "--temperature", "0", "--max-tokens", "12"]
    elif name in fz.SAMPLED_CASES:
        _, flags, seed48 = fz.SAMPLED_CASES[name]
        tail = list(flags)
        c_env = {"QWEN_SEED": str(seed48)}
        ours_extra = ["--sampler", "cref", "--seed", str(seed48)]
    elif name in fz.ASR_CASES:
        wav_name, flags = fz.ASR_CASES[name]
        wav_path = os.path.join(fz.WAV_DIR, wav_name + ".wav")
        with open(wav_path, "wb") as f:
            f.write(audio[wav_name])
        lang = [] if "--language" in flags else ["--language", "English"]
        tail = ["-i", wav_path] + lang + flags
        c_env = {"QWEN_ASR_MAX_TOKENS": fz.ASR_FUZZ_CAP}
        ours_extra = ["--max-tokens", fz.ASR_FUZZ_CAP]
        if name.startswith("asr_seg"):
            ours_extra += ["--no-batch-segments"]
    else:
        wav_path = os.path.join(fz.WAV_DIR, name + ".wav")
        with open(wav_path, "wb") as f:
            f.write(audio[name])
        tail = ["--thinker", "-i", wav_path,
                "--temperature", "0", "--max-tokens", "16"]
    args = ["-d", fz.MODEL] + tail
    res = fz.run_case(name, args, args + ours_extra, bin_path,
                      allow_empty=name in fz.ASR_CASES, c_env=c_env)
    assert res["match"], (
        f"{name}: c_rc={res['c_rc']} our_rc={res['our_rc']} "
        f"div@{res['divergence_byte']} C={res['c_stdout'][:100]!r} "
        f"ours={res['our_stdout'][:100]!r}\n"
        f"our stderr: {res['our_stderr_tail']}")


@pytest.mark.parametrize("name", SAMPLED_PIN)
def test_sampled_case_byte_exact(fuzz_env, name):
    fz, bin_path, audio = fuzz_env
    wav_name, flags, seed48 = fz.SAMPLED_CASES[name]
    tail = list(flags)
    if wav_name is not None:
        wav_path = os.path.join(fz.WAV_DIR, wav_name + ".wav")
        with open(wav_path, "wb") as f:
            f.write(audio[wav_name])
        tail += ["-i", wav_path]
    args = ["-d", fz.MODEL] + tail
    res = fz.run_case(
        name, args, args + ["--sampler", "cref", "--seed", str(seed48)],
        bin_path, c_env={"QWEN_SEED": str(seed48)})
    assert res["match"], (
        f"{name}: c_rc={res['c_rc']} our_rc={res['our_rc']} "
        f"div@{res['divergence_byte']} C={res['c_stdout'][:100]!r} "
        f"ours={res['our_stdout'][:100]!r}\n"
        f"our stderr: {res['our_stderr_tail']}")
