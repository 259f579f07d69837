#!/usr/bin/env python3
"""Cross-engine token parity: smolvision_tpu vs the reference C binary.

Builds the reference engine from a source copy (outside the repo — the
sources are never committed here), drives BOTH engines with identical flags
on the engineered synthetic 0.6B checkpoint, and byte-compares stdout.
This executes BASELINE.md's north-star acceptance ("token-exact vs the C
reference binary", thresholds /root/reference/asr_regression.py:666-676) on
this machine with no real weights: the full-coverage synthetic vocab makes
every greedy token visible text, so stdout equality IS token-trace equality.

Modes (cheap -> expensive; the C engine runs generic scalar kernels on one
core at ~1-2 s/token, so runtimes are C-bound):
  text      thinker --text, greedy           (~1 min C-side)
  audio     thinker -i short clip, greedy    (~2-4 min C-side)
  offline   ASR on jfk.wav — the engineered checkpoint emits the
            deterministic <asr_text> + 40-token chain (~10-20 min C-side)
  segmented ASR on jfk.wav with -S 5 -W 1 --past-text no — per-segment
            engineered chains on the SEPARATE eng-seg checkpoint
            (engineer_checkpoint.ensure_engineered_seg; exercises split
            search + per-segment prompts + our batched decode path)
            (~10-15 min C-side)
  stream    streaming ASR on a short clip (bounded by the 32-token/chunk
            stream cap, not by EOS)         (~5-10 min C-side)

Our side runs twice by default: CPU + --f32 (same arithmetic family as the
C engine's bf16-weights/f32-math — byte-exact is REQUIRED) and the
production TPU bf16 path (byte-exact expected on engineered/typical
margins; divergence index reported otherwise).

Usage:
  python tools/cross_parity_c.py --modes text,audio
  python tools/cross_parity_c.py --modes text,audio,offline,stream --report
  # second geometry (1.7B) / second family (Qwen2.5-Omni-7B — thinker modes
  # only, --skip-tpu: 16.5 GB bf16 exceeds one v5e's HBM):
  python tools/cross_parity_c.py --modes text,audio \
      --model .bench_cache/qwen3-asr-1.7b-eng --report
  # (rebuild after cache loss: python tools/engineer_checkpoint.py
  #  --base-only --geom q25-7b --out .bench_cache/qwen25-omni-7b-eng —
  #  thinker modes need no chain surgery, just the EOS downscale)
  python tools/cross_parity_c.py --modes text,audio --skip-tpu \
      --model .bench_cache/qwen25-omni-7b-eng --report
  # MoE family (tools/make_tiny_model.py --preset moe-c --full-vocab):
  # auto-detected from config.json; the C build gets its detect_config
  # constants regenerated for the runnable geometry (_moe_geometry_patch)
  python tools/cross_parity_c.py --modes text,audio \
      --model .bench_cache/qwen3-moe-synth --report
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import struct
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SRC = "/root/reference"
BUILD_DIR = os.environ.get("SMOLVISION_REF_BUILD", "/tmp/sv_ref_build")
MODEL = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
MODEL_SEG = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng-seg")
JFK = os.path.join(REF_SRC, "samples", "jfk.wav")
SHORT_WAV = "/tmp/sv_parity_short.wav"
REPORT = os.path.join(REPO, "docs", "PARITY_C.md")


def _moe_geometry_patch(src: str, cfg: dict) -> str:
    """Rewrite detect_config's 30B-MoE branch constants to `cfg`'s geometry.

    The reference hardcodes exactly three variants (qwen_asr.c:134-204) and
    its only MoE one is the 30B (48 layers x 128 experts, ~58 GB — whose f32
    working copy exceeds this host's RAM), so MoE parity at a runnable size
    needs the constant block regenerated.  This is the ONLY source change:
    the detection probe tensor name (-> the MoE router gate, present in any
    MoE checkpoint) and the assignments inside the `if (test_omni)` branch.
    Every line of MoE *code* (router matvec, top-k selection, softmax,
    expert SwiGLU accumulate, qwen_asr_decoder.c:358-452) runs unmodified.
    """
    import re

    ac = cfg["thinker_config"]["audio_config"]
    tc = cfg["thinker_config"]["text_config"]
    assert tc["num_experts_per_tok"] <= 8, "C engine caps top_k at 8"
    body = "\n".join(
        f"        cfg->{k} = {v};" for k, v in [
            ("enc_d_model", ac["d_model"]),
            ("enc_layers", ac["encoder_layers"]),
            ("enc_heads", ac["encoder_attention_heads"]),
            ("enc_head_dim", ac["d_model"] // ac["encoder_attention_heads"]),
            ("enc_ffn_dim", ac["encoder_ffn_dim"]),
            ("enc_output_dim", ac["output_dim"]),
            ("dec_hidden", tc["hidden_size"]),
            ("dec_layers", tc["num_hidden_layers"]),
            ("dec_heads", tc["num_attention_heads"]),
            ("dec_kv_heads", tc["num_key_value_heads"]),
            ("dec_head_dim", tc["head_dim"]),
            ("dec_intermediate", tc["moe_intermediate_size"]),
            ("is_moe", 1),
            ("num_experts", tc["num_experts"]),
            ("num_experts_per_tok", tc["num_experts_per_tok"]),
            ("moe_intermediate", tc["moe_intermediate_size"]),
            ("norm_topk_prob", 1),
        ])
    block = ("if (test_omni) {\n"
             "        /* MoE parity geometry (constants patched by"
             " tools/cross_parity_c.py) */\n"
             + body + "\n"
             "        if (qwen_verbose >= 1)"
             " fprintf(stderr, \"Detected: MoE (parity geometry)\\n\");\n\n"
             "    } else if (test) {")
    out, n = re.subn(r"if \(test_omni\) \{.*?\} else if \(test\) \{",
                     block.replace("\\", "\\\\"), src, count=1, flags=re.S)
    assert n == 1, "detect_config MoE branch not found"
    out = out.replace(
        "thinker.audio_tower.layers.31.self_attn.q_proj.weight",
        "thinker.model.layers.0.mlp.gate.weight")
    return out


def _seed_patch(src: str) -> str:
    """GEOMETRY-PATCHED (fuzz) builds only: make the wall-clock sampler seed
    (`srand48((long)get_time_ms())`, qwen_asr.c:2510 / qwen25_omni.c:484)
    overridable via the QWEN_SEED env var so SAMPLED-mode (temperature > 0)
    trajectories are reproducible and cross-checkable.  Our arm replays the
    identical drand48 stream (runtime/sampling.Drand48 + CRefSampler).
    Without the env var the patched binary behaves exactly as shipped.
    The pristine parity-matrix binary is NOT patched."""
    old = "srand48((long)get_time_ms());"
    new = ("{ const char *se = getenv(\"QWEN_SEED\");\n"
           "        srand48(se ? atol(se) : (long)get_time_ms()); }")
    assert src.count(old) == 1, "sampler seed site not found"
    return src.replace(old, new)


def _asr_cap_patch(src: str) -> str:
    """GEOMETRY-PATCHED (fuzz) builds only: make the hard-coded ASR decode
    cap (`int max_tokens = 2048;`, qwen_asr.c:778) overridable via the
    QWEN_ASR_MAX_TOKENS env var.  Input-space fuzz trajectories on random
    checkpoints rarely emit EOS, so offline/segmented cases otherwise run
    the full 2048-token cap (minutes per arm; a conditioned segmented case
    measured >15 min on the f32 arm as past text grows the prompt every
    segment).  Our arm passes --max-tokens, which drives the same
    every-consumed-token counter (engine.max_tokens) — cap-boundary
    emission semantics were already proven equal by the full-cap runs.
    The pristine parity-matrix binary is NOT patched."""
    old = "int max_tokens = 2048;\n    int n_generated = 0;"
    new = ("int max_tokens = 2048;\n"
           "    { const char *mt_env = getenv(\"QWEN_ASR_MAX_TOKENS\");\n"
           "      if (mt_env && atoi(mt_env) > 0) max_tokens = atoi(mt_env); }\n"
           "    int n_generated = 0;")
    assert src.count(old) == 1, "ASR decode cap site not found"
    return src.replace(old, new)


def _dense_geometry_patch(src: str, cfg: dict) -> str:
    """Rewrite detect_config's 0.6B fallback-branch constants to `cfg`'s
    dense geometry.  Same contract as _moe_geometry_patch: the ONLY source
    change is the constant block inside the final `else` (which a checkpoint
    with <19 encoder layers falls into anyway — no probe rename needed);
    every line of model *code* runs unmodified.  Used by the input-space
    parity fuzz (tools/fuzz_parity_c.py) to make the C engine runnable in
    seconds on the tiny `fuzz-c` checkpoint.  The conv stem stays at the
    hardcoded QWEN_CONV_HIDDEN=480 (qwen_asr.h:39) — the checkpoint carries
    full-size conv weights."""
    import re

    ac = cfg["thinker_config"]["audio_config"]
    tc = cfg["thinker_config"]["text_config"]
    assert ac["downsample_hidden_size"] == 480, \
        "C engine hardcodes QWEN_CONV_HIDDEN=480"
    body = "\n".join(
        f"        cfg->{k} = {v};" for k, v in [
            ("enc_d_model", ac["d_model"]),
            ("enc_layers", ac["encoder_layers"]),
            ("enc_heads", ac["encoder_attention_heads"]),
            ("enc_head_dim", ac["d_model"] // ac["encoder_attention_heads"]),
            ("enc_ffn_dim", ac["encoder_ffn_dim"]),
            ("enc_output_dim", ac["output_dim"]),
            ("dec_hidden", tc["hidden_size"]),
            ("dec_layers", tc["num_hidden_layers"]),
            ("dec_heads", tc["num_attention_heads"]),
            ("dec_kv_heads", tc["num_key_value_heads"]),
            ("dec_head_dim", tc["head_dim"]),
            ("dec_intermediate", tc["intermediate_size"]),
        ])
    block = ("else {\n"
             "        /* dense parity geometry (constants patched by"
             " tools/cross_parity_c.py) */\n"
             + body + "\n"
             "        if (qwen_verbose >= 1)"
             " fprintf(stderr, \"Detected: dense (parity geometry)\\n\");\n"
             "    }\n\n    /* Common parameters */")
    out, n = re.subn(r"else \{\s*/\* 0\.6B model \*/.*?\}\s*"
                     r"/\* Common parameters \*/",
                     block.replace("\\", "\\\\"), src, count=1, flags=re.S)
    assert n == 1, "detect_config 0.6B fallback branch not found"
    return out


def _q25_geometry_patch(src: str, cfg: dict) -> str:
    """Rewrite q25_load's hardcoded Qwen2.5-Omni-7B constant block
    (qwen25_omni.c:198-215 — the q25 family ignores config.json entirely)
    to `cfg`'s geometry.  Same contract as the other two patches: ONLY the
    constant assignments change; every line of q25 model code (conv stem,
    flat 100-token windows, global PE, bos/eos rows, biased-QKV decoder,
    separate lm_head, qwen25_omni_{encoder,decoder}.c) runs unmodified.
    Applied to qwen25_omni.c, not qwen_asr.c.  n_window stays 100 and
    vocab stays Q25_VOCAB_SIZE — both are part of the family contract."""
    import re

    ac = cfg["thinker_config"]["audio_config"]
    tc = cfg["thinker_config"]["text_config"]
    assert tc["vocab_size"] == 152064, "C engine hardcodes Q25_VOCAB_SIZE"
    body = "\n".join(
        f"    cfg->{k} = {v};" for k, v in [
            ("enc_d_model", ac["d_model"]),
            ("enc_layers", ac["encoder_layers"]),
            ("enc_heads", ac["encoder_attention_heads"]),
            ("enc_head_dim", ac["d_model"] // ac["encoder_attention_heads"]),
            ("enc_ffn_dim", ac["encoder_ffn_dim"]),
            ("enc_output_dim", ac["output_dim"]),
            ("enc_n_window", 100),
            ("dec_hidden", tc["hidden_size"]),
            ("dec_layers", tc["num_hidden_layers"]),
            ("dec_heads", tc["num_attention_heads"]),
            ("dec_kv_heads", tc["num_key_value_heads"]),
            ("dec_head_dim", tc["head_dim"]),
            ("dec_intermediate", tc["intermediate_size"]),
        ])
    block = ("q25_config_t *cfg = &ctx->config;\n"
             "    /* q25 parity geometry (constants patched by"
             " tools/cross_parity_c.py) */\n"
             + body + "\n"
             "    cfg->vocab_size = Q25_VOCAB_SIZE;\n"
             "    cfg->dec_rms_norm_eps = 1e-6f;\n"
             "    cfg->dec_rope_theta = 1e6f;\n\n"
             "    if (qwen_verbose >= 1)"
             " fprintf(stderr, \"Detected: Qwen2.5-Omni (parity geometry)\\n\");")
    out, n = re.subn(
        r"q25_config_t \*cfg = &ctx->config;.*?"
        r"if \(qwen_verbose >= 1\) fprintf\(stderr, \"Detected: "
        r"Qwen2\.5-Omni-7B\\n\"\);",
        block.replace("\\", "\\\\"), src, count=1, flags=re.S)
    assert n == 1, "q25_load hardcoded config block not found"
    return out


def ensure_binary(moe_cfg: dict | None = None,
                  dense_cfg: dict | None = None,
                  q25_cfg: dict | None = None) -> str:
    """Copy the reference C sources to a scratch dir and `make` them.
    Cached: rebuilt only when a source is newer than the binary.
    `moe_cfg`: a checkpoint config.json dict — builds a SEPARATE binary
    whose detect_config constants (only) are regenerated for that MoE
    geometry (see _moe_geometry_patch).  `dense_cfg`: same, for a dense
    non-hardcoded geometry (see _dense_geometry_patch).  `q25_cfg`: same,
    for the Qwen2.5-Omni family (patches qwen25_omni.c's q25_load block,
    see _q25_geometry_patch)."""
    assert sum(c is not None for c in (moe_cfg, dense_cfg, q25_cfg)) <= 1
    build_dir = BUILD_DIR + ("_moe" if moe_cfg else "_dense" if dense_cfg
                             else "_q25" if q25_cfg else "")
    bin_path = os.path.join(build_dir, "qwen_asr")
    stamp_path = os.path.join(build_dir, "geometry.json")
    patch_cfg = moe_cfg or dense_cfg or q25_cfg
    # "|capv1|seedv1": the _asr_cap_patch/_seed_patch revisions — bumping
    # invalidates cached geometry-patched binaries built before a patch
    stamp = (json.dumps(patch_cfg, sort_keys=True) + "|capv1|seedv1"
             if patch_cfg else "")
    srcs = (glob.glob(os.path.join(REF_SRC, "*.c"))
            + glob.glob(os.path.join(REF_SRC, "*.h"))
            + [os.path.join(REF_SRC, "Makefile")])
    if os.path.exists(bin_path):
        bin_mtime = os.path.getmtime(bin_path)
        cached_stamp = ""
        if os.path.exists(stamp_path):
            with open(stamp_path) as f:
                cached_stamp = f.read()
        # the patched constants are part of the cache key: a second MoE
        # checkpoint with different geometry must NOT reuse this binary
        if (all(os.path.getmtime(s) <= bin_mtime for s in srcs)
                and cached_stamp == stamp):
            return bin_path
    os.makedirs(build_dir, exist_ok=True)
    for s in srcs:
        shutil.copy2(s, build_dir)
    if patch_cfg is not None:
        target = "qwen25_omni.c" if q25_cfg else "qwen_asr.c"
        c_path = os.path.join(build_dir, target)
        with open(c_path) as f:
            src = f.read()
        patched = (_moe_geometry_patch(src, moe_cfg) if moe_cfg
                   else _dense_geometry_patch(src, dense_cfg) if dense_cfg
                   else _q25_geometry_patch(src, q25_cfg))
        if q25_cfg is None:      # qwen_asr.c builds: env-overridable cap
            patched = _asr_cap_patch(patched)
        with open(c_path, "w") as f:
            f.write(patched)
        # every patched build gets the reproducible-sampling seed hook, in
        # BOTH families' thinker loops (one srand48 site each)
        for fname in ("qwen_asr.c", "qwen25_omni.c"):
            sp = os.path.join(build_dir, fname)
            with open(sp) as f:
                src = f.read()
            with open(sp, "w") as f:
                f.write(_seed_patch(src))
    # -march=native -ffast-math is the reference's OWN shipped default
    # (its Makefile: CFLAGS_BASE = -Wall -Wextra -O3 -march=native
    # -ffast-math), so this is the arithmetic family the parity target
    # actually ships with; a strict -O2 build was also compared once and
    # produced identical output (docs/PARITY_C.md diagnosis chain, step 1)
    subprocess.run(
        ["make", "qwen_asr", "CFLAGS=-O2 -march=native -ffast-math"],
        cwd=build_dir, check=True, capture_output=True)
    with open(stamp_path, "w") as f:
        f.write(stamp)
    return bin_path


def ensure_sample_oracle() -> str:
    """Build a shared library exposing the reference's COMPILED sampler
    (sample_token, qwen_asr.c:2250-2313 — a static function, so a generated
    shim TU #includes the scratch copy of qwen_asr.c and wraps it) plus its
    drand48 stream, with the binary's own CFLAGS (-O2 -march=native
    -ffast-math).  This is the ground truth tools/fuzz_sampler_c.py checks
    runtime/sampling.CRefSampler against: not the C SOURCE semantics but
    the shipped CODEGEN (fast-math may e.g. reassociate the softmax sum or
    turn the temperature divide into a reciprocal multiply).  Returns the
    .so path; cached like ensure_binary."""
    build_dir = BUILD_DIR + "_oracle"
    so_path = os.path.join(build_dir, "sample_oracle.so")
    stamp_path = os.path.join(build_dir, "oracle_stamp.txt")
    srcs = (glob.glob(os.path.join(REF_SRC, "*.c"))
            + glob.glob(os.path.join(REF_SRC, "*.h")))
    shim_text = (
        '#include "qwen_asr.c"\n'
        "int sample_oracle(float *logits, int vocab, const int *recent,\n"
        "                  int n_recent, float temp, float rep, int top_k)\n"
        "{ return sample_token(logits, vocab, recent, n_recent,\n"
        "                      temp, rep, top_k); }\n"
        "void oracle_srand48(long s) { srand48(s); }\n"
        "double oracle_drand48(void) { return drand48(); }\n"
        "float oracle_expf(float x) { return expf(x); }\n"
        "void oracle_softmax(float *x, int rows, int cols)\n"
        "{ qwen_softmax(x, rows, cols); }\n")
    cflags = ["-O2", "-march=native", "-ffast-math", "-fPIC", "-shared"]
    # cache key includes the shim content + CFLAGS (mirrors ensure_binary's
    # "|capv1|seedv1" stamping): source mtimes alone would silently reuse a
    # stale oracle after a shim or flags edit
    stamp = shim_text + "|" + " ".join(cflags)
    cached_stamp = ""
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            cached_stamp = f.read()
    if (os.path.exists(so_path) and cached_stamp == stamp and all(
            os.path.getmtime(s) <= os.path.getmtime(so_path) for s in srcs)):
        return so_path
    os.makedirs(build_dir, exist_ok=True)
    for s in srcs:
        shutil.copy2(s, build_dir)
    shim = os.path.join(build_dir, "oracle_shim.c")
    with open(shim, "w") as f:
        f.write(shim_text)
    others = [os.path.basename(s) for s in glob.glob(
        os.path.join(build_dir, "*.c"))
        if os.path.basename(s) not in ("qwen_asr.c", "main.c",
                                       "oracle_shim.c")]
    subprocess.run(
        ["gcc", *cflags, "-o", so_path, "oracle_shim.c", *others,
         "-lm", "-lpthread"],
        cwd=build_dir, check=True, capture_output=True)
    with open(stamp_path, "w") as f:
        f.write(stamp)
    return so_path


def ensure_short_wav(path: str = SHORT_WAV, dur: float = 2.0) -> str:
    import numpy as np
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(42)
    sr = 16000
    t = np.arange(int(sr * dur)) / sr
    sig = (0.30 * np.sin(2 * np.pi * 220 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
           + 0.15 * np.sin(2 * np.pi * 880 * t) * (t % 1.0 < 0.4)
           + 0.01 * rng.standard_normal(len(t)))
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return path


MODES = {
    # mode -> extra CLI args (identical for both engines)
    "text": ["--thinker", "--text", "the English language and",
             "--temperature", "0", "--max-tokens", "12"],
    "audio": ["--thinker", "-i", SHORT_WAV, "--temperature", "0",
              "--max-tokens", "8"],
    "offline": ["-i", JFK],
    "segmented": ["-i", JFK, "-S", "5", "-W", "1", "--past-text", "no"],
    "stream": ["-i", SHORT_WAV, "--stream"],
    # SAMPLED thinker modes (temperature > 0) at REAL geometry: the C arm
    # gets QWEN_SEED (requires the seed-hooked build — main() switches to a
    # geometry-patched binary when these modes are requested), ours replays
    # the drand48 stream with --sampler cref.  CPU-f32 contract only: a
    # multinomial draw's margin can sit below bf16-vs-f32 drift, so the TPU
    # arm is skipped for these modes (see docs/PARITY_C.md sampled section).
    "sampled": ["--thinker", "--text", "the English language and",
                "--temperature", "0.7", "--max-tokens", "24"],
    "sampled_audio": ["--thinker", "-i", SHORT_WAV,
                      "--temperature", "0.7", "--max-tokens", "16"],
}
SAMPLED_SEED = 42
SAMPLED_MODES = {"sampled", "sampled_audio"}
# segmented runs against checkpoint B (per-segment chains, --seg-model);
# the full-clip chain and the segment chains cannot coexist on one
# checkpoint (see tools/engineer_checkpoint.py module docstring)


def run_engine(cmd, env=None, timeout=6 * 3600):
    # 6 h: the q25-7b arm runs a 7B forward on ONE host core (nproc=1);
    # budget per the CLAUDE.md landmine on unbounded cold-subprocess latency.
    t0 = time.monotonic()
    p = subprocess.run(cmd, capture_output=True, timeout=timeout, env=env)
    return {"stdout": p.stdout, "stderr": p.stderr.decode(errors="replace"),
            "rc": p.returncode, "secs": time.monotonic() - t0}


def first_divergence(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return -1 if len(a) == len(b) else n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="text,audio")
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--seg-model", default=MODEL_SEG,
                    help="checkpoint for the segmented mode (per-segment "
                         "chains; build with engineer_checkpoint.py "
                         "--only b --seg-geom <geom>)")
    ap.add_argument("--skip-tpu", action="store_true",
                    help="only run the CPU --f32 comparison")
    ap.add_argument("--report", action="store_true",
                    help=f"append results to {REPORT}")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.model, "model.safetensors")):
        sys.exit(f"model not found: {args.model} — run "
                 "tools/engineer_checkpoint.py first")
    if "segmented" in args.modes.split(",") and not os.path.exists(
            os.path.join(args.seg_model, "model.safetensors")):
        sys.exit(f"segmented mode needs {args.seg_model} — run "
                 "tools/engineer_checkpoint.py --only b first")
    with open(os.path.join(args.model, "config.json")) as f:
        model_cfg = json.load(f)
    is_moe = "num_experts" in model_cfg.get("thinker_config", {}).get(
        "text_config", {})
    is_q25 = model_cfg.get("model_type") == "qwen2_5_omni"
    # the full q25-7b geometry IS the C binary's hardcoded constant block —
    # no patch needed (and the patched binary would be identical); smaller
    # q25 checkpoints (fuzz-q25-c) need the q25_load block regenerated
    needs_q25_patch = is_q25 and model_cfg["thinker_config"][
        "audio_config"]["d_model"] != 1280
    # sampled modes need the QWEN_SEED hook, which only geometry-patched
    # builds carry — route through the identity-geometry patched build
    # (same constants as the hardcoded ones, plus the cap/seed hooks)
    needs_seed = bool(SAMPLED_MODES & set(args.modes.split(",")))
    bin_path = ensure_binary(
        moe_cfg=model_cfg if is_moe else None,
        q25_cfg=model_cfg if (needs_q25_patch
                              or (is_q25 and needs_seed)) else None,
        dense_cfg=model_cfg if (needs_seed and not is_moe
                                and not is_q25) else None)
    ensure_short_wav()

    results = []
    ok_all = True
    for mode in args.modes.split(","):
        extra = MODES[mode]
        model = args.seg_model if mode == "segmented" else args.model
        print(f"== {mode}: {' '.join(extra)}  [model {os.path.basename(model)}]",
              flush=True)
        sampled = mode in SAMPLED_MODES
        c_env = (dict(os.environ, QWEN_SEED=str(SAMPLED_SEED))
                 if sampled else None)
        c = run_engine([bin_path, "-d", model] + extra, env=c_env)
        print(f"  C: rc={c['rc']} {len(c['stdout'])} B stdout "
              f"({c['secs']:.0f}s)", flush=True)

        ours_mode = (["--sampler", "cref", "--seed", str(SAMPLED_SEED)]
                     if sampled else [])
        runs = [("cpu-f32", {"SMOLVISION_PLATFORM": "cpu"}, ["--f32"])]
        if not args.skip_tpu and not sampled:
            runs.append(("tpu-bf16", {}, []))
        entry = {"mode": mode, "model": os.path.basename(model),
                 "flags": " ".join(extra), "c_rc": c["rc"],
                 "c_secs": round(c["secs"], 1),
                 "c_stdout_bytes": len(c["stdout"]), "ours": {}}
        for label, env_extra, flags in runs:
            env = dict(os.environ, **env_extra)
            r = run_engine([sys.executable, "-m", "smolvision_tpu.cli",
                            "-d", model] + extra + flags + ours_mode,
                           env=env)
            div = first_divergence(c["stdout"], r["stdout"])
            # a MATCH must be a real token comparison: both engines exited
            # cleanly and the C side produced output — two identical
            # failures (rc=1, empty stdout) are NOT parity evidence
            match = (div == -1 and r["rc"] == c["rc"] == 0
                     and len(c["stdout"]) > 0)
            entry["ours"][label] = {
                "rc": r["rc"], "secs": round(r["secs"], 1),
                "stdout_bytes": len(r["stdout"]),
                "match": match, "divergence_byte": div,
            }
            print(f"  {label}: rc={r['rc']} {len(r['stdout'])} B "
                  f"({r['secs']:.0f}s) -> "
                  f"{'MATCH' if match else f'DIVERGE@{div}'}", flush=True)
            if not match:
                ok_all = False
                head = c["stdout"][max(0, div - 20): div + 40]
                ours = r["stdout"][max(0, div - 20): div + 40]
                print(f"    C   : {head!r}\n    ours: {ours!r}", flush=True)
                entry["ours"][label]["c_context"] = repr(head)
                entry["ours"][label]["our_context"] = repr(ours)
        results.append(entry)

    print(json.dumps(results, indent=1))
    if args.report:
        os.makedirs(os.path.dirname(REPORT), exist_ok=True)
        stamp = time.strftime("%Y-%m-%d %H:%M")
        with open(REPORT, "a") as f:
            f.write(f"\n## Run {stamp}\n\n```json\n"
                    + json.dumps(results, indent=1) + "\n```\n")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
