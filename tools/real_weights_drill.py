#!/usr/bin/env python3
"""Real-weights readiness drill: the ONE command to run the day real Qwen
checkpoints become available (VERDICT r3 Next #6; runbook docs/REAL_WEIGHTS.md).

Stages (each prints PASS/SKIP/FAIL; exit 0 iff nothing FAILed):
  1. acquire   — use --model-dir if given, else download with
                 tools/download_model.py <model> (needs network).
  2. verify    — open the checkpoint (multi-shard safetensors), detect the
                 geometry, probe the structural tensor set (embeddings,
                 first/last encoder+decoder layers, tokenizer files).
  3. parity    — byte-exact cross-engine token parity vs the reference C
                 binary built from source (tools/cross_parity_c.py), CPU
                 --f32 contract arms; skipped when the reference tree is
                 absent.
  4. quality   — golden-transcript regression over the reference samples/
                 (tools/asr_regression.py, normalized Levenshtein <= 0.20
                 — the reference's own bar, asr_regression.py:666-676).
                 With --stand-in (a synthetic/engineered checkpoint), the
                 goldens can't match, so the harness instead generates refs
                 with the current engine and verifies self-consistency —
                 proving the PLUMBING end-to-end without network.

Drill mode (what CI pins, tests/test_real_weights_drill.py):
  python tools/real_weights_drill.py --model-dir <tiny/engineered ckpt> \
      --stand-in [--samples DIR] [--limit 2] [--skip-parity]

Real mode (the day weights land):
  python tools/download_model.py qwen3-asr-0.6b --out /models/0.6b
  python tools/real_weights_drill.py --model-dir /models/0.6b
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES_DEFAULT = "/root/reference/samples"
REF_SRC = "/root/reference"


class Drill:
    def __init__(self):
        self.results = []

    def record(self, stage: str, status: str, detail: str = ""):
        self.results.append({"stage": stage, "status": status,
                             "detail": detail})
        print(f"[{status}] {stage}" + (f" — {detail}" if detail else ""),
              flush=True)

    @property
    def failed(self):
        return any(r["status"] == "FAIL" for r in self.results)


def stage_verify(d: Drill, model_dir: str):
    from smolvision_tpu.config import detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors

    try:
        cfg = detect_config(model_dir)
        reader = MultiSafetensors(model_dir)
        probe = ["thinker.model.embed_tokens.weight",
                 "thinker.model.norm.weight",
                 "thinker.model.layers.0.self_attn.q_proj.weight",
                 f"thinker.model.layers.{cfg.dec_layers - 1}"
                 ".self_attn.q_proj.weight",
                 "thinker.audio_tower.layers.0.self_attn.q_proj.weight",
                 f"thinker.audio_tower.layers.{cfg.enc_layers - 1}"
                 ".self_attn.q_proj.weight"]
        missing = [n for n in probe if not reader.has(n)]
        reader.close()
        for tok_file in ("vocab.json", "merges.txt"):
            if not os.path.exists(os.path.join(model_dir, tok_file)):
                missing.append(tok_file)
        if missing:
            d.record("verify", "FAIL", f"missing: {missing[:4]}")
        else:
            d.record("verify", "PASS",
                     f"geometry: enc {cfg.enc_layers}L d{cfg.enc_d_model}, "
                     f"dec {cfg.dec_layers}L d{cfg.dec_hidden}"
                     + (f", MoE E={cfg.num_experts}" if cfg.is_moe else ""))
    except Exception as e:  # noqa: BLE001 — a drill stage reports, never raises
        d.record("verify", "FAIL", f"{type(e).__name__}: {e}")


def stage_parity(d: Drill, model_dir: str, modes: str, skip_tpu: bool):
    if not os.path.exists(os.path.join(REF_SRC, "qwen_asr.c")):
        d.record("parity", "SKIP", f"reference sources not at {REF_SRC}")
        return
    cmd = [sys.executable, os.path.join(REPO, "tools", "cross_parity_c.py"),
           "--model", model_dir, "--modes", modes]
    if skip_tpu:
        cmd.append("--skip-tpu")
    t0 = time.monotonic()
    r = subprocess.run(cmd, capture_output=True, text=True)
    secs = time.monotonic() - t0
    if r.returncode == 0:
        d.record("parity", "PASS", f"modes [{modes}] byte-exact ({secs:.0f}s)")
    else:
        d.record("parity", "FAIL",
                 f"rc={r.returncode} ({secs:.0f}s); tail: "
                 + r.stdout[-400:].replace("\n", " | "))


def stage_quality(d: Drill, model_dir: str, samples: str, stand_in: bool,
                  limit: int):
    harness = os.path.join(REPO, "tools", "asr_regression.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    base = [sys.executable, harness, "-d", model_dir, "--samples", samples]
    if limit:
        base += ["--limit", str(limit)]
    if stand_in:
        # synthetic checkpoints can't match the bundled goldens — generate
        # refs with this engine into a scratch copy, then verify against
        # them (plumbing-exactness: generate->transcribe->compare must agree)
        import glob
        import shutil
        import tempfile

        scratch = tempfile.mkdtemp(prefix="drill_samples_")
        wavs = sorted(glob.glob(os.path.join(samples, "**", "*.wav"),
                                recursive=True))[: max(limit, 1) or 1]
        if not wavs:
            d.record("quality", "FAIL", f"no wavs under {samples}")
            return
        for w in wavs:
            shutil.copy2(w, scratch)
        base = [sys.executable, harness, "-d", model_dir,
                "--samples", scratch]
        gen = subprocess.run(base + ["--refresh-refs", "--skip-quality"],
                            capture_output=True, text=True, env=env)
        if gen.returncode != 0:
            d.record("quality", "FAIL", "ref generation rc="
                     f"{gen.returncode}: {gen.stdout[-300:]}")
            return
        r = subprocess.run(base + ["--max-norm-rate", "0.0"],
                           capture_output=True, text=True, env=env)
        label = "self-consistency (stand-in)"
    else:
        r = subprocess.run(base, capture_output=True, text=True, env=env)
        label = "golden transcripts"
    if r.returncode == 0:
        d.record("quality", "PASS", label)
    else:
        d.record("quality", "FAIL",
                 f"{label} rc={r.returncode}; tail: "
                 + r.stdout[-400:].replace("\n", " | "))


def _has_checkpoint(model_dir: str) -> bool:
    """Mirror io.safetensors.MultiSafetensors' resolution order: a sharded
    real checkpoint (index.json + model-XXXXX-of-YYYYY.safetensors — how
    real Qwen checkpoints above ~0.6B ship) must pass acquire, not just the
    single-file layout (ADVICE r4, medium)."""
    import glob

    return (os.path.exists(os.path.join(model_dir,
                                        "model.safetensors.index.json"))
            or os.path.exists(os.path.join(model_dir, "model.safetensors"))
            or bool(glob.glob(os.path.join(model_dir,
                                           "model-*.safetensors"))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None,
                    help="existing checkpoint dir (skips download)")
    ap.add_argument("--download", default=None, metavar="MODEL",
                    help="download_model.py model name (needs network)")
    ap.add_argument("--samples", default=SAMPLES_DEFAULT)
    ap.add_argument("--modes", default="offline,segmented,stream",
                    help="cross_parity_c mode list")
    ap.add_argument("--stand-in", action="store_true",
                    help="synthetic checkpoint: quality = self-consistency")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true",
                    help="parity: CPU --f32 contract arm only")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    d = Drill()
    model_dir = args.model_dir
    if model_dir and _has_checkpoint(model_dir):
        d.record("acquire", "PASS", f"using {model_dir}")
    elif args.download:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "download_model.py"),
             args.download] + (["--out", model_dir] if model_dir else []),
            capture_output=True, text=True)
        if r.returncode != 0:
            d.record("acquire", "FAIL", r.stderr[-300:])
        else:
            model_dir = model_dir or os.path.abspath(args.download)
            d.record("acquire", "PASS", f"downloaded to {model_dir}")
    else:
        d.record("acquire", "FAIL",
                 "no --model-dir checkpoint found and no --download name")
    if d.failed:
        print(json.dumps(d.results))
        return 1

    stage_verify(d, model_dir)
    if not d.failed:
        if args.skip_parity:
            d.record("parity", "SKIP", "--skip-parity")
        else:
            stage_parity(d, model_dir, args.modes, args.skip_tpu)
        stage_quality(d, model_dir, args.samples, args.stand_in, args.limit)

    print(json.dumps(d.results))
    return 1 if d.failed else 0


if __name__ == "__main__":
    sys.exit(main())
