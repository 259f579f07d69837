#!/usr/bin/env python3
"""Download Qwen checkpoint files from Hugging Face (curl-based).

Equivalent of the reference's download_model.sh: fetches the safetensors
shards + tokenizer + config for the supported checkpoints.  Requires network
access (not available in air-gapped environments — use
tools/make_tiny_model.py to generate synthetic checkpoints for development).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HF = "https://huggingface.co"

MODELS = {
    "qwen3-asr-0.6b": ("Qwen/Qwen3-ASR-0.6B", [
        "model.safetensors",
        "config.json", "vocab.json", "merges.txt",
        "tokenizer_config.json", "generation_config.json",
    ]),
    "qwen3-asr-1.7b": ("Qwen/Qwen3-ASR-1.7B", [
        "model-00001-of-00002.safetensors",
        "model-00002-of-00002.safetensors",
        "model.safetensors.index.json",
        "config.json", "vocab.json", "merges.txt",
        "tokenizer_config.json", "generation_config.json",
    ]),
    "qwen2.5-omni-7b": ("Qwen/Qwen2.5-Omni-7B", [
        *[f"model-{i:05d}-of-00005.safetensors" for i in range(1, 6)],
        "model.safetensors.index.json",
        "config.json", "vocab.json", "merges.txt", "tokenizer_config.json",
    ]),
    "qwen3-omni-30b": ("Qwen/Qwen3-Omni-30B-A3B-Instruct", [
        *[f"model-{i:05d}-of-00013.safetensors" for i in range(1, 14)],
        "model.safetensors.index.json",
        "config.json", "vocab.json", "merges.txt", "tokenizer_config.json",
    ]),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=sorted(MODELS))
    ap.add_argument("--out", default=None, help="output dir (default: ./<model>)")
    args = ap.parse_args()

    repo, files = MODELS[args.model]
    out = args.out or args.model
    os.makedirs(out, exist_ok=True)
    for f in files:
        dst = os.path.join(out, f)
        if os.path.exists(dst):
            print(f"have {f}")
            continue
        url = f"{HF}/{repo}/resolve/main/{f}"
        print(f"fetching {url}")
        r = subprocess.run(["curl", "-L", "--fail", "-o", dst + ".part", url])
        if r.returncode != 0:
            print(f"download failed: {f}", file=sys.stderr)
            return 1
        os.rename(dst + ".part", dst)
    print(f"done: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
