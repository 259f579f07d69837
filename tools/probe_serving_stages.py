#!/usr/bin/env python3
"""Per-stage ON-CHIP attribution of a continuous-serving period
(VERDICT r3 Next #2: "per-stage on-chip timing of a continuous period —
prefill MXU %, decode stream %, boundary gaps").

Protocol: warm serve_continuous with PRE-STAGED audio (tunnel upload
excluded), then one profiled period under jax.profiler.trace.  The trace's
device ops are aggregated by jit program name — the serving jits are named
(serving_group_prefill / serving_decode_chunk / serving_build_embeds /
serving_admit, runtime/serving.py) so device time maps 1:1 to scheduler
stages; encoder ops come from the shared batched-encode jits.  Host spans
in axon traces are inflated (CLAUDE.md) — only DEVICE ops and the wall
clock are read.

Output: device ms per stage, device busy vs wall (the boundary/idle gap),
and implied bound per stage vs the roofline doc's model
(docs/SERVING_ROOFLINE.md: prefill ~70% MXU, decode ~80% of the 480 GB/s
effective stream).

Run (TPU, serial): python tools/probe_serving_stages.py [--kv8] [--q8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JFK = "/root/reference/samples/jfk.wav"
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")


def log(m):
    print(m, file=sys.stderr, flush=True)


def parse_trace(trace_dir: str):
    """Aggregate device-op durations (us) by (program-ish) name from the
    perfetto JSON trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # device tracks: pid/tid whose process_name metadata mentions the
    # device / TPU; fall back to "every complete event not on a python
    # thread" if metadata is absent
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in proc_names.items()
                   if any(k in name.lower() for k in
                          ("tpu", "device", "axon", "/device:"))}
    agg = defaultdict(float)
    counts = defaultdict(int)
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        on_device = (e.get("pid") in device_pids if device_pids
                     else "tid" in e)
        if not on_device:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        agg[name] += dur
        counts[name] += 1
        ts = float(e.get("ts", 0.0))
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)
    return agg, counts, (t_max - t_min if t_max > t_min else 0.0)


STAGE_KEYS = [
    ("decode", ("serving_decode_chunk", "decode_chunk", "while")),
    ("prefill", ("serving_group_prefill", "prefill")),
    ("build_embeds", ("serving_build_embeds", "build_embeds")),
    ("admit", ("serving_admit", "admit")),
    ("encoder", ("encoder", "enc_", "window", "conv")),
    ("mel", ("mel", "dft", "stft")),
    ("kv_grow", ("kv_grow",)),
]


def bucket_stages(agg):
    stages = defaultdict(float)
    for name, us in agg.items():
        low = name.lower()
        for stage, keys in STAGE_KEYS:
            if any(k in low for k in keys):
                stages[stage] += us
                break
        else:
            stages["other"] += us
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--model", default=BENCH_DIR)
    ap.add_argument("--queue", type=int, default=128)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--trace-dir", default="/tmp/serving_trace")
    args = ap.parse_args()

    import jax
    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime.serving import (prestage_uploads,
                                                serve_continuous)

    log(f"backend={jax.default_backend()}")
    eng = Engine(args.model, verbose=0, kv8=args.kv8, q8=args.q8)
    eng.max_tokens = 48
    eng.segment_sec = 0.0
    base = load_wav(JFK)
    audio_s = len(base) / 16000.0
    rng = np.random.default_rng(11)

    def mkclips():
        return [(base + rng.normal(0, 1e-4, len(base))).astype(np.float32)
                for _ in range(args.queue)]

    # warm (compiles)
    clips = mkclips()
    pre = prestage_uploads(eng, clips, encode_group=32)
    t0 = time.monotonic()
    serve_continuous(eng, clips, slots=args.slots, encode_group=32,
                     prestaged=pre)
    log(f"warmup {time.monotonic() - t0:.1f} s")
    # one unprofiled timed run for the wall reference
    clips = mkclips()
    pre = prestage_uploads(eng, clips, encode_group=32)
    t0 = time.monotonic()
    serve_continuous(eng, clips, slots=args.slots, encode_group=32,
                     prestaged=pre)
    wall_ref = time.monotonic() - t0
    tput = args.queue * audio_s / wall_ref
    log(f"unprofiled wall {wall_ref*1000:.0f} ms = {tput:.0f} s-speech/s")

    # profiled run
    clips = mkclips()
    pre = prestage_uploads(eng, clips, encode_group=32)
    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.monotonic()
    with jax.profiler.trace(args.trace_dir):
        serve_continuous(eng, clips, slots=args.slots, encode_group=32,
                         prestaged=pre)
    wall_prof = time.monotonic() - t0
    log(f"profiled wall {wall_prof*1000:.0f} ms")

    agg, counts, span_us = parse_trace(args.trace_dir)
    stages = bucket_stages(agg)
    total_dev_ms = sum(stages.values()) / 1000.0
    print("\n== device time by stage (profiled period) ==")
    for k in sorted(stages, key=lambda s: -stages[s]):
        print(f"  {k:14s} {stages[k]/1000.0:8.1f} ms "
              f"({100.0*stages[k]/max(sum(stages.values()),1):.1f}%)")
    print(f"  device busy total {total_dev_ms:.1f} ms over wall "
          f"{wall_prof*1000:.0f} ms -> idle/boundary "
          f"{wall_prof*1000 - total_dev_ms:.0f} ms "
          f"({100.0*(wall_prof*1000 - total_dev_ms)/max(wall_prof*1000,1):.1f}%)")
    print("\n== top device ops ==")
    for name in sorted(agg, key=lambda n: -agg[n])[:20]:
        print(f"  {agg[name]/1000.0:8.1f} ms x{counts[name]:<5d} {name[:90]}")
    print(json.dumps({
        "config": {"kv8": args.kv8, "q8": args.q8, "queue": args.queue,
                   "slots": args.slots},
        "unprofiled": {"wall_ms": round(wall_ref * 1000, 1),
                       "s_speech_per_s": round(tput, 1)},
        "stages_ms": {k: round(v / 1000.0, 1) for k, v in stages.items()},
        "device_busy_ms": round(total_dev_ms, 1),
        "profiled_wall_ms": round(wall_prof * 1000, 1),
    }))


if __name__ == "__main__":
    main()
