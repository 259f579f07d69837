#!/usr/bin/env python3
"""Measure MoE host-offload (Plan B) for real — VERDICT r4 Next #4.

docs/MOE_30B_PLAN.md's viability claim ("PCIe-class bandwidth makes
per-token expert streaming practical") rests on arithmetic only.  This
probe turns it into measurements on .bench_cache/qwen3-moe-synth (full
0.6B encoder + 12-layer 16-expert top-8 MI=768 decoder — per-layer
decode fetch 8x3x768x1024x2 B = 37.7 MB, the SAME per-layer block size
as the 30B's top-8 fetch, so the per-layer streaming term is measured at
real scale; the 30B simply has 48 such layers):

  * offload decode tokens/s + measured host->device GB/s (bytes counted
    by wrapping HostExpertStore.gather — ground truth, not arithmetic)
  * resident decode tokens/s on the same checkpoint (the gap = streaming
    cost on THIS link)
  * preload paging rate (mmap -> RAM GB/s, the --moe-preload analog)
  * prefill full-stack streaming rate

On the axon tunnel the link is ~85 MB/s — the probe therefore measures
the WORST-case link; the plan doc's table scales the measured bytes/token
to PCIe-class links.  Run (TPU, serial):
    python tools/probe_moe_offload.py [--tokens 6] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOE_DIR = os.path.join(REPO, ".bench_cache", "qwen3-moe-synth")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=6,
                    help="decode tokens per run (each streams ~453 MB over "
                         "the tunnel; keep small)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--model", default=MOE_DIR)
    ap.add_argument("--skip-resident", action="store_true")
    args = ap.parse_args()

    import jax

    from smolvision_tpu.models import moe_offload as off_mod
    from smolvision_tpu.runtime.engine import Engine

    log(f"backend={jax.default_backend()}")

    out = {"model": args.model, "tokens_per_run": args.tokens}

    # ---- offload engine + gather byte counter --------------------------
    eng = Engine(args.model, verbose=0, moe_offload=True)
    eng.max_tokens = args.tokens

    store = eng.expert_store
    counted = {"bytes": 0, "calls": 0}
    orig_gather = off_mod.HostExpertStore.gather
    orig_full = off_mod.HostExpertStore.layer_full

    def gather(self, layer, idx):
        g, u, d = orig_gather(self, layer, idx)
        counted["bytes"] += g.nbytes + u.nbytes + d.nbytes
        counted["calls"] += 1
        return g, u, d

    full_counted = {"bytes": 0, "calls": 0}

    def layer_full(self, layer):
        g, u, d = orig_full(self, layer)
        full_counted["bytes"] += g.nbytes + u.nbytes + d.nbytes
        full_counted["calls"] += 1
        return g, u, d

    off_mod.HostExpertStore.gather = gather
    off_mod.HostExpertStore.layer_full = layer_full

    # preload paging rate (host mmap -> RAM)
    t0 = time.monotonic()
    touched = store.preload()
    dt = time.monotonic() - t0
    out["preload"] = {"bytes_gb": round(touched / 1e9, 3),
                      "s": round(dt, 2),
                      "gb_per_s": round(touched / 1e9 / max(dt, 1e-9), 2)}
    log(f"preload: {out['preload']}")

    # ---- thinker-style text decode (pure decode-loop measurement; no
    # audio so every decoded token is one offload_forward(Tcap=1) pass).
    # Sampled (temp 0.8): the offload host loop runs one _offload_step per
    # token; n = decode steps actually taken (EOS may cut a run short on a
    # synthetic checkpoint — tokens/s uses the real count).
    eng.temperature = 0.8
    eng.thinker_max_tokens = args.tokens

    def run_decode():
        counted["bytes"] = counted["calls"] = 0
        full_counted["bytes"] = full_counted["calls"] = 0
        t0 = time.monotonic()
        eng.thinker_generate(None, "count to ten")
        wall = time.monotonic() - t0
        n_tok = max(counted["calls"] // max(sum(store.is_moe), 1), 1)
        return wall, n_tok, dict(counted), dict(full_counted)

    # warmup (compiles part1/part2 jits + prefill)
    t0 = time.monotonic()
    run_decode()
    log(f"warm offload: {time.monotonic() - t0:.1f} s")

    runs = []
    for rep in range(args.reps):
        wall, n_tok, dec_c, pf_c = run_decode()
        # decode-phase wall: total minus the prefill stream share is not
        # separable host-side without stage marks; report both totals and
        # the per-token stream arithmetic from counted bytes
        r = {"wall_s": round(wall, 2), "tokens": n_tok,
             "decode_stream_gb": round(dec_c["bytes"] / 1e9, 3),
             "decode_gathers": dec_c["calls"],
             "prefill_stream_gb": round(pf_c["bytes"] / 1e9, 3)}
        runs.append(r)
        log(f"rep {rep + 1} offload: {r}")
    out["offload_runs"] = runs
    best = min(runs, key=lambda r: r["wall_s"])
    n_new = max(best["tokens"], 1)
    out["offload"] = {
        "tokens_per_s": round(n_new / best["wall_s"], 3),
        "stream_gb_per_token": round(best["decode_stream_gb"] / n_new, 3),
        # lower bound on the link: decode stream bytes / TOTAL wall
        # (includes prefill + compute, so the true link rate is higher)
        "effective_link_gb_per_s_lb": round(
            (best["decode_stream_gb"] + best["prefill_stream_gb"])
            / best["wall_s"], 3),
    }

    off_mod.HostExpertStore.gather = orig_gather
    off_mod.HostExpertStore.layer_full = orig_full

    # ---- resident comparison -------------------------------------------
    if not args.skip_resident:
        del eng
        import gc

        gc.collect()
        eng_r = Engine(args.model, verbose=0)
        eng_r.temperature = 0.8
        eng_r.thinker_max_tokens = args.tokens
        t0 = time.monotonic()
        eng_r.thinker_generate(None, "count to ten")
        log(f"warm resident: {time.monotonic() - t0:.1f} s")
        walls = []
        for rep in range(args.reps):
            t0 = time.monotonic()
            eng_r.thinker_generate(None, "count to ten")
            walls.append(time.monotonic() - t0)
            log(f"rep {rep + 1} resident: {walls[-1]:.2f} s")
        out["resident"] = {
            "tokens_per_s": round(args.tokens / min(walls), 2),
            "wall_s_best": round(min(walls), 2)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
