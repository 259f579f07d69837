#!/usr/bin/env python3
"""Serving-throughput probe: where does batch ASR serving top out on one
v5e, and what does continuous batching buy?

Sweeps the one-shot batched path (runtime/batch_segments.py) over B and the
continuous scheduler (runtime/serving.py) over slot counts / queue depths,
on jfk.wav replicas (uniform length — the upstream serving benchmark shape,
MODEL.md:466-468) and on a mixed-length queue (the workload continuous
batching exists for).

Discipline (CLAUDE.md): one jax process, strictly serial runs, every timed
run perturbs inputs with -80 dB noise (tunnel memoization), warmup run per
config before timing, best-of-N reported with the full list.

Usage: python tools/probe_serving.py [--runs 3] [--configs one32,one64,...]
Writes JSON lines to stderr progress + a final JSON array to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JFK = "/root/reference/samples/jfk.wav"
CLIP_45S = os.path.join("/root/reference/samples",
                        "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
NOISE = 1e-4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--configs", default="")
    args = ap.parse_args()
    only = {c for c in args.configs.split(",") if c}

    def want(name):
        return not only or name in only

    import numpy as np

    from tools.engineer_checkpoint import ensure_engineered
    ensure_engineered(BENCH_DIR)

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import batch_segments as bs_mod
    from smolvision_tpu.runtime import serving as srv_mod
    from smolvision_tpu.runtime.engine import Engine

    rng = np.random.default_rng(0xCAFE)
    base = load_wav(JFK)
    jfk_s = len(base) / 16000.0

    eng = Engine(BENCH_DIR, verbose=0)
    eng.max_tokens = 48
    eng.segment_sec = 0.0
    log("probe_serving: model loaded")

    def perturb(s):
        return (s + rng.normal(0.0, NOISE, len(s))).astype(np.float32)

    def mixed_queue(n):
        """n clips, 25% each of ~3/5/8/11 s (jfk truncations)."""
        out = []
        for i in range(n):
            dur = [3.0, 5.0, 8.0, 11.0][i % 4]
            out.append(base[: int(16000 * dur)])
        return out

    results = []

    def run_config(name, clips_fn, fn, runs):
        clips0 = [perturb(c) for c in clips_fn()]
        audio_s = sum(len(c) for c in clips0) / 16000.0
        t0 = time.monotonic()
        fn(clips0)
        warm = time.monotonic() - t0
        log(f"probe_serving: {name} warmup {warm:.1f} s "
            f"({audio_s:.0f} s audio)")
        walls = []
        for i in range(runs):
            clips = [perturb(c) for c in clips_fn()]
            t0 = time.monotonic()
            fn(clips)
            w = time.monotonic() - t0
            walls.append(round(w, 3))
            log(f"probe_serving: {name} run {i + 1}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        best = min(walls)
        rec = {"config": name, "audio_s": round(audio_s, 1),
               "walls_s": walls, "best_s": best,
               "s_speech_per_s": round(audio_s / best, 1)}
        results.append(rec)
        log(json.dumps(rec))

    # int8 KV cache engine (--kv8): same weights/jit surface, quantized
    # batched cache — the roofline doc's top remaining decode lever
    _kv8 = [None]

    def eng_kv8():
        if _kv8[0] is None:
            e = Engine(BENCH_DIR, verbose=0, kv8=True)
            e.max_tokens = 48
            e.segment_sec = 0.0
            log("probe_serving: kv8 engine loaded")
            _kv8[0] = e
        return _kv8[0]

    # ---- one-shot batched, uniform jfk, B sweep ------------------------
    for B in (32, 64, 128):
        if want(f"one{B}"):
            run_config(
                f"one-shot B={B} jfk",
                lambda B=B: [base] * B,
                lambda clips: bs_mod.transcribe_segments_batched(eng, clips),
                args.runs)
    if want("one32kv8"):
        run_config(
            "one-shot B=32 jfk KV8",
            lambda: [base] * 32,
            lambda clips: bs_mod.transcribe_segments_batched(eng_kv8(), clips),
            args.runs)

    # ---- stage attribution: one B=32 run with debug fences -------------
    if want("dbg32"):
        os.environ["SMOLVISION_BATCH_DEBUG"] = "1"
        run_config(
            "one-shot B=32 jfk DEBUG-FENCED (stage marks on stderr; "
            "fences add RTTs — wall is NOT comparable)",
            lambda: [base] * 32,
            lambda clips: bs_mod.transcribe_segments_batched(eng, clips),
            1)
        del os.environ["SMOLVISION_BATCH_DEBUG"]

    # ---- continuous, uniform jfk: queue 128, slot sweep ----------------
    for S in (32, 64, 128):
        if want(f"cont{S}"):
            run_config(
                f"continuous slots={S} queue=128 jfk",
                lambda: [base] * 128,
                lambda clips, S=S: srv_mod.serve_continuous(
                    eng, clips, slots=S, encode_group=S),
                args.runs)

    # ---- mixed-length queue: one-shot vs continuous --------------------
    if want("mixone"):
        run_config("one-shot mixed-128",
                   lambda: mixed_queue(128),
                   lambda clips: bs_mod.transcribe_segments_batched(eng, clips),
                   args.runs)
    if want("mixcont"):
        run_config("continuous slots=64 mixed-128",
                   lambda: mixed_queue(128),
                   lambda clips: srv_mod.serve_continuous(
                       eng, clips, slots=64, encode_group=64),
                   args.runs)
    if want("cont64kv8"):
        run_config("continuous slots=64 queue=128 jfk KV8",
                   lambda: [base] * 128,
                   lambda clips: srv_mod.serve_continuous(
                       eng_kv8(), clips, slots=64, encode_group=64),
                   args.runs)

    # ---- round-3 pipelining A/B, paired in ONE process -----------------
    # (prefill-shadow encode + encode top-up + wave-boundary clock reset
    #  + fused token fetch vs the legacy schedule via NO_PIPE3; group=32
    #  so the shadows get upload-sized work units)
    if want("pipe3ab"):
        for tag, env, grp in (("PIPE3 g32", None, 32),
                              ("PIPE3 g64", None, 64),
                              ("legacy g64", "1", 64)):
            if env is None:
                os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
            else:
                os.environ["SMOLVISION_SERVE_NO_PIPE3"] = env
            run_config(f"continuous slots=64 queue=128 jfk {tag}",
                       lambda: [base] * 128,
                       lambda clips, g=grp: srv_mod.serve_continuous(
                           eng, clips, slots=64, encode_group=g),
                       args.runs)
        os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
    if want("pipe3abkv8"):
        for tag, env in (("PIPE3 kv8", None), ("legacy kv8", "1")):
            if env is None:
                os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
            else:
                os.environ["SMOLVISION_SERVE_NO_PIPE3"] = env
            run_config(f"continuous slots=64 queue=128 jfk {tag} g32",
                       lambda: [base] * 128,
                       lambda clips: srv_mod.serve_continuous(
                           eng_kv8(), clips, slots=64, encode_group=32),
                       args.runs)
        os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)

    # ---- INTERLEAVED pipe3 A/B: alternate schedules run-by-run so the
    # axon server's period-to-period variance (~±25%) hits both arms
    # equally — sequential config blocks measured 687-vs-533 one hour and
    # 467-vs-579 the next; only interleaving decides honestly
    def interleaved(name, engine_fn, grp, clips_fn=None):
        e = engine_fn()
        if clips_fn is None:
            clips_fn = lambda: [base] * 128
        walls = {"pipe3": [], "legacy": []}
        for tag in ("pipe3", "legacy"):       # warm both program sets
            if tag == "legacy":
                os.environ["SMOLVISION_SERVE_NO_PIPE3"] = "1"
            else:
                os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
            srv_mod.serve_continuous(e, [perturb(c) for c in clips_fn()],
                                     slots=64, encode_group=grp)
        audio_s = sum(len(c) for c in clips_fn()) / 16000.0
        for rep in range(args.runs * 2):
            tag = "pipe3" if rep % 2 == 0 else "legacy"
            if tag == "legacy":
                os.environ["SMOLVISION_SERVE_NO_PIPE3"] = "1"
            else:
                os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
            clips = [perturb(c) for c in clips_fn()]
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=64, encode_group=grp)
            w = time.monotonic() - t0
            walls[tag].append(round(w, 3))
            log(f"probe_serving: {name} {tag} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        os.environ.pop("SMOLVISION_SERVE_NO_PIPE3", None)
        rec = {"config": name, "audio_s": round(audio_s, 1)}
        for tag, ws in walls.items():
            rec[f"{tag}_walls_s"] = ws
            rec[f"{tag}_best"] = round(audio_s / min(ws), 1)
            rec[f"{tag}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    # prompt-cap granularity A/B: bucket64 (round-3) vs bucket128 (round-2)
    # on the one-shot B=32 path, interleaved
    if want("capalt"):
        walls = {"cap64": [], "cap128": []}

        def set_cap(tag):
            if tag == "cap128":
                os.environ["SMOLVISION_CAP128"] = "1"
            else:
                os.environ.pop("SMOLVISION_CAP128", None)

        for tag in ("cap64", "cap128"):
            set_cap(tag)
            bs_mod.transcribe_segments_batched(
                eng, [perturb(base) for _ in range(32)])
            log(f"probe_serving: capalt {tag} warm")
        for rep in range(args.runs * 2):
            tag = "cap64" if rep % 2 == 0 else "cap128"
            set_cap(tag)
            clips = [perturb(base) for _ in range(32)]
            t0 = time.monotonic()
            bs_mod.transcribe_segments_batched(eng, clips)
            w = time.monotonic() - t0
            walls[tag].append(round(w, 3))
            log(f"probe_serving: capalt {tag} rep{rep}: {w:.2f} s "
                f"= {32 * jfk_s / w:.0f} s-speech/s")
        set_cap("cap64")
        rec = {"config": "INTERLEAVED cap64-vs-cap128 one-shot B=32"}
        for tag, ws in walls.items():
            rec[f"{tag}_walls_s"] = ws
            rec[f"{tag}_best"] = round(32 * jfk_s / min(ws), 1)
            rec[f"{tag}_median"] = round(
                32 * jfk_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    # slot-depth A/B: slots=64 vs slots=128 (decode B amortizes the 1.26 GB
    # weight stream 2x further; encode stays in groups of 32 — the one-shot
    # B=128 conv-stem OOM never applies to the continuous path)
    def slot_interleaved(name, engine_fn, arms=(64, 128)):
        e = engine_fn()
        walls = {s: [] for s in arms}
        for s in arms:                       # warm both program ladders
            srv_mod.serve_continuous(e, [perturb(base) for _ in range(128)],
                                     slots=s, encode_group=32)
            log(f"probe_serving: {name} slots={s} warm")
        audio_s = 128 * jfk_s
        for rep in range(args.runs * 2):
            s = arms[rep % 2]
            clips = [perturb(base) for _ in range(128)]
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=s, encode_group=32)
            w = time.monotonic() - t0
            walls[s].append(round(w, 3))
            log(f"probe_serving: {name} slots={s} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        rec = {"config": name}
        for s, ws in walls.items():
            rec[f"slots{s}_walls_s"] = ws
            rec[f"slots{s}_best"] = round(audio_s / min(ws), 1)
            rec[f"slots{s}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    if want("slotalt"):
        slot_interleaved("INTERLEAVED slots 64-vs-128 bf16 g32 queue=128",
                         lambda: eng)
    if want("slotaltkv8"):
        slot_interleaved("INTERLEAVED slots 64-vs-128 kv8 g32 queue=128",
                         eng_kv8)

    # slot-depth A/B with the tunnel-upload term EXCLUDED (prestaged
    # audio): the live slots=128 loss was measured through the ~43 MB/s
    # upload bound that dominates queue=128 walls — on-chip, deeper slots
    # amortize the decode weight stream further and may flip the verdict.
    # queue=256 gives BOTH arms >=2 admission waves (standby prefill and
    # mid-flight admission exercised equally).
    def devres_slot_interleaved(name, engine_fn, arms=(64, 128), queue=256,
                                grp=32):
        e = engine_fn()
        walls = {s: [] for s in arms}
        for s in arms:                       # warm both program ladders
            cs = [perturb(base) for _ in range(queue)]
            srv_mod.serve_continuous(
                e, cs, slots=s, encode_group=grp,
                prestaged=srv_mod.prestage_uploads(e, cs, encode_group=grp))
            log(f"probe_serving: {name} slots={s} warm")
        audio_s = queue * jfk_s
        for rep in range(args.runs * 2):
            s = arms[rep % 2]
            clips = [perturb(base) for _ in range(queue)]
            pre = srv_mod.prestage_uploads(e, clips, encode_group=grp)
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=s, encode_group=grp,
                                     prestaged=pre)
            w = time.monotonic() - t0
            walls[s].append(round(w, 3))
            log(f"probe_serving: {name} slots={s} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        rec = {"config": name}
        for s, ws in walls.items():
            rec[f"slots{s}_walls_s"] = ws
            rec[f"slots{s}_best"] = round(audio_s / min(ws), 1)
            rec[f"slots{s}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    if want("devresslots"):
        devres_slot_interleaved(
            "INTERLEAVED devres slots 64-vs-128 kv8 g32 queue=256", eng_kv8)
    if want("devresslotsbf16"):
        devres_slot_interleaved(
            "INTERLEAVED devres slots 64-vs-128 bf16 g32 queue=256",
            lambda: eng)

    # upload-split A/B: two-stage encode queue (upload shadow-staged a
    # round ahead of the encode dispatches) vs the round-3 combined
    # encode_more, interleaved
    def env_interleaved(name, env_var, engine_fn, arms=("on", "off"),
                        slots=64, grp=32, clips_fn=None):
        e = engine_fn()
        walls = {a: [] for a in arms}
        mk = clips_fn or (lambda: [perturb(base) for _ in range(128)])

        def set_arm(a):
            if a == "off":
                os.environ[env_var] = "1"
            else:
                os.environ.pop(env_var, None)

        for a in arms:
            set_arm(a)
            srv_mod.serve_continuous(e, mk(), slots=slots, encode_group=grp)
            log(f"probe_serving: {name} {a} warm")
        for a in arms:   # second warm pass: late-discovered shapes
            set_arm(a)
            srv_mod.serve_continuous(e, mk(), slots=slots, encode_group=grp)
        for rep in range(args.runs * 2):
            a = arms[rep % 2]
            set_arm(a)
            clips = mk()
            audio_s = sum(len(c) for c in clips) / 16000.0
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=slots, encode_group=grp)
            w = time.monotonic() - t0
            walls[a].append(round(w, 3))
            log(f"probe_serving: {name} {a} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        set_arm("on")
        audio_s = sum(len(c) for c in mk()) / 16000.0
        rec = {"config": name}
        for a, ws in walls.items():
            rec[f"{a}_walls_s"] = ws
            rec[f"{a}_best"] = round(audio_s / min(ws), 1)
            rec[f"{a}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    if want("upalt"):
        env_interleaved("INTERLEAVED upsplit-vs-combined bf16 s64 g32",
                        "SMOLVISION_SERVE_NO_UPSPLIT", lambda: eng)

    # on-chip encode-group sweep: with the upload artifact removed
    # (prestaged), does a bigger conv/encoder dispatch unit pay?
    def devres_grp_interleaved(name, engine_fn, arms=(32, 64), slots=64):
        e = engine_fn()
        walls = {g: [] for g in arms}
        for g in arms:
            cs = [perturb(base) for _ in range(128)]
            srv_mod.serve_continuous(
                e, cs, slots=slots, encode_group=g,
                prestaged=srv_mod.prestage_uploads(e, cs, encode_group=g))
            log(f"probe_serving: {name} g{g} warm")
        audio_s = 128 * jfk_s
        for rep in range(args.runs * 2):
            g = arms[rep % 2]
            clips = [perturb(base) for _ in range(128)]
            pre = srv_mod.prestage_uploads(e, clips, encode_group=g)
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=slots, encode_group=g,
                                     prestaged=pre)
            w = time.monotonic() - t0
            walls[g].append(round(w, 3))
            log(f"probe_serving: {name} g{g} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        rec = {"config": name}
        for g, ws in walls.items():
            rec[f"g{g}_walls_s"] = ws
            rec[f"g{g}_best"] = round(audio_s / min(ws), 1)
            rec[f"g{g}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    if want("devresg"):
        devres_grp_interleaved("INTERLEAVED devres g32-vs-g64 kv8 s64",
                               eng_kv8)

    # device-resident audio A/B: prestage_uploads ships every group's
    # padded audio stack before the timer — the arm difference IS the
    # tunnel-upload term (~43 MB/s effective), i.e. what a production
    # host's NIC/PCIe front end would make vanish
    def devres_interleaved(name, engine_fn, slots=64, grp=32):
        e = engine_fn()
        walls = {"devres": [], "live": []}
        warm_clips = [perturb(base) for _ in range(128)]
        pre = srv_mod.prestage_uploads(e, warm_clips, encode_group=grp)
        srv_mod.serve_continuous(e, warm_clips, slots=slots,
                                 encode_group=grp, prestaged=pre)
        srv_mod.serve_continuous(e, [perturb(base) for _ in range(128)],
                                 slots=slots, encode_group=grp)
        log(f"probe_serving: {name} warm")
        audio_s = 128 * jfk_s
        for rep in range(args.runs * 2):
            a = "devres" if rep % 2 == 0 else "live"
            clips = [perturb(base) for _ in range(128)]
            pre = (srv_mod.prestage_uploads(e, clips, encode_group=grp)
                   if a == "devres" else None)
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=slots, encode_group=grp,
                                     prestaged=pre)
            w = time.monotonic() - t0
            walls[a].append(round(w, 3))
            log(f"probe_serving: {name} {a} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s")
        rec = {"config": name}
        for a, ws in walls.items():
            rec[f"{a}_walls_s"] = ws
            rec[f"{a}_best"] = round(audio_s / min(ws), 1)
            rec[f"{a}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
        results.append(rec)
        log(json.dumps(rec))

    if want("devres"):
        devres_interleaved("INTERLEAVED devres-vs-live bf16 s64 g32", lambda: eng)
    if want("devreskv8"):
        devres_interleaved("INTERLEAVED devres-vs-live kv8 s64 g32", eng_kv8)

    # admission-cap latency knob: TTFT/throughput tradeoff, interleaved
    def admit_interleaved(name, engine_fn, cap=16, slots=64, grp=32):
        e = engine_fn()
        arms = {"cap": cap, "full": 0}
        walls = {a: [] for a in arms}
        lat = {a: None for a in arms}
        for a, c in arms.items():
            srv_mod.serve_continuous(e, [perturb(base) for _ in range(128)],
                                     slots=slots, encode_group=grp,
                                     admit_cap=c)
            log(f"probe_serving: {name} {a} warm")
        audio_s = 128 * jfk_s
        for rep in range(args.runs * 2):
            a = "cap" if rep % 2 == 0 else "full"
            clips = [perturb(base) for _ in range(128)]
            t0 = time.monotonic()
            srv_mod.serve_continuous(e, clips, slots=slots, encode_group=grp,
                                     admit_cap=arms[a])
            w = time.monotonic() - t0
            walls[a].append(round(w, 3))
            lat[a] = e.perf.serving_latency
            log(f"probe_serving: {name} {a} rep{rep}: {w:.2f} s "
                f"= {audio_s / w:.0f} s-speech/s "
                f"admit_ttft_p50={lat[a]['admit_ttft_p50_ms']:.0f} ms "
                f"ttft_p50={lat[a]['ttft_p50_ms']:.0f} ms")
        rec = {"config": name}
        for a, ws in walls.items():
            rec[f"{a}_walls_s"] = ws
            rec[f"{a}_best"] = round(audio_s / min(ws), 1)
            rec[f"{a}_median"] = round(audio_s / sorted(ws)[len(ws) // 2], 1)
            rec[f"{a}_latency"] = lat[a]
        results.append(rec)
        log(json.dumps(rec))

    if want("admitcap"):
        admit_interleaved("INTERLEAVED admit16-vs-full bf16 s64 g32",
                          lambda: eng)

    # standby wave prefill: next wave's group prefill dispatched behind
    # the in-flight decode chunk vs computed at the wave boundary
    if want("standby"):
        env_interleaved("INTERLEAVED standby-vs-boundary bf16 s64 g32",
                        "SMOLVISION_SERVE_NO_STANDBY", lambda: eng)
    if want("standbykv8"):
        env_interleaved("INTERLEAVED standby-vs-boundary kv8 s64 g32",
                        "SMOLVISION_SERVE_NO_STANDBY", eng_kv8)
    if want("standbymix"):
        env_interleaved("INTERLEAVED standby-vs-boundary bf16 mixed-128",
                        "SMOLVISION_SERVE_NO_STANDBY", lambda: eng,
                        clips_fn=lambda: [perturb(c)
                                          for c in mixed_queue(128)])

    if want("pipe3alt"):
        interleaved("INTERLEAVED pipe3-vs-legacy bf16 g32", lambda: eng, 32)
    if want("pipe3altkv8"):
        interleaved("INTERLEAVED pipe3-vs-legacy kv8 g32", eng_kv8, 32)
    if want("mixalt"):
        interleaved("INTERLEAVED pipe3-vs-legacy mixed-128 g32", lambda: eng,
                    32, clips_fn=lambda: mixed_queue(128))

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
