#!/usr/bin/env python3
"""Benchmark: all four BASELINE.md speed configs on one TPU v5e chip.

Emits one JSON line per config on stdout (the HEADLINE offline metric is
printed LAST so single-line consumers keep reading it):
  * serving: 32 x jfk.wav in one batch vs the upstream vendor serving stack
    (~2000 s-speech/s at 128 concurrency, MODEL.md:466-468),
  * streaming: 45 s clip, --stream semantics, vs the C engine's 4.69x
    (README.md:406-411),
  * segmented: 88.9 s clip, -S 30 -W 3, vs the C engine's 6.78x
    (README.md:404),
  * offline (headline): jfk.wav (11.0 s), -S 0, vs the C engine's 7.99x
    realtime on an Apple M3 Max (README.md:398-402).
    North star: >= 50x realtime on one TPU v5e chip.

Real Qwen weights are not downloadable in this environment, so the bench uses
an ENGINEERED synthetic checkpoint with the exact 0.6B geometry (identical
FLOPs/bytes; tools/engineer_checkpoint.py): greedy ASR decode on jfk.wav
emits <asr_text> + 40 text tokens + EOS — matching the real model's ~40
tokens for jfk — so the offline/serving paths time the REAL gated decode +
tokenizer + callback work (round 2 benched a plain random checkpoint whose
first greedy token was EOS: offline decode work was argued equivalent via
the 48-step cap, but serving's batched decode early-exited and streaming
chunks decoded ~1 token; round-3 numbers are therefore more honest and not
directly comparable for serving/streaming).  On non-jfk clips EOS stays
suppressed and decode runs to its caps (48 offline / 32 per stream chunk),
like a real transcription's token volume.

Measurement discipline (CLAUDE.md landmines): every timed run perturbs its
input with -80 dB noise so the axon tunnel's dispatch memoization can never
serve a cached result; runs are strictly serial in one process.

Set SMOLVISION_BENCH_ONLY=offline[,streaming,segmented,serving,offline_q8,offline_spec,
offline_17,offline_17_spec,multistream,seg17,stream17,stream135] to restrict; `multistream` runs
ONLY when explicitly named (compile warmup up to ~17 min under server-side compile
variance).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SAMPLES = "/root/reference/samples"
JFK = os.path.join(SAMPLES, "jfk.wav")
CLIP_45S = os.path.join(SAMPLES, "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")
CLIP_89S = os.path.join(SAMPLES, "night_of_the_living_dead_1968",
                        "89s_ill_come_back_down_as_soon_as.wav")
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")
MAX_TOKENS = 48
RUNS = 3
NOISE = 1e-4  # ~-80 dB: defeats tunnel memoization, leaves the work identical

BASE_OFFLINE = 7.99     # jfk.wav, 0.6B, -S 0 (README.md:398-402)
BASE_OFFLINE_17 = 4.29  # jfk.wav, 1.7B, -S 0 (README.md:402)
BASE_SEGMENTED = 6.78   # 88.9 s, -S 30 -W 3 (README.md:404)
BASE_STREAMING = 4.69   # 45 s, --stream, enc cache ON (README.md:406-411)
BASE_STREAM135 = 0.96   # 135 s file, --stream, 0.6B (README.md:419-424)
BASE_SERVING = 2000.0   # upstream vendor stack, 128 concurrency (MODEL.md:466)


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


def ensure_model() -> str:
    from tools.engineer_checkpoint import ensure_engineered

    report = ensure_engineered(BENCH_DIR)
    if not report.get("ok"):
        log("bench: WARNING engineered-checkpoint probe failed — gated "
            "decode may emit no text tokens")
    return BENCH_DIR


def _perturb(samples, rng):
    import numpy as np

    return (samples + rng.normal(0.0, NOISE, len(samples))).astype(np.float32)


def _timed_runs(label, fn, samples, rng, runs=RUNS):
    """Best wall-clock ms over `runs` perturbed-input repetitions."""
    best = float("inf")
    for i in range(runs):
        clip = _perturb(samples, rng)
        t0 = time.monotonic()
        fn(clip)
        ms = (time.monotonic() - t0) * 1000.0
        log(f"bench: {label} run {i + 1}: {ms:.0f} ms")
        best = min(best, ms)
    return best


def main() -> int:
    only = {s.strip() for s in
            os.environ.get("SMOLVISION_BENCH_ONLY", "").split(",") if s.strip()}

    def want(name):
        return not only or name in only

    model_dir = ensure_model()

    import jax

    # persistent compile cache: CPU only — on the axon TPU backend a
    # deserialized executable recompiles server-side on first EXECUTION,
    # ~5x slower than a fresh compile (tools/probe_cache_load.py), so cache
    # hits made repeat bench runs slower, not faster
    if jax.default_backend() == "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".bench_cache", "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log(f"bench: backend={jax.default_backend()} devices={jax.devices()}")

    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import batch_segments as bs_mod
    from smolvision_tpu.runtime import segment as segment_mod
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    rng = np.random.default_rng(0x5EED)
    t0 = time.monotonic()
    eng = Engine(model_dir, verbose=0)
    eng.max_tokens = MAX_TOKENS
    log(f"bench: model loaded in {time.monotonic() - t0:.1f} s")

    results = []

    def emit(r):
        results.append(r)
        print(json.dumps(r), flush=True)

    # ---- serving: 32 x jfk.wav in ONE batch ----------------------------
    if want("serving"):
        base = load_wav(JFK)
        audio_s = len(base) / 16000.0
        B = 32
        eng.segment_sec = 0.0
        clips = [_perturb(base, rng) for _ in range(B)]
        t0 = time.monotonic()
        bs_mod.transcribe_segments_batched(eng, clips)
        log(f"bench: serving warmup {time.monotonic() - t0:.1f} s")
        best = float("inf")
        for i in range(RUNS):
            clips = [_perturb(base, rng) for _ in range(B)]
            t0 = time.monotonic()
            bs_mod.transcribe_segments_batched(eng, clips)
            ms = (time.monotonic() - t0) * 1000.0
            log(f"bench: serving run {i + 1}: {ms:.0f} ms")
            best = min(best, ms)
        tput = B * audio_s / (best / 1000.0)
        emit({
            "metric": f"serving throughput, {B} x jfk.wav one batch "
                      "(Qwen3-ASR-0.6B geometry, 1 v5e chip)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            "vs_baseline": round(tput / BASE_SERVING, 3),
        })

        # continuous batching (runtime/serving.py): 128-clip queue through
        # rolling slots — the upstream baseline's shape (128 concurrency,
        # MODEL.md:466-468).  Rows admit as others hit EOS; the next wave's
        # encode (incl. the ~285 ms/32-clip tunnel audio upload) overlaps
        # the in-flight decode chunk.  Shares the one-shot warmup's shapes.
        from smolvision_tpu.runtime.serving import serve_continuous

        N_QUEUE, SLOTS, EGRP = 128, 64, 32   # encode_group=32: upload-sized
        # shadow work units (paired A/B in tools/probe_serving.py pipe3ab)
        clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
        t0 = time.monotonic()
        serve_continuous(eng, clips, slots=SLOTS, encode_group=EGRP)
        log(f"bench: serving-continuous warmup {time.monotonic() - t0:.1f} s")
        best = float("inf")
        for i in range(RUNS):
            clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
            t0 = time.monotonic()
            serve_continuous(eng, clips, slots=SLOTS, encode_group=EGRP)
            ms = (time.monotonic() - t0) * 1000.0
            log(f"bench: serving-continuous run {i + 1}: {ms:.0f} ms")
            best = min(best, ms)
        tput = N_QUEUE * audio_s / (best / 1000.0)
        lat = eng.perf.serving_latency   # last run's per-clip percentiles
        if lat:
            log(f"bench: serving latency {lat} (upstream TTFT baseline "
                "92 ms at 128 concurrency, MODEL.md:466-468)")
        emit({
            "metric": f"serving throughput, {N_QUEUE} x jfk.wav queued, "
                      f"continuous batching slots={SLOTS} "
                      "(Qwen3-ASR-0.6B geometry, 1 v5e chip)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            "vs_baseline": round(tput / BASE_SERVING, 3),
            **({"latency": lat} if lat else {}),
        })

        # continuous + int8 KV cache (--kv8, ops/quant.py QuantKV):
        # halves the B x kcap x L cache read that rivals the weight
        # stream at these batch sizes; measured +10-19% same-process
        # (docs/SERVING_ROOFLINE.md).  Outside the bf16 parity contract —
        # reported as an extra line, like --q8 offline.
        eng_kv8 = Engine(model_dir, verbose=0, kv8=True)
        eng_kv8.max_tokens = MAX_TOKENS
        eng_kv8.segment_sec = 0.0
        clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
        t0 = time.monotonic()
        serve_continuous(eng_kv8, clips, slots=SLOTS, encode_group=EGRP)
        log(f"bench: serving-kv8 warmup {time.monotonic() - t0:.1f} s")
        best = float("inf")
        for i in range(RUNS):
            clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
            t0 = time.monotonic()
            serve_continuous(eng_kv8, clips, slots=SLOTS, encode_group=EGRP)
            ms = (time.monotonic() - t0) * 1000.0
            log(f"bench: serving-kv8 run {i + 1}: {ms:.0f} ms")
            best = min(best, ms)
        tput = N_QUEUE * audio_s / (best / 1000.0)
        emit({
            "metric": f"serving throughput, {N_QUEUE} x jfk.wav queued, "
                      f"continuous slots={SLOTS}, int8 KV cache "
                      "(Qwen3-ASR-0.6B geometry, --kv8, 1 v5e chip)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            "vs_baseline": round(tput / BASE_SERVING, 3),
        })

        # continuous with the audio PRE-STAGED on device (prestage_uploads
        # runs before the timer): isolates the on-chip serving rate from
        # the axon tunnel's ~43 MB/s upload artifact, which is ~35% of
        # wall here and ~milliseconds on a production host's NIC/PCIe
        # (docs/SERVING_ROOFLINE.md).  Extra line; the tunnel-inclusive
        # number above stays the primary serving metric.
        from smolvision_tpu.runtime.serving import prestage_uploads

        best = float("inf")
        for i in range(RUNS):
            clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
            pre = prestage_uploads(eng, clips, encode_group=EGRP)
            t0 = time.monotonic()
            serve_continuous(eng, clips, slots=SLOTS, encode_group=EGRP,
                             prestaged=pre)
            ms = (time.monotonic() - t0) * 1000.0
            log(f"bench: serving-devres run {i + 1}: {ms:.0f} ms")
            best = min(best, ms)
        tput = N_QUEUE * audio_s / (best / 1000.0)
        emit({
            "metric": f"serving throughput, {N_QUEUE} x jfk.wav queued, "
                      f"continuous slots={SLOTS}, audio pre-staged on device "
                      "(on-chip rate, tunnel upload excluded — "
                      "Qwen3-ASR-0.6B geometry, 1 v5e chip)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            "vs_baseline": round(tput / BASE_SERVING, 3),
        })

        # pre-staged + int8 KV: the single-chip ceiling configuration
        # (probe: median 1044 / best 1073 s-speech/s — past half the
        # upstream multi-accelerator 2000 on ONE v5e)
        best = float("inf")
        for i in range(RUNS):
            clips = [_perturb(base, rng) for _ in range(N_QUEUE)]
            pre = prestage_uploads(eng_kv8, clips, encode_group=EGRP)
            t0 = time.monotonic()
            serve_continuous(eng_kv8, clips, slots=SLOTS, encode_group=EGRP,
                             prestaged=pre)
            ms = (time.monotonic() - t0) * 1000.0
            log(f"bench: serving-devres-kv8 run {i + 1}: {ms:.0f} ms")
            best = min(best, ms)
        del eng_kv8
        tput = N_QUEUE * audio_s / (best / 1000.0)
        emit({
            "metric": f"serving throughput, {N_QUEUE} x jfk.wav queued, "
                      f"continuous slots={SLOTS}, int8 KV + audio pre-staged "
                      "on device (on-chip rate — Qwen3-ASR-0.6B geometry, "
                      "--kv8, 1 v5e chip)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            "vs_baseline": round(tput / BASE_SERVING, 3),
        })

    # ---- streaming: 45 s clip, --stream semantics ----------------------
    if want("streaming"):
        s45 = load_wav(CLIP_45S)
        audio_s = len(s45) / 16000.0
        eng.segment_sec = 0.0
        eng.past_text_conditioning = True      # --stream auto default
        eng.token_cb = lambda piece: None      # token streaming enabled
        stream_mod.transcribe_stream(eng, _perturb(s45, rng))
        log(f"bench: streaming warmup done ({eng.perf.total_ms:.0f} ms)")
        best_ms = _timed_runs(
            "streaming", lambda c: stream_mod.transcribe_stream(eng, c),
            s45, rng)
        eng.token_cb = None
        eng.past_text_conditioning = False
        rtf = audio_s / (best_ms / 1000.0)
        lat = eng.perf.stream_latency()   # last run's per-chunk walls
        lat_obj = None
        if lat is not None:
            first, p50, p99 = lat
            lat_obj = {"first_commit_ms": round(first, 1) if first is not None else None,
                       "chunk_p50_ms": round(p50, 1),
                       "chunk_p99_ms": round(p99, 1),
                       "chunks": len(eng.perf.stream_chunk_ms)}
            log(f"bench: streaming latency {lat_obj} "
                "(upstream TTFT baseline 92 ms, MODEL.md:466-468)")
        emit({
            "metric": "45 s clip streaming realtime factor "
                      "(Qwen3-ASR-0.6B geometry, --stream, enc cache ON)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_STREAMING, 2),
            **({"latency": lat_obj} if lat_obj else {}),
        })

    # ---- long-file streaming: ~134 s, --stream semantics (opt-in) ------
    # The reference's most dramatic streaming row: on a 135 s file its
    # --stream drops to 0.96x realtime while its own offline -S 30 does
    # 9.64x (README.md:419-424) — steady-state chunks carry the full
    # 4-window prompt and the M3 Max can't keep up.  Our sliding window has
    # the same bounded context, and the realtime factor HOLDS: measured
    # 14.28x best-of-3 (warm runs 9.4-25 s) on 2026-08-19 — ~14.9x the
    # reference.  One earlier window measured 1.56x with ~90 s warm runs;
    # tools/probe_stream135.py attributed that entirely to an axon
    # slow-compile period (cold run 179 s, warm 10.4 s = 12.9x; steady
    # chunks ~120-180 ms).  Clip: the two real speech samples concatenated
    # (45 s + 89 s = 133.9 s — same speaker/recording session).
    if "stream135" in only:
        s135 = np.concatenate([load_wav(CLIP_45S), load_wav(CLIP_89S)])
        audio_s = len(s135) / 16000.0
        eng.segment_sec = 0.0
        eng.past_text_conditioning = True
        eng.token_cb = lambda piece: None
        stream_mod.transcribe_stream(eng, _perturb(s135, rng))
        log(f"bench: stream135 warmup done ({eng.perf.total_ms:.0f} ms)")
        best_ms = _timed_runs(
            "stream135", lambda c: stream_mod.transcribe_stream(eng, c),
            s135, rng)
        eng.token_cb = None
        eng.past_text_conditioning = False
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "133.9 s clip streaming realtime factor "
                      "(Qwen3-ASR-0.6B geometry, --stream, enc cache ON; "
                      "reference drops to 0.96x on 135 s, README.md:419-424)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_STREAM135, 2),
        })

    # ---- multi-stream: 8 concurrent 45 s streaming sessions ------------
    # NOT in the default set: the batched coordinator's first-touch warmup
    # compiles a ladder of (pcap, delta, B) buckets; the concurrent prewarm
    # (multistream._prewarm_batched) cut it 1032 s -> ~190-315 s, but this
    # remains the bench's most variance-exposed config — run it explicitly
    # with SMOLVISION_BENCH_ONLY=multistream.  Measured 2026-08-17 across
    # several runs: 47.6-59.1 s_speech_per_s (10-12.6x the C engine's
    # single-stream 4.69x); warm 8x45s runs span 6.1-14.8 s with the axon
    # server's period-to-period variance.
    if "multistream" in only:
        from smolvision_tpu.runtime import multistream as ms_mod

        s45 = load_wav(CLIP_45S)
        audio_s = len(s45) / 16000.0
        N = 8
        eng.segment_sec = 0.0
        eng.past_text_conditioning = True
        sessions = [_perturb(s45, rng) for _ in range(N)]
        t0 = time.monotonic()
        ms_mod.run_streams(eng, sessions)
        log(f"bench: multistream warmup {time.monotonic() - t0:.1f} s")
        best = float("inf")
        for i in range(RUNS):
            sessions = [_perturb(s45, rng) for _ in range(N)]
            t0 = time.monotonic()
            ms_mod.run_streams(eng, sessions)
            s = time.monotonic() - t0
            log(f"bench: multistream run {i + 1}: {s:.1f} s")
            best = min(best, s)
        eng.past_text_conditioning = False
        tput = N * audio_s / best
        emit({
            "metric": f"multi-stream streaming aggregate, {N} x 45 s sessions "
                      "(Qwen3-ASR-0.6B geometry, batched coordinator, 1 v5e)",
            "value": round(tput, 1),
            "unit": "s_speech_per_s",
            # the C engine streams ONE session per process at 4.69x realtime
            "vs_baseline": round(tput / BASE_STREAMING, 2),
        })

    # ---- segmented: 88.9 s clip, -S 30 -W 3 ----------------------------
    if want("segmented"):
        s89 = load_wav(CLIP_89S)
        audio_s = len(s89) / 16000.0
        eng.segment_sec = 30.0
        eng.search_sec = 3.0
        segment_mod.transcribe_audio(eng, _perturb(s89, rng))
        log("bench: segmented warmup done")
        best_ms = _timed_runs(
            "segmented", lambda c: segment_mod.transcribe_audio(eng, c),
            s89, rng)
        eng.segment_sec = 0.0
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "88.9 s clip segmented realtime factor "
                      "(Qwen3-ASR-0.6B geometry, -S 30 -W 3)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_SEGMENTED, 2),
        })

    # ---- offline with int8 decoder weights (--q8) -----------------------
    # Outside the bf16 token-parity contract (ops/quant.py): reported as an
    # extra line; the bf16 headline stays last.
    if want("offline_q8"):
        samples = load_wav(JFK)
        audio_s = len(samples) / 16000.0
        eng_q8 = Engine(model_dir, verbose=0, q8=True)
        eng_q8.max_tokens = MAX_TOKENS
        eng_q8.segment_sec = 0.0
        t0 = time.monotonic()
        segment_mod.transcribe_audio(eng_q8, _perturb(samples, rng))
        log(f"bench: offline-q8 warmup {time.monotonic() - t0:.1f} s")
        best_ms = float("inf")
        for i in range(RUNS + 2):
            segment_mod.transcribe_audio(eng_q8, _perturb(samples, rng))
            ms = eng_q8.perf.total_ms
            log(f"bench: offline-q8 run {i + 1}: {ms:.0f} ms "
                f"(mel+enc {eng_q8.perf.encode_ms:.0f}, dec {eng_q8.perf.decode_ms:.0f})")
            best_ms = min(best_ms, ms)
        del eng_q8
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "jfk.wav offline realtime factor, int8 decoder weights "
                      "(Qwen3-ASR-0.6B geometry, -S 0, --q8)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_OFFLINE, 2),
        })

    # ---- offline with speculative int8-draft decoding (--spec) ----------
    # Draft SPEC_DRAFT tokens with an int8 decoder copy, verify in one bf16
    # forward: output is BIT-EXACT bf16 greedy (inside the parity contract,
    # unlike --q8) at a decode cost approaching the int8 stream.
    if want("offline_spec"):
        samples = load_wav(JFK)
        audio_s = len(samples) / 16000.0
        eng_spec = Engine(model_dir, verbose=0, spec=True)
        eng_spec.max_tokens = MAX_TOKENS
        eng_spec.segment_sec = 0.0
        t0 = time.monotonic()
        segment_mod.transcribe_audio(eng_spec, _perturb(samples, rng))
        log(f"bench: offline-spec warmup {time.monotonic() - t0:.1f} s")
        best_ms = float("inf")
        for i in range(RUNS + 2):
            segment_mod.transcribe_audio(eng_spec, _perturb(samples, rng))
            ms = eng_spec.perf.total_ms
            log(f"bench: offline-spec run {i + 1}: {ms:.0f} ms "
                f"(mel+enc {eng_spec.perf.encode_ms:.0f}, dec {eng_spec.perf.decode_ms:.0f})")
            best_ms = min(best_ms, ms)
        if eng_spec.perf.spec_iters:
            p = eng_spec.perf
            log(f"bench: offline-spec acceptance {p.spec_tokens}/{p.spec_iters}"
                f" = {p.spec_tokens / p.spec_iters:.2f} tokens/verify-iter")
        del eng_spec
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "jfk.wav offline realtime factor, speculative int8-draft "
                      "decode, bf16-exact tokens (Qwen3-ASR-0.6B geometry, "
                      "-S 0, --spec)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_OFFLINE, 2),
        })

    # ---- offline, 1.7B geometry: jfk.wav, -S 0 --------------------------
    # The second BASELINE.md model size (README.md:402: 2.6 s inference,
    # 4.29x realtime on M3 Max).  Engineered 1.7B-geometry checkpoint
    # (identical FLOPs/bytes to the real 1.7B; same 40-token gated chain).
    if want("offline_17"):
        from tools.engineer_checkpoint import OUT_17, ensure_engineered

        rep17 = ensure_engineered(OUT_17, geom="1.7b")
        if not rep17.get("ok"):
            log("bench: WARNING 1.7b engineered-checkpoint probe failed")
        samples = load_wav(JFK)
        audio_s = len(samples) / 16000.0
        eng17 = Engine(OUT_17, verbose=0)
        eng17.max_tokens = MAX_TOKENS
        eng17.segment_sec = 0.0
        t0 = time.monotonic()
        segment_mod.transcribe_audio(eng17, _perturb(samples, rng))
        log(f"bench: offline-1.7b warmup {time.monotonic() - t0:.1f} s; "
            f"decoded {eng17.perf.text_tokens} text tokens")
        best_ms = float("inf")
        for i in range(RUNS + 2):
            segment_mod.transcribe_audio(eng17, _perturb(samples, rng))
            ms = eng17.perf.total_ms
            log(f"bench: offline-1.7b run {i + 1}: {ms:.0f} ms "
                f"(mel+enc {eng17.perf.encode_ms:.0f}, "
                f"dec {eng17.perf.decode_ms:.0f})")
            best_ms = min(best_ms, ms)
        del eng17
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "jfk.wav offline realtime factor "
                      "(Qwen3-ASR-1.7B geometry, -S 0)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_OFFLINE_17, 2),
        })

    # ---- offline 1.7B + speculative decoding (--spec) -------------------
    # The draft/verify win GROWS with model size (the verified bf16 stream
    # is 2.8x the 0.6B's): interleaved A/B measured spec med 50.9x vs bf16
    # med 40.8x (+25%), acceptance 4.56 tok/verify-iter vs 3.69 at 0.6B,
    # texts bit-exact (tools/probe_spec17.py).
    if want("offline_17_spec"):
        from tools.engineer_checkpoint import OUT_17, ensure_engineered

        rep17 = ensure_engineered(OUT_17, geom="1.7b")
        if not rep17.get("ok"):
            log("bench: WARNING 1.7b engineered-checkpoint probe failed")
        samples = load_wav(JFK)
        audio_s = len(samples) / 16000.0
        eng17s = Engine(OUT_17, verbose=0, spec=True)
        eng17s.max_tokens = MAX_TOKENS
        eng17s.segment_sec = 0.0
        t0 = time.monotonic()
        segment_mod.transcribe_audio(eng17s, _perturb(samples, rng))
        log(f"bench: offline-1.7b-spec warmup {time.monotonic() - t0:.1f} s")
        best_ms = float("inf")
        for i in range(RUNS + 2):
            segment_mod.transcribe_audio(eng17s, _perturb(samples, rng))
            ms = eng17s.perf.total_ms
            log(f"bench: offline-1.7b-spec run {i + 1}: {ms:.0f} ms "
                f"(mel+enc {eng17s.perf.encode_ms:.0f}, "
                f"dec {eng17s.perf.decode_ms:.0f})")
            best_ms = min(best_ms, ms)
        if eng17s.perf.spec_iters:
            p = eng17s.perf
            log(f"bench: offline-1.7b-spec acceptance "
                f"{p.spec_tokens}/{p.spec_iters}"
                f" = {p.spec_tokens / p.spec_iters:.2f} tokens/verify-iter")
        del eng17s
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "jfk.wav offline realtime factor, speculative "
                      "int8-draft decode, bf16-exact tokens "
                      "(Qwen3-ASR-1.7B geometry, -S 0, --spec)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_OFFLINE_17, 2),
        })

    # ---- 1.7B segmented + streaming (opt-in: BASELINE.md coverage) ------
    # Not in the default set (fresh 1.7B-geometry shape ladders add ~10 min
    # of warmup); run with SMOLVISION_BENCH_ONLY=seg17,stream17.
    if "seg17" in only or "stream17" in only:
        from tools.engineer_checkpoint import OUT_17, ensure_engineered

        ensure_engineered(OUT_17, geom="1.7b")
        eng17b = Engine(OUT_17, verbose=0)
        eng17b.max_tokens = MAX_TOKENS
        if "seg17" in only:
            s89 = load_wav(CLIP_89S)
            audio_s = len(s89) / 16000.0
            eng17b.segment_sec = 30.0
            eng17b.search_sec = 3.0
            segment_mod.transcribe_audio(eng17b, _perturb(s89, rng))
            log("bench: segmented-1.7b warmup done")
            best_ms = _timed_runs(
                "segmented-1.7b",
                lambda c: segment_mod.transcribe_audio(eng17b, c), s89, rng)
            eng17b.segment_sec = 0.0
            rtf = audio_s / (best_ms / 1000.0)
            emit({
                "metric": "88.9 s clip segmented realtime factor "
                          "(Qwen3-ASR-1.7B geometry, -S 30 -W 3)",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 3.34, 2),   # README.md:404
            })
        if "stream17" in only:
            s45 = load_wav(CLIP_45S)
            audio_s = len(s45) / 16000.0
            eng17b.segment_sec = 0.0
            eng17b.past_text_conditioning = True
            eng17b.token_cb = lambda piece: None
            stream_mod.transcribe_stream(eng17b, _perturb(s45, rng))
            log("bench: streaming-1.7b warmup done")
            best_ms = _timed_runs(
                "streaming-1.7b",
                lambda c: stream_mod.transcribe_stream(eng17b, c), s45, rng)
            eng17b.token_cb = None
            eng17b.past_text_conditioning = False
            rtf = audio_s / (best_ms / 1000.0)
            emit({
                "metric": "45 s clip streaming realtime factor "
                          "(Qwen3-ASR-1.7B geometry, --stream, enc cache ON)",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 2.54, 2),   # README.md:411
            })
        del eng17b

    # ---- offline headline: jfk.wav, -S 0 -------------------------------
    if want("offline"):
        samples = load_wav(JFK)
        audio_s = len(samples) / 16000.0
        log(f"bench: jfk.wav {audio_s:.1f} s")
        eng.segment_sec = 0.0
        t0 = time.monotonic()
        segment_mod.transcribe_audio(eng, _perturb(samples, rng))
        log(f"bench: offline warmup {time.monotonic() - t0:.1f} s; "
            f"decoded {eng.perf.text_tokens} text tokens")
        best_ms = float("inf")
        for i in range(RUNS + 2):
            segment_mod.transcribe_audio(eng, _perturb(samples, rng))
            ms = eng.perf.total_ms
            log(f"bench: offline run {i + 1}: {ms:.0f} ms "
                f"(mel+enc {eng.perf.encode_ms:.0f}, dec {eng.perf.decode_ms:.0f})")
            best_ms = min(best_ms, ms)
        rtf = audio_s / (best_ms / 1000.0)
        emit({
            "metric": "jfk.wav offline realtime factor "
                      "(Qwen3-ASR-0.6B geometry, -S 0)",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / BASE_OFFLINE, 2),
        })

    # lines were emitted as configs completed (headline offline last by
    # construction); nothing left to print
    return 0


if __name__ == "__main__":
    sys.exit(main())
