"""CLI — flag-compatible with the reference binary (main.c:50-83).

Hard I/O contract (relied on by asr_regression.py): the transcript goes to
STDOUT (tokens streamed as decoded in normal mode; one final line in
--silent); all status/perf lines go to STDERR, including:
  Inference: ... ms, N text tokens (X tok/s, encoding: ...ms, decoding: ...ms)
  Audio: X s processed in Y s (Zx realtime)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="smolvision",
        description="smolvision_tpu — Qwen3-ASR speech-to-text (TPU-native JAX)")
    p.add_argument("-d", dest="model_dir", required=True, help="model directory")
    p.add_argument("-i", dest="input_wav", nargs="+", metavar="WAV",
                   help="input WAV file(s); several files are transcribed as "
                        "one device batch (serving mode), one line each")
    p.add_argument("--stdin", action="store_true", help="read audio from stdin")
    p.add_argument("-t", dest="threads", type=int, default=0,
                   help="host threads (accepted for compatibility; XLA owns parallelism)")
    p.add_argument("-S", dest="segment_sec", type=float, default=-1,
                   help="segment target seconds (0 = full-audio decode)")
    p.add_argument("-W", dest="search_sec", type=float, default=-1,
                   help="segment-cut silence search window +/- seconds")
    p.add_argument("--stream", action="store_true", help="streaming mode")
    p.add_argument("--stream-max-new-tokens", type=int, default=-1)
    p.add_argument("--enc-window-sec", type=float, default=-1)
    p.add_argument("--past-text", choices=["yes", "no", "auto"], default="auto")
    p.add_argument("--skip-silence", action="store_true")
    p.add_argument("--prompt", default=None)
    p.add_argument("--language", default=None)
    p.add_argument("--thinker", action="store_true")
    p.add_argument("--text", dest="thinker_text", default=None)
    p.add_argument("--max-tokens", type=int, default=-1)
    p.add_argument("--temperature", "--temp", dest="temperature", type=float, default=-1.0)
    p.add_argument("--repeat-penalty", type=float, default=-1.0)
    p.add_argument("--top-k", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0, help="sampling seed (thinker)")
    p.add_argument("--sampler", choices=["device", "cref"], default="device",
                   help="thinker sampling arm: device = sampled chunks on "
                        "device (fast, np-seeded); cref = per-token host "
                        "loop replaying the reference C engine's exact "
                        "drand48 sampler (cross-engine sampled parity)")
    p.add_argument("--moe-preload", action="store_true",
                   help="accepted for compatibility (weights are device-resident; "
                        "with --moe-offload: touch all expert pages up front)")
    p.add_argument("--moe-offload", action="store_true",
                   help="MoE experts stay on HOST and stream per layer "
                        "(runs checkpoints whose experts exceed device HBM, "
                        "e.g. 30B on one chip; docs/MOE_30B_PLAN.md Plan B)")
    p.add_argument("--monitor", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--silent", action="store_true")
    p.add_argument("--q8", action="store_true",
                   help="int8 decoder weights: ~1.7x decode speed, small "
                        "accuracy trade (outside the bf16 parity contract); "
                        "also SMOLVISION_Q8=1")
    p.add_argument("--spec", action="store_true",
                   help="speculative int8-draft decoding: draft tokens with "
                        "an int8 decoder copy, verify in one bf16 forward — "
                        "output stays BIT-EXACT bf16 greedy at near-int8 "
                        "decode speed; also SMOLVISION_SPEC=1")
    p.add_argument("--kv8", action="store_true",
                   help="int8 KV cache on the batched decode paths (serving/"
                        "multistream/batched segments): halves the dominant "
                        "KV-read bytes at B>=8 for a small accuracy trade; "
                        "also SMOLVISION_KV8=1")
    p.add_argument("--f32", action="store_true",
                   help="float32 weights AND KV cache (the C engine's exact "
                        "arithmetic family — its kv_cache_k/v are float*, "
                        "qwen_asr_decoder.c:171-172; parity runs, slower)")
    p.add_argument("--no-batch-segments", action="store_true",
                   help="decode -S segments sequentially like the reference")
    p.add_argument("--serve", type=int, metavar="SLOTS", default=0,
                   help="with several -i files: continuous-batching scheduler "
                        "(runtime/serving.py) with SLOTS rolling decode rows "
                        "instead of one static batch — rows admit as others "
                        "finish; best for many or mixed-length clips")
    p.add_argument("--serve-admit", type=int, metavar="N", default=0,
                   help="latency knob for --serve: admit at most N clips per "
                        "wave so the first clips start decoding without "
                        "waiting for the full SLOTS-wide prefill (measured: "
                        "admit->first-token p50 ~100 ms at N=16 vs ~1.2 s "
                        "full-wave, at ~47%% throughput cost)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the transcription to DIR")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if not args.thinker and not args.input_wav and not args.stdin:
        print("Error: need -i, --stdin, or --thinker --text", file=sys.stderr)
        return 1
    if args.thinker and not args.input_wav and not args.stdin and not args.thinker_text:
        print("Error: --thinker requires -i, --stdin, or --text", file=sys.stderr)
        return 1
    if args.input_wav and args.stdin:
        print("Error: -i and --stdin are mutually exclusive", file=sys.stderr)
        return 1
    if args.enc_window_sec >= 0 and not (1.0 <= args.enc_window_sec <= 8.0):
        print(f"Error: --enc-window-sec must be in [1, 8], got {args.enc_window_sec}",
              file=sys.stderr)
        return 1

    verbosity = 0 if args.silent else (2 if args.debug else 1)

    import os

    import jax

    # This jax build ignores the JAX_PLATFORMS env var (the TPU plugin wins);
    # honor our own override so tests/tools can force the CPU backend.
    platform = os.environ.get("SMOLVISION_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    # Persistent compile cache: CPU-only by default.  On the axon TPU
    # backend a deserialized executable defers server-side compilation to
    # its FIRST EXECUTION, and that path is ~5x slower than a fresh compile
    # (measured: 14.8 s vs 3.1 s for a decoder-shaped program,
    # tools/probe_cache_load.py) — cache "hits" made warm CLI starts 2-4x
    # SLOWER than cold ones.  An explicit SMOLVISION_COMPILE_CACHE=<dir>
    # overrides the gating for experiments.
    cache_dir = os.environ.get("SMOLVISION_COMPILE_CACHE")
    if cache_dir is None and jax.default_backend() == "cpu":
        cache_dir = os.path.expanduser("~/.cache/smolvision_jax")
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from smolvision_tpu.io.wav import load_wav, read_pcm_stdin
    from smolvision_tpu.runtime.engine import Engine
    from smolvision_tpu.runtime import segment as segment_mod
    from smolvision_tpu.runtime import stream as stream_mod

    try:
        eng = Engine(
            args.model_dir,
            param_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            # --f32 must match the C engine's family END TO END: weights
            # f32 math AND f32 KV (kv_cache_k/v are float*,
            # qwen_asr_decoder.c:168-175).  A bf16 KV under --f32 injects
            # ~1e-2-level logit drift — ~100x honest f32 reordering noise —
            # which flipped a 0.02-gap step in the 1.7B stream parity run
            # (docs/PARITY_C.md; f64 torch-oracle referee sided with C).
            kv_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            enc_window_sec=args.enc_window_sec if args.enc_window_sec >= 0 else None,
            verbose=verbosity,
            q8=args.q8 or os.environ.get("SMOLVISION_Q8", "") == "1",
            kv8=args.kv8 or os.environ.get("SMOLVISION_KV8", "") == "1",
            spec=args.spec or os.environ.get("SMOLVISION_SPEC", "") == "1",
            moe_offload=args.moe_offload,
        )
    except Exception as e:
        # mirror the reference's one-line load failure (main.c:292-296)
        print(f"smolvision: failed to load model from {args.model_dir}: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1
    eng.monitor = args.monitor
    if args.moe_offload and not eng.moe_offload and verbosity >= 1:
        print("--moe-offload: model is not MoE; ignored", file=sys.stderr)

    if args.segment_sec >= 0:
        eng.segment_sec = args.segment_sec
    if args.search_sec >= 0:
        eng.search_sec = args.search_sec
    if args.stream_max_new_tokens > 0:
        eng.stream_max_new_tokens = args.stream_max_new_tokens
    if args.past_text == "yes":
        eng.past_text_conditioning = True
    elif args.past_text == "no":
        eng.past_text_conditioning = False
    elif args.stream:
        # auto: streaming defaults to prefix conditioning (main.c:316-320)
        eng.past_text_conditioning = True
    if args.skip_silence:
        eng.skip_silence = True
    if args.max_tokens > 0:
        eng.thinker_max_tokens = args.max_tokens
        eng.max_tokens = args.max_tokens
    if args.temperature >= 0:
        eng.temperature = args.temperature
    if args.repeat_penalty >= 0:
        eng.repetition_penalty = args.repeat_penalty
    if args.top_k >= 0:
        eng.top_k = args.top_k
    eng.seed = args.seed
    if args.sampler == "cref":
        eng.sampler_mode = "cref"
    if args.no_batch_segments:
        eng.batch_segments = False
    if args.moe_preload:
        if eng.moe_offload:
            gb = eng.expert_store.preload() / 1e9
            if verbosity >= 1:
                # mirrors the reference's preload report (qwen_asr_decoder.c:354)
                print(f"MoE preload: touched {gb:.1f} GB of host expert pages",
                      file=sys.stderr)
        elif verbosity >= 1:
            note = ("MoE experts are device-resident (loaded at startup); "
                    "--moe-preload is implicit on TPU"
                    if eng.cfg.is_moe else "--moe-preload: model is not MoE")
            print(note, file=sys.stderr)
    if args.prompt:
        eng.set_prompt(args.prompt)
    if args.language:
        if not eng.set_force_language(args.language):
            from smolvision_tpu.config import SUPPORTED_LANGUAGES

            print(f"Unsupported language for --language: {args.language}", file=sys.stderr)
            print("Supported languages: " + ",".join(SUPPORTED_LANGUAGES), file=sys.stderr)
            return 1

    emit_tokens = verbosity > 0

    def stream_token(piece: bytes):
        sys.stdout.buffer.write(piece)
        sys.stdout.flush()

    eng.token_cb = stream_token if emit_tokens else None

    input_files = args.input_wav or []
    single_input = input_files[0] if input_files else None

    def load_input():
        try:
            return load_wav(single_input) if single_input else read_pcm_stdin()
        except (OSError, ValueError) as e:
            print(f"smolvision: cannot load audio: {e}", file=sys.stderr)
            return None

    if len(input_files) > 1:
        if args.thinker or eng.cfg.family == "q25":
            print("Error: multiple -i files only supported in plain Qwen3 ASR mode",
                  file=sys.stderr)
            return 1
        from smolvision_tpu.runtime.batch_segments import transcribe_segments_batched
        import time as _time

        try:
            clips = [load_wav(f) for f in input_files]
        except (OSError, ValueError) as e:
            print(f"smolvision: cannot load audio: {e}", file=sys.stderr)
            return 1
        # pre-validate: one sub-mel-frame clip would otherwise crash the
        # whole batch from inside the encode worker with a raw traceback
        for f, c in zip(input_files, clips):
            if len(c) < 160:
                print(f"smolvision: cannot load audio: {f}: too short "
                      f"({len(c)} samples; need at least one 10 ms mel frame)",
                      file=sys.stderr)
                return 1

        if args.stream:
            # N concurrent streaming sessions sharing one engine's weights;
            # transcripts print in file order once all sessions finish
            from smolvision_tpu.runtime.multistream import run_streams

            eng.perf.reset()
            eng.perf.audio_ms = sum(1000.0 * len(c) / 16000.0 for c in clips)
            t0 = _time.monotonic()
            texts = run_streams(eng, clips)
            eng.perf.total_ms = (_time.monotonic() - t0) * 1000.0
            for text in texts:
                sys.stdout.write((text or "") + "\n")
            sys.stdout.flush()
            if verbosity >= 1:
                perf = eng.perf
                print(f"Streams: {len(clips)} sessions, {perf.audio_ms / 1000:.1f} s "
                      f"audio in {perf.total_ms / 1000:.1f} s "
                      f"({perf.audio_ms / max(perf.total_ms, 1):.2f}x realtime)",
                      file=sys.stderr)
            return 0
        eng.perf.reset()
        eng.perf.audio_ms = sum(1000.0 * len(c) / 16000.0 for c in clips)
        t0 = _time.monotonic()
        if args.serve > 0:
            from smolvision_tpu.runtime.serving import serve_continuous

            texts = serve_continuous(eng, clips, slots=args.serve,
                                     admit_cap=args.serve_admit)
        else:
            texts = transcribe_segments_batched(eng, clips)
        eng.perf.total_ms = (_time.monotonic() - t0) * 1000.0
        for text in texts:
            sys.stdout.write(text + "\n")
        sys.stdout.flush()
        if verbosity >= 1:
            perf = eng.perf
            print(f"Batch: {len(clips)} files, {perf.audio_ms / 1000:.1f} s audio "
                  f"in {perf.total_ms / 1000:.1f} s "
                  f"({perf.audio_ms / max(perf.total_ms, 1):.2f}x realtime)",
                  file=sys.stderr)
            if args.serve > 0 and perf.serving_latency:
                lat = perf.serving_latency
                print(f"Serve: ttft p50 {lat['ttft_p50_ms']:.0f} ms / "
                      f"p99 {lat['ttft_p99_ms']:.0f} ms (admit->first p50 "
                      f"{lat['admit_ttft_p50_ms']:.0f} ms), completion p50 "
                      f"{lat['done_p50_ms']:.0f} ms / p99 {lat['done_p99_ms']:.0f} ms",
                      file=sys.stderr)
        return 0

    # Qwen2.5-Omni has no <asr_text> ASR head: ASR requests route through the
    # thinker with a default system prompt (q25_transcribe_audio,
    # qwen25_omni.c:590-607).
    if eng.cfg.family == "q25" and not args.thinker:
        args.thinker = True
        if not eng.prompt_text:
            eng.set_prompt("You are a helpful assistant.")
        if args.temperature < 0:
            eng.temperature = 0.7

    profile_ctx = None
    if args.profile:
        jax.profiler.start_trace(args.profile)
        profile_ctx = args.profile

    text = None
    try:
        if args.thinker:
            samples = None
            if args.input_wav or args.stdin:
                samples = load_input()
                # the reference proceeds text-only when the audio load
                # fails but --text is present (main.c:242-245:
                # qwen_load_wav returns NULL and thinker_generate(NULL, 0,
                # text) runs the text path); only fail when there is
                # nothing left to generate from
                if samples is None and not args.thinker_text:
                    return 1
            text = eng.thinker_generate(samples, args.thinker_text)
        elif args.stream and args.stdin:
            from smolvision_tpu.io.live import LiveAudio

            live = LiveAudio.start_stdin()
            text = stream_mod.transcribe_stream_live(eng, live)
        elif args.stream:
            samples = load_input()
            if samples is None:
                return 1
            text = stream_mod.transcribe_stream(eng, samples)
        else:
            samples = load_input()
            if samples is None:
                return 1
            text = segment_mod.transcribe_audio(eng, samples)
    except ValueError as e:
        print(f"smolvision: {e}", file=sys.stderr)
        return 1
    finally:
        if profile_ctx:
            try:
                jax.profiler.stop_trace()
                print(f"profile trace written to {profile_ctx}", file=sys.stderr)
            except Exception as e:  # profiling is best-effort
                print(f"smolvision: profiler stop failed: {e}", file=sys.stderr)

    if text is None:
        print("Transcription failed", file=sys.stderr)
        return 1

    if emit_tokens:
        sys.stdout.write("\n")
    else:
        sys.stdout.write(text + "\n")
    sys.stdout.flush()

    if verbosity >= 1:
        perf = eng.perf
        tok_s = (1000.0 * perf.text_tokens / perf.total_ms) if perf.total_ms > 0 else 0.0
        print(f"Inference: {perf.total_ms:.0f} ms, {perf.text_tokens} text tokens "
              f"({tok_s:.2f} tok/s, encoding: {perf.encode_ms:.0f}ms, "
              f"decoding: {perf.decode_ms:.0f}ms)", file=sys.stderr)
        if perf.audio_ms > 0 and perf.total_ms > 0:
            audio_s = perf.audio_ms / 1000.0
            infer_s = perf.total_ms / 1000.0
            print(f"Audio: {audio_s:.1f} s processed in {infer_s:.1f} s "
                  f"({audio_s / infer_s:.2f}x realtime)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
