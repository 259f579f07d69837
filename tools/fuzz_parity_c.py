#!/usr/bin/env python3
"""Input-space differential parity fuzz: smolvision_tpu vs the reference C binary.

The engineered-checkpoint parity matrix (docs/PARITY_C.md) pins byte-exact
token traces on FIXED inputs; this tool sweeps the INPUT space on a fixed
tiny checkpoint instead — WAV container edges, sample-rate resampling,
channel mixing, duration boundaries (conv chunks, encoder windows), signal
pathologies, and tokenizer-hostile text — and byte-compares stdout (thinker
greedy, ungated: stdout equality IS token-trace equality on the full
synthetic vocab) plus exit codes between the two engines.  A gated-ASR
tail (ASR_CASES) additionally sweeps offline/segmented/silence-skip/stream
modes with --language English (which opens the <asr_text> gate from the
prompt, qwen_asr.c:592,781 — every token emitted, no surgery needed).

Cost model: the C engine runs its generic scalar kernels on one core, so the
checkpoint is the tiny `fuzz-c` geometry (tools/make_tiny_model.py) — full
480-channel conv stem (QWEN_CONV_HIDDEN is hardcoded, qwen_asr.h:39) but a
4-layer/256-dim stack, built with --full-vocab; the C binary gets its
detect_config fallback-branch constants regenerated for it
(cross_parity_c._dense_geometry_patch).  Whole corpus: ~10-20 min.

Both engines run the same arithmetic family: ours CPU + --f32 (the C engine
is bf16-weights/f32-math).  A divergence therefore means a semantic
difference (parser, resampler, mix, mel, prompt, tokenizer) or an
accumulation-order tie-flip; rerun the case with --only NAME to triage.

Usage:
  python tools/fuzz_parity_c.py                 # full corpus
  python tools/fuzz_parity_c.py --only text_cjk,wav_rate8k
  python tools/fuzz_parity_c.py --moe           # router/top-8 surface
  python tools/fuzz_parity_c.py --q25           # Qwen2.5-Omni family
  python tools/fuzz_parity_c.py --random 16 --seed 99   # + seeded randoms
  python tools/fuzz_parity_c.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.cross_parity_c import ensure_binary, first_divergence  # noqa: E402

MODEL = os.path.join(REPO, ".bench_cache", "qwen3-fuzz-c")
MODEL_MOE = os.path.join(REPO, ".bench_cache", "qwen3-fuzz-moe-c")
MODEL_Q25 = os.path.join(REPO, ".bench_cache", "qwen25-fuzz-c")
WAV_DIR = "/tmp/sv_fuzz_wavs"


# ---------------------------------------------------------------------------
# corpus: text cases (tokenizer + prompt-build + decode parity; cheap C-side)
# ---------------------------------------------------------------------------

TEXT_CASES = {
    "text_plain": "the quick brown fox jumps over the lazy dog",
    "text_leading_space": "   leading and   multiple   spaces",
    "text_trailing_space": "trailing spaces   ",
    "text_tabs_newlines": "line one\n\tline two\r\nline three",
    "text_cjk": "语音识别系统的跨引擎一致性测试",
    "text_japanese": "日本語のテキストと英語mixed text",
    "text_emoji": "emoji test \U0001F600\U0001F680 family \U0001F468\u200d\U0001F469\u200d\U0001F467",
    "text_combining": "cafe\u0301 nai\u0308ve a\u030a ring",
    "text_rtl": "\u0645\u0631\u062d\u0628\u0627 hello \u05e9\u05dc\u05d5\u05dd",
    "text_greek_math": "\u03a9\u2248\u00e7\u221a\u222b \u00b5\u2202\u2206",
    "text_digits_punct": "1,234.56!? (50%) [a-b] {c;d} <e|f> #tag @user",
    "text_single_char": "x",
    "text_single_space": " ",
    "text_long_repeat": "buffalo " * 40,
    "text_bytes_high": "\u00df\u00fe\u00f0 \u00c6\u00d8\u00c5 \u0152\u0153",
    "text_control_del": "before\x7fafter \x01 bell\x07",
    "text_nbsp_zwsp": "non\u00a0breaking\u200bzero width\u2009thin",
    "text_quotes": "\"double\" 'single' \u201ccurly\u201d \u2018c2\u2019 `tick`",
    "text_backslash": "C:\\path\\to\\file and \\n literal \\t",
    "text_korean_thai": "\ud55c\uad6d\uc5b4 \u0e20\u0e32\u0e29\u0e32\u0e44\u0e17\u0e22",
    "text_cyrillic": "\u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442 \u043f\u0440\u043e\u0432\u0435\u0440\u043a\u0430",
    "text_surrogate_pairs": "\U0001D49C\U0001D4B5 math script \U0002070E rare CJK",
}


# ---------------------------------------------------------------------------
# corpus: audio cases
# ---------------------------------------------------------------------------

def _sig_tone_am(rng, n, sr):
    t = np.arange(n) / sr
    return (0.30 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.15 * np.sin(2 * np.pi * 880 * t) * (t % 1.0 < 0.4)
            + 0.01 * rng.standard_normal(n))


def _sig_noise(rng, n, sr):
    return 0.2 * rng.standard_normal(n)


def _sig_bursts(rng, n, sr):
    sig = np.zeros(n)
    t = np.arange(n) / sr
    for k in range(0, n, sr // 2):
        end = min(k + sr // 8, n)
        tt = t[k:end]
        sig[k:end] = 0.4 * np.sin(2 * np.pi * (300 + 100 * (k // (sr // 2))) * tt)
    return sig + 0.002 * rng.standard_normal(n)


def _sig_near_silent(rng, n, sr):
    return 1e-4 * rng.standard_normal(n)


def _sig_clipped_square(rng, n, sr):
    t = np.arange(n) / sr
    return np.sign(np.sin(2 * np.pi * 97 * t)) * 1.5  # clips to +-1 in s16


def _sig_dc_chirp(rng, n, sr):
    t = np.arange(n) / sr
    return 0.3 + 0.25 * np.sin(2 * np.pi * (100 + 400 * t) * t)


def make_wav(sig: np.ndarray, sr: int, channels: int = 1,
             pre_chunks: list | None = None, mid_chunks: list | None = None,
             trailing: bytes = b"", data_size_override: int | None = None,
             extra_data: np.ndarray | None = None, fmt_tag: int = 1,
             bits: int = 16, hdr_channels: int | None = None) -> bytes:
    """Build a WAV byte buffer with controllable chunk layout.

    pre_chunks / mid_chunks: [(id4, payload)] inserted before fmt / between
    fmt and data.  data_size_override: lie in the data chunk header.
    extra_data: a SECOND data chunk appended after the first (the reference
    walks all chunks and the last one wins, qwen_asr_audio.c:51-69).
    fmt_tag / bits / hdr_channels: lie in the FMT header (the data stays
    s16) — the reference accepts ONLY fmt=1/bits=16/channels>=1
    (qwen_asr_audio.c:71-75); anything else must be a rejection on BOTH
    engines."""
    if channels > 1 and sig.ndim == 1:
        sig = np.stack([sig] * channels, axis=1)
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()

    def chunk(cid, payload, size=None):
        b = cid + struct.pack("<I", len(payload) if size is None else size) + payload
        if len(payload) & 1:
            b += b"\x00"  # word alignment padding
        return b

    fmt = struct.pack("<HHIIHH", fmt_tag,
                      channels if hdr_channels is None else hdr_channels,
                      sr, sr * 2 * channels, 2 * channels, bits)
    body = b""
    for cid, payload in (pre_chunks or []):
        body += chunk(cid, payload)
    body += chunk(b"fmt ", fmt)
    for cid, payload in (mid_chunks or []):
        body += chunk(cid, payload)
    body += chunk(b"data", pcm, size=data_size_override)
    if extra_data is not None:
        pcm2 = (np.clip(extra_data, -1, 1) * 32767).astype("<i2").tobytes()
        body += chunk(b"data", pcm2)
    body += trailing
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def build_audio_cases(rng) -> dict:
    """name -> wav bytes.  Durations target the mel/conv/window boundaries:
    conv chunks are 100 mel frames (1.00 s), encoder windows 104 tokens =
    832 frames = 8.32 s."""
    cases = {}

    def std(name, sig_fn, dur, sr=16000, **kw):
        n = int(round(dur * sr))
        cases[name] = make_wav(sig_fn(rng, n, sr), sr, **kw)

    # durations at conv-chunk / token boundaries (16 kHz mono)
    std("wav_25ms", _sig_tone_am, 0.025)           # sub-window audio
    std("wav_125ms", _sig_noise, 0.125)
    std("wav_370ms", _sig_tone_am, 0.370)          # partial tail chunk
    std("wav_1s_exact", _sig_tone_am, 1.000)       # exactly 100 frames
    std("wav_1s_minus1frame", _sig_tone_am, (16000 - 160) / 16000)
    std("wav_1s_plus1frame", _sig_tone_am, (16000 + 160) / 16000)
    std("wav_2s1", _sig_bursts, 2.100)
    std("wav_odd_samples", _sig_noise, 16001 / 16000)  # non-multiple of hop
    # encoder window boundary: 104 tokens = 8.32 s; one token = 80 ms
    std("wav_window_minus1tok", _sig_tone_am, 8.32 - 0.08)
    std("wav_window_exact", _sig_tone_am, 8.32)
    std("wav_window_plus1tok", _sig_bursts, 8.32 + 0.08)

    # signal pathologies
    std("wav_near_silent", _sig_near_silent, 1.7)
    std("wav_clipped_square", _sig_clipped_square, 1.3)
    std("wav_dc_chirp", _sig_dc_chirp, 1.5)

    # resampler parity (the Kaiser-sinc path; every rate != 16000 resamples)
    std("wav_rate8k", _sig_tone_am, 1.5, sr=8000)
    std("wav_rate11k", _sig_bursts, 1.2, sr=11025)
    std("wav_rate22k", _sig_tone_am, 1.1, sr=22050)
    std("wav_rate44k", _sig_noise, 1.0, sr=44100)
    std("wav_rate48k", _sig_tone_am, 0.9, sr=48000)

    # channel mixing (the C engine averages ANY channel count in f32,
    # qwen_asr_audio.c:83-92)
    n = int(1.4 * 16000)
    left = _sig_tone_am(rng, n, 16000)
    right = _sig_bursts(rng, n, 16000)
    cases["wav_stereo_distinct"] = make_wav(
        np.stack([left, right], axis=1), 16000, channels=2)
    tri = np.stack([left, right, _sig_noise(rng, n, 16000)], axis=1)
    cases["wav_3ch"] = make_wav(tri, 16000, channels=3)

    # container-layout edges (reference walk: qwen_asr_audio.c:51-69 —
    # skips unknown chunks with word alignment, LAST fmt/data win, stops at
    # the first chunk whose declared size overruns the file)
    sig = _sig_tone_am(rng, int(1.2 * 16000), 16000)
    cases["wav_list_chunk"] = make_wav(
        sig, 16000, pre_chunks=[(b"LIST", b"INFOIART" + struct.pack("<I", 5) + b"fuzz\x00")])
    cases["wav_junk_mid"] = make_wav(
        sig, 16000, mid_chunks=[(b"fact", struct.pack("<I", 12345)),
                                (b"junk", b"\x00" * 37)])  # odd size: padding
    cases["wav_trailing_garbage"] = make_wav(
        sig, 16000, trailing=b"\xde\xad\xbe\xef" * 8)
    cases["wav_two_data_chunks"] = make_wav(
        sig, 16000, extra_data=_sig_bursts(rng, int(0.9 * 16000), 16000))
    # data chunk header claims more bytes than the file holds: the C walk
    # stops before parsing it -> no data chunk -> parse error (rc != 0);
    # both engines must agree on the REJECTION
    cases["wav_data_overrun"] = make_wav(
        sig, 16000, data_size_override=len(sig) * 2 + 100000)

    return cases


# ---------------------------------------------------------------------------
# corpus: gated ASR-mode cases (offline / segmented / silence-skip / stream)
#
# `--language English` puts <asr_text> in the PROMPT (qwen_asr.c:592,781),
# so the gate is open from step 1 and every generated token is emitted —
# no checkpoint surgery needed.  Decode is bounded by EOS or the shared
# 2048-token cap (qwen_asr.c:777 == engine.max_tokens); random-checkpoint
# trajectories usually enter a repeat cycle without EOS, so a case can run
# the full cap (~1-3 min/arm on the fuzz-c geometry) — the subset below is
# chosen short.  These sweep the input-DEPENDENT host logic the fixed-input
# parity matrix can't: silence-VAD arithmetic on pathological signals,
# segment split search across energy profiles, collapse-retry heuristics,
# resample->segment interactions, streaming chunking on odd durations.
# ---------------------------------------------------------------------------

# per-segment decode cap for the offline/segmented fuzz cases (both arms;
# see the c_env/--max-tokens wiring in main): long enough to cross repeat
# cycles, segment boundaries and the conditioning prompt build, short
# enough that a case is seconds-not-minutes per arm
ASR_FUZZ_CAP = "160"

ASR_CASES = {
    # name -> (audio case, extra flags)
    "asr_off_2s1": ("wav_2s1", ["-S", "0"]),
    "asr_off_rate44k": ("wav_rate44k", ["-S", "0"]),
    "asr_off_near_silent": ("wav_near_silent", ["-S", "0"]),
    "asr_seg_2s1": ("wav_2s1", ["-S", "1", "-W", "0.5", "--past-text", "no"]),
    "asr_seg_bursts_sil": ("wav_2s1", ["-S", "1", "-W", "0.5",
                                       "--skip-silence", "--past-text", "no"]),
    "asr_sil_near_silent": ("wav_near_silent", ["-S", "0", "--skip-silence"]),
    "asr_strm_window": ("wav_window_plus1tok", ["--stream"]),
    "asr_strm_odd": ("wav_odd_samples", ["--stream"]),
    # system-prompt splice in the ASR prompt build (PREFIX_HEAD + prompt
    # tokens + PREFIX_TAIL, qwen_asr.c:386-420)
    "asr_off_sysprompt": ("wav_2s1", ["-S", "0", "--prompt",
                                      "Preserve spelling: CPU, CUDA, ß中文"]),
    # encoder window-size knob (--enc-window-sec -> enc_n_window_infer,
    # main.c:302-307): moves the hard attention-window boundaries, the
    # per-window token arithmetic, and (streaming) the window-cache
    # granularity + 4-window eviction point.  2 s divides the 100-frame
    # conv chunk evenly; 3 s exercises a non-pow2 window token count.
    "asr_off_encwin2": ("wav_2s1", ["-S", "0", "--enc-window-sec", "2"]),
    "asr_off_encwin3": ("wav_2s1", ["-S", "0", "--enc-window-sec", "3"]),
    "asr_strm_encwin2": ("wav_window_plus1tok",
                         ["--stream", "--enc-window-sec", "2"]),
    # conditioning ON across a segment boundary: the past-text prompt
    # build (previous text + fresh <asr_text>, qwen_asr.c:746-759) and the
    # collapse-retry heuristics become reachable — the other seg cases all
    # run --past-text no
    "asr_seg_pasttext": ("wav_2s1", ["-S", "1", "-W", "0.5",
                                     "--past-text", "yes"]),
    # per-chunk decode budget (--stream-max-new-tokens -> max_new_tokens,
    # qwen_asr.c:1280): 8 forces chunk budgets to run out mid-thought, so
    # the prefix-rollback/commit machinery crosses chunk boundaries on a
    # different schedule than the default-32 stream cases
    "asr_strm_maxnew8": ("wav_window_plus1tok",
                         ["--stream", "--stream-max-new-tokens", "8"]),
    # segment-cut silence search window (-W, default 3.0): 0.2 s narrows
    # the energy-minimum scan so the cut lands on different boundaries
    # than the 0.5 s seg cases (split arithmetic, qwen_asr.c segment cut)
    "asr_seg_w02": ("wav_2s1", ["-S", "1", "-W", "0.2",
                                "--past-text", "no"]),
    # --language normalization surface (normalize_language_name,
    # qwen_asr.c:74-96: BYTE-level C-locale trim + toupper/tolower).
    # lowercase name -> normalized Chinese gate token (different decode
    # trajectory than the English cases); tab/space padding -> trimmed
    # accept; Turkish dotless-i and NBSP-prefixed names MUST reject on
    # both engines (Python str.upper()/.strip() are Unicode-semantic and
    # accepted both until engine.set_force_language went byte-level)
    "asr_off_langzh": ("wav_2s1", ["-S", "0", "--language", "chinese"]),
    "asr_off_langpad": ("wav_2s1", ["-S", "0", "--language",
                                    "\tenglish \t"]),
    "asr_lang_dotless_i": ("wav_2s1", ["-S", "0", "--language",
                                       "ıtalian"]),
    "asr_lang_nbsp": ("wav_2s1", ["-S", "0", "--language",
                                  "\u00a0English"]),
}

# ---------------------------------------------------------------------------
# corpus: Qwen2.5-Omni cases (--q25)
#
# The q25 family has its own encoder arithmetic the dense corpus can't
# reach: stride-2 conv1d token count (tokens = (mel_frames-1)/2 + 1,
# qwen25_omni_encoder.c:191-204), FLAT 100-token attention windows over
# one global sequence (:221-227 — no per-chunk PE restart), bos/eos
# embedding rows appended around the projection (:288-298), biased QKV /
# no qk-norm / separate lm_head in the decoder, and its own thinker
# prompt layout.  Durations below target the window and conv boundaries:
# 100 tokens = 199 mel frames ~= 1.99-2.00 s; one token = 2 frames = 20 ms.
# ASR mode on q25 is the UNGATED thinker with a default system prompt
# (q25_transcribe_audio, qwen25_omni.c:590-607) — greedy at --temperature 0,
# so stdout equality is a full token-trace check with no checkpoint surgery.
# ---------------------------------------------------------------------------

def build_q25_audio_cases(rng) -> dict:
    cases = {}

    def std(name, sig_fn, dur, sr=16000, **kw):
        n = int(round(dur * sr))
        cases[name] = make_wav(sig_fn(rng, n, sr), sr, **kw)

    std("q25_25ms", _sig_tone_am, 0.025)            # minimal clip
    std("q25_370ms", _sig_tone_am, 0.370)           # odd conv tail
    std("q25_1tok", _sig_noise, 0.045)              # 1-2 encoder tokens
    # 100-token window boundary: +-1 token = +-20 ms around ~2.0 s
    std("q25_win_minus1tok", _sig_tone_am, 1.98)
    std("q25_win_exact", _sig_tone_am, 2.00)
    std("q25_win_plus1tok", _sig_bursts, 2.02)
    std("q25_two_windows", _sig_bursts, 4.00)       # 2 full windows
    std("q25_partial_third", _sig_tone_am, 5.30)    # 2 windows + partial
    # family-crossed input handling (resample/mix feed the q25 mel)
    std("q25_rate44k", _sig_tone_am, 1.3, sr=44100)
    std("q25_near_silent", _sig_near_silent, 1.1)
    n = int(1.2 * 16000)
    cases["q25_stereo"] = make_wav(
        np.stack([_sig_tone_am(rng, n, 16000), _sig_bursts(rng, n, 16000)],
                 axis=1), 16000, channels=2)
    return cases


# q25 mode-layer cases: ASR routing (ungated transcribe w/ default system
# prompt) and thinker prompt splicing; audio name -> extra flags
Q25_MODE_CASES = {
    "q25_asr_win": ("q25_win_plus1tok",
                    ["--temperature", "0", "--max-tokens", "20"]),
    "q25_asr_rate44k": ("q25_rate44k",
                        ["--temperature", "0", "--max-tokens", "16"]),
    "q25_think_sysprompt": ("q25_370ms",
                            ["--thinker", "--prompt", "system bias éè",
                             "--temperature", "0", "--max-tokens", "10"]),
    "q25_think_text_only": (None,
                            ["--thinker", "--text", "alpha beta gamma",
                             "--temperature", "0", "--max-tokens", "12"]),
    "q25_think_audio_text": ("q25_1tok",
                             ["--thinker", "--text", "layout check",
                              "--temperature", "0", "--max-tokens", "10"]),
}


# extra thinker-mode prompt-layout cases (ungated, max-tokens-bounded):
# combined audio+text uses the AUDIO path layout in the reference
# (qwen_asr.c:2384-2399 — user text does not change the embedding layout),
# and --prompt splices system-prompt tokens into the prefix on both paths
THINKER_EXTRA = {
    "think_sysprompt_text": (None, ["--thinker", "--text", "alpha beta",
                                    "--prompt", "You transcribe exactly.",
                                    "--temperature", "0", "--max-tokens", "12"]),
    "think_audio_plus_text": ("wav_1s_exact",
                              ["--thinker", "--text", "ignored by layout",
                               "--temperature", "0", "--max-tokens", "8"]),
    "think_audio_sysprompt": ("wav_370ms",
                              ["--thinker", "--prompt", "system bias éè",
                               "--temperature", "0", "--max-tokens", "8"]),
    # audio load FAILS but --text is present: the reference degrades to
    # the text-only thinker (main.c:242-245), it does not abort
    "think_badaudio_text_fallback": (
        None, ["--thinker", "--text", "fallback path",
               "-i", "/tmp/sv_fuzz_wavs/definitely_missing.wav",
               "--temperature", "0", "--max-tokens", "10"]),
}


# SAMPLED-mode thinker cases (temperature > 0 — the reference samples only
# in thinker mode; ASR transcribe is always greedy on both engines).  The
# C arm's wall-clock srand48 is pinned via QWEN_SEED (the _seed_patch in
# every geometry-patched build); our arm replays the identical drand48
# stream with --sampler cref --seed N (runtime/sampling.CRefSampler — the
# compiled sample_token's exact -ffast-math arithmetic, fuzzed to 0
# mismatches in tools/fuzz_sampler_c.py).  Byte-exact stdout is REQUIRED:
# one flipped multinomial draw changes every subsequent token.
# name -> (wav_name_or_None, flags, drand48_seed)
SAMPLED_CASES = {
    "samp_text_default": (None, ["--thinker", "--text",
                                 "stochastic parity check",
                                 "--max-tokens", "24"], 42),
    "samp_text_hot": (None, ["--thinker", "--text", "high temperature run",
                             "--temperature", "1.3", "--top-k", "0",
                             "--max-tokens", "24"], 7),
    "samp_text_cold_k5": (None, ["--thinker", "--text", "near greedy",
                                 "--temperature", "0.2", "--top-k", "5",
                                 "--max-tokens", "24"], 12345),
    "samp_text_nopenalty": (None, ["--thinker", "--text", "penalty off",
                                   "--repeat-penalty", "1.0",
                                   "--temperature", "1.0",
                                   "--max-tokens", "24"], 99),
    "samp_text_strong_pen": (None, ["--thinker", "--text",
                                    "buffalo " * 12,
                                    "--repeat-penalty", "1.5",
                                    "--max-tokens", "32"], 2**31 - 1),
    "samp_audio_default": ("wav_370ms", ["--thinker",
                                         "--max-tokens", "20"], 42),
    # NOTE the hot audio case keeps top-k bounded: at temp 1.0 / top-k 0 a
    # random checkpoint's softmax is near-uniform over the FULL 151936
    # vocab, so multinomial draw margins (~1/vocab ~ 7e-6) sit BELOW the
    # inherent cross-engine f32 logit wiggle of the audio path (different
    # matmul summation orders) and a draw straddles a bin boundary almost
    # every run — measured: adjacent token ids at draw 3 (tok136824 vs
    # tok136825).  Greedy/argmax parity is immune to this; sampled parity
    # requires margins >> logit noise, which top-k 256 (~4e-3) restores.
    # Full-vocab sampled softmax is still covered by samp_text_hot (the
    # text path's prefill agrees far more tightly).
    "samp_audio_hot": ("wav_1s_exact", ["--thinker", "--temperature", "1.0",
                                        "--top-k", "256",
                                        "--max-tokens", "20"], 31337),
}

# q25 twins (the q25 thinker loop has its own sample_token copy,
# qwen25_omni.c:114-174, and its own srand48 site — both patched)
SAMPLED_Q25_CASES = {
    "samp_q25_text": (None, ["--thinker", "--text", "stochastic q25",
                             "--max-tokens", "20"], 42),
    # top-k bounded for the same reason as samp_audio_hot: hot full-vocab
    # softmax margins (~1/152064) sit below the audio path's cross-engine
    # f32 summation-order wiggle (measured: tok40238 vs tok40239, adjacent
    # cumsum bins, at draw 2)
    "samp_q25_audio": ("q25_370ms", ["--thinker", "--temperature", "1.3",
                                     "--top-k", "256",
                                     "--max-tokens", "16"], 7),
}


# stdin autodetect cases (qwen_read_pcm_stdin, qwen_asr_audio.c:190-230):
# "RIFF" prefix ALONE routes to the WAV parser (bad body = rejection, NOT
# a raw-PCM fallback), <4 bytes is an error, raw s16le truncates an odd
# trailing byte.  name -> bytes builder (rng, audio_cases) -> stdin bytes
def _stdin_cases(rng, audio):
    n = int(1.1 * 16000)
    raw = (np.clip(_sig_tone_am(rng, n, 16000), -1, 1)
           * 32767).astype("<i2").tobytes()
    return {
        "stdin_wav": audio["wav_2s1"],                  # WAV via stdin
        "stdin_raw": raw,                               # raw s16le 16k mono
        "stdin_raw_odd": raw[:len(raw) - 1],            # odd byte count
        "stdin_riff_garbage": b"RIFF" + raw[:4000],     # WAV route, bad body
        "stdin_tiny": b"ab",                            # <4 bytes: error
    }


STDIN_FLAGS = ["--stdin", "--thinker", "--temperature", "0",
               "--max-tokens", "12"]


def _rand_stdin_cases(rng, n, audio) -> dict:
    """Random stdin-autodetect streams (qwen_read_pcm_stdin,
    qwen_asr_audio.c:190-230 + the RIFF-prefix routing rule): valid-WAV
    truncations biased to header/chunk boundaries, raw s16le noise (odd
    lengths truncate a byte), almost-RIFF magics (case-sensitive routing:
    lowercase 'riff' is RAW PCM), and valid WAV + trailing garbage.  Both
    engines must agree on accept/reject AND on the decoded trajectory.
    Uses its own rng stream (independent of the text/wav/asr draws)."""
    base = audio["wav_2s1"]
    cases = {}
    for k in range(n):
        r = rng.random()
        if r < 0.45:
            edges = [1, 3, 4, 8, 11, 12, 13, 20, 36, 43, 44, 45]
            off = (int(edges[int(rng.integers(len(edges)))])
                   if rng.random() < 0.6 else int(rng.integers(1, len(base))))
            cases[f"stdin_rnd{k}"] = base[:off]
        elif r < 0.70:
            m = int(rng.integers(4, 48000))
            cases[f"stdin_rnd{k}"] = bytes(
                rng.integers(0, 256, m, dtype=np.uint8))
        elif r < 0.85:
            magic = [b"RIFf", b"RIF\x00", b"riff",
                     b"RIFFWAVE"][int(rng.integers(4))]
            m = int(rng.integers(0, 4000))
            cases[f"stdin_rnd{k}"] = magic + bytes(
                rng.integers(0, 256, m, dtype=np.uint8))
        else:
            cases[f"stdin_rnd{k}"] = base + bytes(
                rng.integers(0, 256, int(rng.integers(1, 64)),
                             dtype=np.uint8))
    return cases


# ---------------------------------------------------------------------------
# randomized case generation (--random N --seed S)
#
# The curated corpus above targets KNOWN boundaries; the generator sweeps
# the space BETWEEN them — random unicode-pool text, random WAV geometry
# (rate x channels x duration x container extras x signal mix), random
# ASR-mode knob combinations, and random sampled-decode configurations.
# Fully deterministic for a given --seed: a failing case reproduces with
# `--seed S --only NAME`, and the generated inputs land in /tmp/sv_fuzz_wavs
# like every curated case.
# ---------------------------------------------------------------------------

# codepoint pools for random text: assigned, tokenizer-hostile ranges (the
# byte-level BPE accepts any UTF-8; surrogates are unencodable and excluded)
_TEXT_POOLS = [
    (0x20, 0x7E),        # printable ascii
    (0xA0, 0x2FF),       # latin-1 + extended
    (0x300, 0x36F),      # combining marks
    (0x590, 0x5FF),      # hebrew (RTL)
    (0x600, 0x6FF),      # arabic (RTL + joining)
    (0xE00, 0xE7F),      # thai (no word spaces)
    (0x2000, 0x206F),    # general punctuation (nbsp/zwsp/bidi marks)
    (0x3040, 0x30FF),    # kana
    (0x4E00, 0x9FFF),    # CJK
    (0xAC00, 0xD7A3),    # hangul syllables
    (0x1D400, 0x1D7FF),  # math alphanumerics (astral)
    (0x1F300, 0x1F6FF),  # emoji (astral)
]


def _rand_text(rng) -> str:
    """Random mixed-pool string, 1-~120 chars, occasionally whitespace/
    control-seasoned.  Never starts with '-' (argv value, not a flag)."""
    target = int(rng.integers(1, 120))
    out = []
    while len(out) < target:
        lo, hi = _TEXT_POOLS[int(rng.integers(len(_TEXT_POOLS)))]
        for _ in range(int(rng.integers(1, 8))):
            out.append(chr(int(rng.integers(lo, hi + 1))))
        r = rng.random()
        if r < 0.35:
            out.append(" ")
        elif r < 0.42:
            out.append(["\t", "\n", "  ", "\x7f", "\x07"][int(rng.integers(5))])
    s = "".join(out)
    if not s.strip() or s.lstrip()[0] == "-":
        s = "x" + s
    return s


_SIG_FNS = [_sig_tone_am, _sig_noise, _sig_bursts, _sig_near_silent,
            _sig_clipped_square, _sig_dc_chirp]
_RAND_RATES = [8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000]


def _rand_wav(rng, snap_bases, max_dur: float = 9.0) -> bytes:
    """Random WAV: rate x channels x duration (boundary-snapped or
    log-uniform) x signal mix x optional container extras."""
    sr = int(_RAND_RATES[int(rng.integers(len(_RAND_RATES)))])
    if rng.random() < 0.4:
        base = float(snap_bases[int(rng.integers(len(snap_bases)))])
        dur = base * int(rng.integers(1, 4)) \
            + float(rng.integers(-1, 2)) / 16000.0   # +-1 16 kHz sample
    else:
        dur = float(np.exp(rng.uniform(np.log(0.02), np.log(max_dur))))
    dur = float(min(max(dur, 0.02), max_dur))
    n = max(4, int(round(dur * sr)))

    def mix(m):
        sig = np.zeros(m)
        for _ in range(int(rng.integers(1, 3))):
            fn = _SIG_FNS[int(rng.integers(len(_SIG_FNS)))]
            sig = sig + float(rng.uniform(0.2, 1.0)) * fn(rng, m, sr)
        return sig

    sig = mix(n)
    channels = int([1, 1, 1, 2, 2, 3, 4][int(rng.integers(7))])
    if channels > 1 and rng.random() < 0.6:   # distinct per-channel content
        sig = np.stack([sig] + [mix(n) for _ in range(channels - 1)], axis=1)
    kw = {}
    if rng.random() < 0.25:
        kw["mid_chunks"] = [(b"junk", bytes(rng.integers(
            0, 256, int(rng.integers(1, 64)), dtype=np.uint8)))]
    if rng.random() < 0.15:
        kw["trailing"] = b"\xa5" * int(rng.integers(1, 32))
    if rng.random() < 0.10:   # second data chunk: last one wins
        kw["extra_data"] = 0.2 * rng.standard_normal(int(rng.integers(200, 4000)))
    return make_wav(sig, sr, channels=channels, **kw)


def inject_random_cases(rng, n, audio, q25=False, moe=False):
    """Append n seeded-random cases per category to the corpus dicts
    (before the runner builds its name lists).  ASR-mode and sampled
    randoms are dense-only: the gated-ASR host logic is family-independent
    (same rationale as the curated --moe subset) and hot sampled parity is
    measurement-limited on the audio path (see SAMPLED_CASES note)."""
    snap = [0.02, 1.0, 2.0] if q25 else [0.08, 1.0, 8.32]
    pre = "q25_" if q25 else "wav_"
    for k in range(n):
        TEXT_CASES[f"text_rnd{k}"] = _rand_text(rng)
    for k in range(n):
        audio[f"{pre}rnd{k}"] = _rand_wav(rng, snap)
    # fmt-header rejection parity: every non-(fmt=1, bits=16, ch>=1) header
    # must be REJECTED by both engines (qwen_asr_audio.c:71-75).  The one
    # deliberate acceptance divergence — our io/wav.py takes fmt=3/bits=32
    # IEEE-float WAVs as a documented convenience extension the reference
    # errors on (docs/PARITY_C.md) — is excluded here.
    reject_fmts = [
        {"fmt_tag": 0}, {"fmt_tag": 3}, {"fmt_tag": 0xFFFE},
        {"bits": 8}, {"bits": 24}, {"bits": 32}, {"hdr_channels": 0},
    ]
    # independent child rng: consuming the main stream here would shift
    # every later asr/sampled draw and break reproducibility of earlier
    # campaigns' case names (the CI pins reference seed-20260821 names)
    rng_fmt = np.random.default_rng(0xF3F7)
    for k in range(min(n, len(reject_fmts))):
        m = max(4, int(0.3 * 16000))
        audio[f"{pre}rndfmt{k}"] = make_wav(
            _sig_tone_am(rng_fmt, m, 16000), 16000, **reject_fmts[k])
    if q25 or moe:
        return
    for k in range(n):
        # ASR-mode randoms ride shorter clips: segmented/streaming decode
        # cost scales with duration on both engines
        wname = f"wav_rndasr{k}"
        audio[wname] = _rand_wav(rng, snap, max_dur=5.0)
        mode = ["off", "seg", "strm"][int(rng.integers(3))]
        if mode == "off":
            flags = ["-S", "0"]
            if rng.random() < 0.3:
                flags.append("--skip-silence")
        elif mode == "seg":
            flags = ["-S", str(float([0.5, 1.0, 2.0][int(rng.integers(3))])),
                     "-W", str(float([0.2, 0.5, 1.0][int(rng.integers(3))])),
                     "--past-text", ["yes", "no"][int(rng.integers(2))]]
        else:
            flags = ["--stream"]
            if rng.random() < 0.4:
                flags += ["--stream-max-new-tokens",
                          str([8, 16][int(rng.integers(2))])]
        if rng.random() < 0.3:
            flags += ["--enc-window-sec", str([2, 3][int(rng.integers(2))])]
        if rng.random() < 0.25:
            flags += ["--language", "chinese"]
        # seg names MUST start with asr_seg: the runner keys the
        # sequential-decode (--no-batch-segments) wiring on that prefix
        ASR_CASES[f"asr_{mode}_rnd{k}"] = (wname, flags)
    for k in range(n):
        text = _rand_text(rng)
        temp = round(float(rng.uniform(0.2, 1.4)), 2)
        topk = int([0, 5, 50, 256][int(rng.integers(4))])
        if temp >= 1.0 and topk == 0:
            # Full-vocab hot multinomial margins (~1/vocab) sit below the
            # cross-engine f32 summation-order wiggle even on the TEXT
            # path at random-prompt scale: the first round-5 campaign
            # straddled a cumsum bin on 2/16 seeded hot-text cases
            # (adjacent token ids at the divergent draw; byte-exact again
            # at k=256).  Same measurement-limit bound as the curated hot
            # audio cases (SAMPLED_CASES note above).
            topk = 256
        SAMPLED_CASES[f"samp_text_rnd{k}"] = (
            None,
            ["--thinker", "--text", text,
             "--temperature", str(temp), "--top-k", str(topk),
             "--repeat-penalty",
             str([1.0, 1.1, 1.5][int(rng.integers(3))]),
             "--max-tokens", "24"],
            int(rng.integers(0, 2 ** 31)))


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def ensure_model(moe: bool = False, q25: bool = False) -> dict:
    model = MODEL_MOE if moe else MODEL_Q25 if q25 else MODEL
    preset = "fuzz-moe-c" if moe else "fuzz-q25-c" if q25 else "fuzz-c"
    cfg_path = os.path.join(model, "config.json")
    if not os.path.exists(os.path.join(model, "model.safetensors")):
        from tools.make_tiny_model import build
        print(f"building {preset} checkpoint -> {model}", flush=True)
        build(preset, model, seed=7, full_vocab=True)
    with open(cfg_path) as f:
        return json.load(f)


def run_case(name: str, args_c, args_ours, bin_path, timeout=900,
             allow_empty=False, stdin_data: bytes | None = None,
             c_env: dict | None = None):
    c = subprocess.run([bin_path] + args_c, capture_output=True,
                       timeout=timeout, input=stdin_data,
                       env=dict(os.environ, **(c_env or {})))
    env = dict(os.environ, SMOLVISION_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-m", "smolvision_tpu.cli"]
                       + args_ours + ["--f32"], capture_output=True,
                       timeout=timeout, env=env, input=stdin_data)
    div = first_divergence(c.stdout, r.stdout)
    if c.returncode == 0:
        # allow_empty: gated ASR modes can legitimately emit nothing (e.g.
        # near-silent audio fully dropped by --skip-silence) — both engines
        # agreeing on emptiness IS the check there, while for ungated
        # thinker cases an empty C stdout means the case itself broke
        match = div == -1 and r.returncode == 0 and (
            len(c.stdout) > 0 or allow_empty)
    else:
        # rejection case: both engines must reject (rc != 0, empty stdout)
        match = r.returncode != 0 and c.stdout == r.stdout == b""
    return {"case": name, "match": match, "c_rc": c.returncode,
            "our_rc": r.returncode, "divergence_byte": div,
            "c_bytes": len(c.stdout), "our_bytes": len(r.stdout),
            "c_stdout": c.stdout, "our_stdout": r.stdout,
            "c_stderr_tail": c.stderr.decode(errors="replace")[-300:],
            "our_stderr_tail": r.stderr.decode(errors="replace")[-300:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated case names to run")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=16)
    ap.add_argument("--moe", action="store_true",
                    help="run on the fuzz-moe-c checkpoint (router/top-8/"
                         "expert-accumulate surface); thinker cases only — "
                         "the gated-ASR host logic is family-independent "
                         "and already swept on the dense geometry")
    ap.add_argument("--q25", action="store_true",
                    help="run on the fuzz-q25-c Qwen2.5-Omni checkpoint: "
                         "tokenizer text cases through the q25 prompt/"
                         "decoder, q25 window/conv duration boundaries, "
                         "and the ungated ASR->thinker routing")
    ap.add_argument("--json-out", default="",
                    help="write full per-case results JSON here")
    ap.add_argument("--random", type=int, default=0, metavar="N",
                    help="inject N seeded-random cases per category "
                         "(text / wav / asr-mode / sampled) on top of the "
                         "curated corpus")
    ap.add_argument("--seed", type=int, default=0xF5EED,
                    help="rng seed for --random (a failing random case "
                         "reproduces with the same --seed + --only NAME)")
    args = ap.parse_args()
    assert not (args.moe and args.q25)

    rng = np.random.default_rng(0xF022)
    stdin_cases = {}
    if args.q25:
        audio = build_q25_audio_cases(rng)
    else:
        audio = build_audio_cases(rng)
    if args.random:
        inject_random_cases(np.random.default_rng(args.seed), args.random,
                            audio, q25=args.q25, moe=args.moe)
    if args.q25:
        names = (list(TEXT_CASES) + list(audio) + list(Q25_MODE_CASES)
                 + list(SAMPLED_Q25_CASES))
    else:
        names = (list(TEXT_CASES) + list(audio) + list(THINKER_EXTRA)
                 + list(SAMPLED_CASES))
        if not args.moe:
            stdin_cases = _stdin_cases(rng, audio)
            if args.random:
                stdin_cases.update(_rand_stdin_cases(
                    np.random.default_rng(args.seed ^ 0x51D1),
                    min(args.random, 12), audio))
            names += list(ASR_CASES) + list(stdin_cases)
    if args.list:
        print("\n".join(names))
        return 0
    only = {s.strip() for s in args.only.split(",") if s.strip()}
    if only:
        unknown = only - set(names)
        assert not unknown, f"unknown cases: {unknown}"

    cfg = ensure_model(moe=args.moe, q25=args.q25)
    bin_path = (ensure_binary(moe_cfg=cfg) if args.moe
                else ensure_binary(q25_cfg=cfg) if args.q25
                else ensure_binary(dense_cfg=cfg))
    model_dir = MODEL_MOE if args.moe else MODEL_Q25 if args.q25 else MODEL
    os.makedirs(WAV_DIR, exist_ok=True)

    mt = str(args.max_tokens)
    results, fails = [], []
    t_all = time.monotonic()
    for name in names:
        if only and name not in only:
            continue
        allow_empty = False
        ours_extra = []
        stdin_data = None
        c_env = None
        if name in stdin_cases:
            stdin_data = stdin_cases[name]
            tail = list(STDIN_FLAGS)
        elif name in TEXT_CASES:
            tail = ["--thinker", "--text", TEXT_CASES[name],
                    "--temperature", "0", "--max-tokens", "12"]
        elif name in ASR_CASES:
            wav_name, flags = ASR_CASES[name]
            wav_path = os.path.join(WAV_DIR, wav_name + ".wav")
            with open(wav_path, "wb") as f:
                f.write(audio[wav_name])
            lang_default = ([] if "--language" in flags
                            else ["--language", "English"])
            tail = ["-i", wav_path] + lang_default + flags
            allow_empty = True
            if "--stream" not in flags:
                # bound offline/segmented trajectories: random-checkpoint
                # greedy runs rarely EOS, so uncapped cases run the full
                # 2048-token cap (minutes/arm; conditioned segmented
                # measured >15 min on the f32 arm — past text grows the
                # prompt every segment).  The fuzz C binary's cap is
                # env-overridable (cross_parity_c._asr_cap_patch); ours
                # via --max-tokens drives the same counter.  Streaming is
                # already bounded at 32 tokens/chunk on both engines.
                c_env = {"QWEN_ASR_MAX_TOKENS": ASR_FUZZ_CAP}
                ours_extra = ours_extra + ["--max-tokens", ASR_FUZZ_CAP]
            if name.startswith("asr_seg"):
                # segmented cases decode OUR side sequentially like the C
                # engine: the batched-segment optimization is a different
                # f32 summation ORDER (batched vs single-row matmuls) and
                # an unengineered 2048-token trajectory crosses thin
                # argmax ties it can flip (measured: 1 flip at ~token 370
                # of segment 2 on asr_seg_2s1; sequential = byte-exact).
                # Token-equivalence of the batched path itself is pinned
                # by tests/test_batch_segments.py.  (Append — the decode
                # cap added above must survive for seg cases too: C caps
                # PER SEGMENT, so dropping ours ran 2048/seg vs 160/seg.)
                ours_extra = ours_extra + ["--no-batch-segments"]
        elif name in SAMPLED_CASES or name in SAMPLED_Q25_CASES:
            wav_name, flags, seed48 = (SAMPLED_CASES.get(name)
                                       or SAMPLED_Q25_CASES[name])
            tail = list(flags)
            if wav_name is not None:
                wav_path = os.path.join(WAV_DIR, wav_name + ".wav")
                with open(wav_path, "wb") as f:
                    f.write(audio[wav_name])
                tail += ["-i", wav_path]
            c_env = {"QWEN_SEED": str(seed48)}
            ours_extra = ["--sampler", "cref", "--seed", str(seed48)]
        elif name in THINKER_EXTRA or name in Q25_MODE_CASES:
            wav_name, flags = (THINKER_EXTRA.get(name)
                               or Q25_MODE_CASES[name])
            tail = list(flags)
            if wav_name is not None:
                wav_path = os.path.join(WAV_DIR, wav_name + ".wav")
                with open(wav_path, "wb") as f:
                    f.write(audio[wav_name])
                tail += ["-i", wav_path]
        else:
            wav_path = os.path.join(WAV_DIR, name + ".wav")
            with open(wav_path, "wb") as f:
                f.write(audio[name])
            tail = ["--thinker", "-i", wav_path,
                    "--temperature", "0", "--max-tokens", mt]
        common = ["-d", model_dir] + tail
        t0 = time.monotonic()
        res = run_case(name, common, common + ours_extra, bin_path,
                       allow_empty=allow_empty, stdin_data=stdin_data,
                       c_env=c_env)
        res["secs"] = round(time.monotonic() - t0, 1)
        status = "OK " if res["match"] else "FAIL"
        print(f"{status} {name:26s} {res['secs']:6.1f}s  c_rc={res['c_rc']} "
              f"our_rc={res['our_rc']} c={res['c_bytes']}B ours={res['our_bytes']}B"
              + ("" if res["match"] else f" div@{res['divergence_byte']}"),
              flush=True)
        if not res["match"]:
            d = max(0, res["divergence_byte"])
            print(f"   C   : {res['c_stdout'][max(0, d - 20):d + 40]!r}")
            print(f"   ours: {res['our_stdout'][max(0, d - 20):d + 40]!r}")
            print(f"   C stderr: ...{res['c_stderr_tail'][-160:]}")
            print(f"   our stderr: ...{res['our_stderr_tail'][-160:]}")
            fails.append(name)
        results.append(res)

    print(f"\n{len(results) - len(fails)}/{len(results)} matched "
          f"({time.monotonic() - t_all:.0f}s total)")
    if fails:
        print("FAILED: " + ", ".join(fails))
    if args.json_out:
        slim = [{k: (v if not isinstance(v, bytes) else v.decode(errors="replace"))
                 for k, v in r.items()} for r in results]
        with open(args.json_out, "w") as f:
            json.dump(slim, f, indent=1)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
