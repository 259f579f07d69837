"""Streaming transcription: chunked prefix-rollback decoding with an
encoder window cache, degeneration recovery, and stable-frontier commits.

Behavioral port of stream_impl (qwen_asr.c:1114-2219) re-expressed around
bucketed, recompile-free TPU calls:
  * 2 s chunks; first `unfixed_chunks` chunks decode with no text prefix;
    later chunks prepend raw decoded tokens minus the last `rollback`
    (official streaming policy, MODEL.md:402-432),
  * encoder window cache: completed n_window_infer-frame windows are
    immutable (hard attention boundaries) and encoded ONCE; only the partial
    tail is re-encoded each chunk; >4 windows are evicted (~32 s context),
  * prefill KV reuse: the longest-common-prefix of a host-side prompt
    SIGNATURE (token ids + audio-row identities) decides how many cached KV
    positions survive — cleaner than the reference's embedding-row memcmp
    and exactly as strict (cached windows are bit-identical device buffers),
  * bounded decode (stream_max_new_tokens, default 32),
  * repeat-run suppression (>12 identical tokens dropped),
  * degeneration recovery: repeated tail blocks (period<=6, reps>=4),
    4 stagnant chunks, or >=8 dropped repeats re-anchor the text state to the
    last 24 emitted tokens and clear all caches,
  * periodic reset every 45 chunks (conditioned mode),
  * stable-frontier commit: LCP against the previous candidate + 4..48-token
    overlap dedup against EMITTED tokens,
  * --monitor heartbeat symbols on stderr.

All constants preserved from qwen_asr.c:1369-1378.
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import (
    EOS_TOKEN_IDS,
    HOP_LENGTH,
    SAMPLE_RATE,
    TOKEN_ASR_TEXT,
)
from smolvision_tpu.runtime import prompt as prompt_mod
from smolvision_tpu.runtime.buckets import bucket
from smolvision_tpu.runtime.segment import compact_silence

MAX_ENC_WINDOWS = 4
MAX_PREFIX_TOKENS = 150
MAX_REPEAT_TOKEN_RUN = 12
OVERLAP_MAX_TOKENS = 48
OVERLAP_MIN_TOKENS = 4
DEGEN_MAX_PERIOD = 6
DEGEN_MIN_REPEATS = 4
STALE_CHUNKS = 4
RESET_INTERVAL_CHUNKS = 45
RESET_CARRY_TOKENS = 24


def tail_repeat_blocks(tokens: List[int], max_period: int) -> Tuple[int, int]:
    """Max repetition count of a trailing block, and its period.

    (reps, period): e.g. [..., a,b,a,b,a,b] -> (3, 2).  Mirrors
    stream_tail_repeat_blocks (qwen_asr.c:1137-1163)."""
    n = len(tokens)
    if n < 2:
        return 1, 0
    best_reps, best_period = 1, 0
    period_cap = min(n // 2, max_period) if max_period > 0 else n // 2
    for p in range(1, period_cap + 1):
        reps = 1
        while (reps + 1) * p <= n:
            a = tokens[n - (reps + 1) * p : n - reps * p]
            b = tokens[n - reps * p : n - (reps - 1) * p]
            if a != b:
                break
            reps += 1
        if reps > best_reps:
            best_reps, best_period = reps, p
    return best_reps, best_period


class _EncWindowCache:
    """Completed encoder windows: device arrays + identity uids for the
    prefill-reuse signature."""

    def __init__(self):
        self.windows: List[Tuple[int, object, int, int]] = []  # (start, arr, seq, uid)
        self.next_uid = 0
        self.next_window_start = 0
        self.total_seq = 0

    def append(self, start: int, arr, seq: int):
        self.windows.append((start, arr, seq, self.next_uid))
        self.next_uid += 1
        self.total_seq += seq

    def evict_to(self, max_windows: int) -> int:
        evicted = 0
        while len(self.windows) > max_windows:
            _, _, seq, _ = self.windows.pop(0)
            self.total_seq -= seq
            evicted += 1
        return evicted

    def clear(self, new_start: int):
        self.windows.clear()
        self.total_seq = 0
        self.next_window_start = new_start


def _monitor(engine, sym: str):
    if engine.monitor:
        sys.stderr.write(sym)
        sys.stderr.flush()


def _encode_span(engine, samples: np.ndarray):
    """Encode one audio span -> (device array [Tcap, H], seq_len)."""
    from smolvision_tpu.ops.mel import log_mel

    if len(samples) <= 0:
        return None, 0
    mel = log_mel(samples)
    return engine.encode_mel(mel)


def transcribe_stream(engine, samples: np.ndarray) -> Optional[str]:
    return _stream_impl(engine, samples, None)


def transcribe_stream_live(engine, live) -> Optional[str]:
    return _stream_impl(engine, None, live)


def _stream_impl(engine, samples: Optional[np.ndarray], live) -> Optional[str]:
    cfg = engine.cfg
    chunk_samples = int(engine.stream_chunk_sec * SAMPLE_RATE)
    rollback = engine.stream_rollback
    unfixed_chunks = engine.stream_unfixed_chunks
    max_new = engine.stream_max_new_tokens or 32

    engine.perf.reset()
    engine.prepare_prompt()
    tok = engine.tokenizer
    forced = bool(engine._force_tokens)

    if live is None and engine.skip_silence:
        samples = compact_silence(samples, engine.verbose)

    enc_window_frames = min(max(cfg.enc_n_window_infer, 100), 800)
    enc_window_samples = enc_window_frames * HOP_LENGTH

    no_cache_env = os.environ.get("QWEN_STREAM_NO_ENC_CACHE",
                                  os.environ.get("SMOLVISION_STREAM_NO_ENC_CACHE", ""))
    use_enc_cache = not (no_cache_env and no_cache_env != "0")
    if live is not None and not use_enc_cache:
        use_enc_cache = True  # live requires the cache (bounded memory)

    # --silent + preloaded file: one full-context refinement pass
    if engine.token_cb is None and live is None:
        engine.perf.audio_ms = 1000.0 * len(samples) / SAMPLE_RATE
        text, _ = engine.transcribe_segment(samples)
        return text

    if live is None:
        engine.perf.audio_ms = 1000.0 * len(samples) / SAMPLE_RATE
        local = np.asarray(samples, dtype=np.float32)
        local_base = 0
        total_samples = len(local)
        live_eof = True
    else:
        off, data, live_eof = live.snapshot_and_reset()
        local = data
        local_base = off
        total_samples = local_base + len(local)

    raw_tokens: List[int] = []
    stable_text: List[int] = []
    emitted: List[int] = []
    result_pieces: List[bytes] = []
    stagnant_chunks = 0
    chunk_idx = 0
    audio_cursor = 0
    enc_cache = _EncWindowCache()
    prev_signature: Optional[List] = None
    partial_uid = [1 << 40]  # fresh ids for re-encoded partial tails
    prefill_total = 0
    prefill_reused = 0

    def reanchor():
        """Re-anchor text state to a short committed tail (qwen_asr.c:1194-1248)."""
        nonlocal raw_tokens, stable_text, prev_signature
        carry = min(len(emitted), RESET_CARRY_TOKENS)
        tail = emitted[len(emitted) - carry :]
        raw_tokens = ([] if forced else [TOKEN_ASR_TEXT]) + list(tail)
        stable_text = list(tail)
        prev_signature = None

    while audio_cursor < total_samples or (live is not None and not live_eof):
        if live is not None:
            want = audio_cursor + chunk_samples
            live_eof = live.wait_for(want)
            off, data, live_eof = live.snapshot_and_reset()
            local_end = local_base + len(local)
            if local_end < off:
                if engine.verbose >= 1:
                    print(f"Streaming (live): local buffer overrun, resyncing "
                          f"(local_end={local_end}, live_start={off})",
                          file=sys.stderr, flush=True)
                local = data
                local_base = off
            elif len(data):
                skip = local_end - off
                if skip < len(data):
                    local = np.concatenate([local, data[skip:]])
            total_samples = local_base + len(local)
            engine.perf.audio_ms = 1000.0 * total_samples / SAMPLE_RATE

        chunk_t0 = time.monotonic() * 1000.0
        audio_cursor = min(audio_cursor + chunk_samples, total_samples)
        is_final = (live_eof if live is not None else True) and audio_cursor >= total_samples

        # ---- encoder: cached windows + partial tail -------------------
        t0 = time.monotonic() * 1000.0
        full_end = (audio_cursor // enc_window_samples) * enc_window_samples
        segs = []       # list of (arr, seq, sig_tag)
        enc_failed = False
        if not use_enc_cache:
            arr, seq = _encode_span(engine, local[: audio_cursor - local_base])
            if seq <= 0:
                chunk_idx += 1
                continue
            partial_uid[0] += 1
            segs = [(arr, seq, partial_uid[0])]
            enc_seq_len = seq
        else:
            while enc_cache.next_window_start < full_end:
                ws = enc_cache.next_window_start
                lo = ws - local_base
                if lo < 0 or lo + enc_window_samples > len(local):
                    enc_failed = True
                    break
                arr, seq = _encode_span(engine, local[lo : lo + enc_window_samples])
                if seq <= 0:
                    enc_failed = True
                    break
                enc_cache.append(ws, arr, seq)
                enc_cache.next_window_start += enc_window_samples
            if enc_failed:
                chunk_idx += 1
                continue
            evicted = enc_cache.evict_to(MAX_ENC_WINDOWS)
            if evicted:
                _monitor(engine, "⟳")

            partial_arr, partial_seq = (None, 0)
            if full_end < audio_cursor:
                lo = full_end - local_base
                partial_arr, partial_seq = _encode_span(
                    engine, local[lo : audio_cursor - local_base])

            segs = [(arr, seq, uid) for (_, arr, seq, uid) in enc_cache.windows]
            if partial_seq > 0:
                partial_uid[0] += 1
                segs.append((partial_arr, partial_seq, partial_uid[0]))
            enc_seq_len = sum(s[1] for s in segs)
            if enc_seq_len <= 0:
                chunk_idx += 1
                continue
        engine.perf.encode_ms += time.monotonic() * 1000.0 - t0
        _monitor(engine, "▶")

        # assemble the audio embedding block on device
        parts = [arr[:seq] for (arr, seq, _) in segs]
        audio_block = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        acap = bucket(enc_seq_len, 16)
        if acap > enc_seq_len:
            audio_block = jnp.pad(audio_block, ((0, acap - enc_seq_len), (0, 0)))

        # ---- prompt + prefix rollback ---------------------------------
        n_prefix_full = 0
        n_prefix = 0
        prefix_offset = 0
        if engine.past_text_conditioning and chunk_idx >= unfixed_chunks and raw_tokens:
            n_prefix_full = max(len(raw_tokens) - rollback, 0)
            n_prefix = n_prefix_full
            if n_prefix > MAX_PREFIX_TOKENS:
                n_prefix = MAX_PREFIX_TOKENS
                prefix_offset = n_prefix_full - n_prefix
        prefix_tokens = raw_tokens[prefix_offset : prefix_offset + n_prefix]

        ids, audio_start = prompt_mod.build_stream_prompt(
            cfg, enc_seq_len, engine._prompt_tokens, engine._force_tokens,
            prefix_tokens)

        # prompt signature for KV reuse (token ids + audio row identities)
        signature: List = [("t", t) for t in ids[:audio_start]]
        for (_, seq, uid) in segs:
            signature += [("a", uid, i) for i in range(seq)]
        signature += [("t", t) for t in ids[audio_start + enc_seq_len :]]

        reused = 0
        if prev_signature is not None:
            m = min(len(prev_signature), len(signature))
            while reused < m and prev_signature[reused] == signature[reused]:
                reused += 1

        # ---- prefill + bounded decode ---------------------------------
        t0 = time.monotonic() * 1000.0
        first, total_len = engine.prefill_with_reuse(
            ids, audio_block, audio_start, enc_seq_len, reused)
        prev_signature = signature
        prefill_total += total_len
        prefill_reused += min(reused, total_len - 1)
        engine.perf.decode_ms += time.monotonic() * 1000.0 - t0
        _monitor(engine, "·")
        if engine.verbose >= 2:
            print(f"  Prefill: {total_len} tokens ({n_prefix} prefix, "
                  f"reused {min(reused, total_len - 1)})", file=sys.stderr, flush=True)

        t0 = time.monotonic() * 1000.0
        chunk_tokens: List[int] = []
        n_generated = engine.decode_greedy(
            first, total_len, max_new,
            lambda t: (chunk_tokens.append(t) or True))
        decode_ms = time.monotonic() * 1000.0 - t0
        engine.perf.decode_ms += decode_ms
        # mirrors qwen_asr.c:2011 exactly: max-length detection looks only at
        # n_generated (a chunk whose max_new-th token is EOS still counts)
        hit_max = n_generated >= max_new
        _monitor(engine, "▸" if (n_generated and decode_ms / n_generated > 30) else "▪")

        # ---- history update with repeat-run suppression ----------------
        dropped_repeats = 0
        if chunk_tokens:
            prev_tok = raw_tokens[n_prefix_full - 1] if n_prefix_full > 0 else None
            prev_run = 0
            if prev_tok is not None:
                prev_run = 1
                for j in range(n_prefix_full - 2, -1, -1):
                    if raw_tokens[j] != prev_tok:
                        break
                    prev_run += 1
                    if prev_run >= MAX_REPEAT_TOKEN_RUN:
                        break
            kept = []
            for t in chunk_tokens:
                if t == prev_tok:
                    prev_run += 1
                    if prev_run > MAX_REPEAT_TOKEN_RUN:
                        dropped_repeats += 1
                        continue
                else:
                    prev_tok = t
                    prev_run = 1
                kept.append(t)
            chunk_tokens = kept
        raw_tokens = raw_tokens[:n_prefix_full] + chunk_tokens

        # ---- text region parse -----------------------------------------
        text_start = 0
        if not forced:
            try:
                text_start = raw_tokens.index(TOKEN_ASR_TEXT) + 1
            except ValueError:
                text_start = 0
        candidate = raw_tokens[text_start:]
        n_text = len(candidate)

        # ---- commit frontier -------------------------------------------
        if is_final:
            candidate_len = n_text
        elif chunk_idx >= unfixed_chunks:
            candidate_len = n_text - rollback
            if candidate_len <= 0 and n_text > 0:
                candidate_len = n_text - 1
            candidate_len = max(candidate_len, 0)
        else:
            candidate_len = 0

        cand = candidate[:candidate_len]
        reps, period = tail_repeat_blocks(cand, DEGEN_MAX_PERIOD)
        advance = candidate_len - len(stable_text)
        if not is_final and hit_max and advance <= 1:
            stagnant_chunks += 1
        else:
            stagnant_chunks = 0

        recovery = (
            (period > 0 and reps >= DEGEN_MIN_REPEATS)
            or stagnant_chunks >= STALE_CHUNKS
            or dropped_repeats >= 8
        )
        if recovery:
            reanchor()
            enc_cache.clear(full_end)
            stagnant_chunks = 0
            _monitor(engine, "!")
            if engine.verbose >= 2:
                print("  Recovery reset applied", file=sys.stderr, flush=True)
        else:
            lcp = 0
            m = min(len(stable_text), candidate_len)
            while lcp < m and stable_text[lcp] == cand[lcp]:
                lcp += 1
            emit_start = lcp
            if emit_start < candidate_len and emitted:
                max_ov = min(candidate_len - emit_start, len(emitted), OVERLAP_MAX_TOKENS)
                for k in range(max_ov, OVERLAP_MIN_TOKENS - 1, -1):
                    if emitted[len(emitted) - k :] == cand[emit_start : emit_start + k]:
                        emit_start += k
                        break
            for i in range(emit_start, candidate_len):
                t = cand[i]
                piece = tok.decode_piece(t)
                if engine.token_cb:
                    engine.token_cb(piece)
                result_pieces.append(piece)
                emitted.append(t)
                engine.perf.text_tokens += 1
            stable_text = list(cand)

            periodic = (
                not is_final
                and engine.past_text_conditioning
                and chunk_idx >= unfixed_chunks
                and (chunk_idx + 1) % RESET_INTERVAL_CHUNKS == 0
            )
            if periodic:
                reanchor()
                enc_cache.clear(full_end)
                if engine.verbose >= 2:
                    print("  Periodic reset applied", file=sys.stderr, flush=True)

        # live mode: drop consumed samples before full_end
        if live is not None and use_enc_cache and full_end > local_base:
            drop = min(full_end - local_base, len(local))
            if drop > 0:
                local = local[drop:]
                local_base += drop
                total_samples = local_base + len(local)

        engine.perf.total_ms += time.monotonic() * 1000.0 - chunk_t0
        chunk_idx += 1

    if engine.verbose >= 2 and prefill_total > 0:
        pct = 100.0 * prefill_reused / prefill_total
        print(f"  Prefill reuse: {prefill_reused}/{prefill_total} tokens ({pct:.1f}%)",
              file=sys.stderr, flush=True)

    return b"".join(result_pieces).decode("utf-8", errors="replace").strip()
