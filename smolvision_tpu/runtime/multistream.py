"""Multi-stream serving: N concurrent streaming ASR sessions on one chip.

The reference engine is strictly one stream per process (qwen_ctx_t owns a
single KV cache and stream state).  Here the expensive state — device
weight pytrees and compiled programs — is shared across sessions, and each
session gets its own lightweight view of the engine (fresh KV cache, perf
counters, callback, streaming state).

Two execution modes:
  * BATCHED (default for preloaded audio): sessions advance chunk-by-chunk
    on a shared clock; each round, every active session's prompt prefill and
    bounded decode run as ONE batch through the batch-native decoder
    (models/qwen3_decoder.py batched_*, left-padded layout).  The streaming
    state machine (runtime/stream.StreamState) is untouched — the batch
    coordinator only replaces the model-call middle of each chunk, and
    per-session tokens are EXACTLY those of a solo run (tested): greedy
    argmax is deterministic and the batched decoder matches the sequential
    one token-for-token.  One decode dispatch serves all N sessions, so
    aggregate throughput scales with N until the batch hits its bandwidth
    bound instead of paying N single-stream decodes.
  * THREADED (live sources, or SMOLVISION_BATCH_STREAMS=0): one host thread
    per session, independent device dispatches.  Correct but bounded by the
    serialized single-stream dispatch rate (jax serializes dispatch
    internally) — kept for live audio whose sessions cannot share a clock.
"""

from __future__ import annotations

import copy
import os
import threading
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from smolvision_tpu.runtime import stream as stream_mod
from smolvision_tpu.runtime.engine import PerfStats


def clone_session(engine):
    """A lightweight engine view for one session: shares the device weights,
    jitted programs, tokenizer, and generation settings; owns its KV cache,
    perf counters, and callback."""
    _ = engine.tokenizer          # load once; clones share it
    engine.prepare_prompt()
    s = copy.copy(engine)
    s.perf = PerfStats()
    s.token_cb = None
    s.reset_kv()
    return s


class StreamSession:
    """One live streaming transcription bound to a session engine view."""

    def __init__(self, engine, source, on_token: Optional[Callable[[bytes], None]] = None):
        """source: np.ndarray of samples (preloaded audio, streamed in 2 s
        chunks) or a LiveAudio-like object (io/live.py protocol)."""
        self.engine = clone_session(engine)
        # a session must stream chunk-by-chunk even for preloaded audio;
        # the silent-mode short-circuit (one full-context pass) is for the
        # single-stream CLI only, so always install a callback
        self.engine.token_cb = on_token if on_token is not None else (lambda piece: None)
        self.source = source
        self.text: Optional[str] = None
        self.error: Optional[BaseException] = None

    def run(self):
        try:
            if isinstance(self.source, np.ndarray):
                self.text = stream_mod.transcribe_stream(self.engine, self.source)
            else:
                self.text = stream_mod.transcribe_stream_live(self.engine, self.source)
        except BaseException as e:  # surfaced by run_streams
            self.error = e


def run_streams(engine, sources: Sequence, on_token=None) -> List[Optional[str]]:
    """Run one streaming session per source concurrently; returns final
    texts in source order.

    Preloaded audio arrays go through the BATCHED coordinator (per-chunk
    model calls batched across sessions); live sources, single sources, or
    SMOLVISION_BATCH_STREAMS=0 use one host thread per session.

    on_token: optional callable (session_index, piece_bytes) invoked as
    text commits (from session threads in threaded mode).
    """
    batched_ok = (len(sources) > 1
                  and all(isinstance(s, np.ndarray) for s in sources)
                  and os.environ.get("SMOLVISION_BATCH_STREAMS", "") != "0")
    if batched_ok:
        return run_streams_batched(engine, sources, on_token)

    sessions = []
    for i, src in enumerate(sources):
        cb = (lambda piece, _i=i: on_token(_i, piece)) if on_token else None
        sessions.append(StreamSession(engine, src, cb))
    threads = [threading.Thread(target=s.run, name=f"stream-{i}", daemon=True)
               for i, s in enumerate(sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for s in sessions:
        if s.error is not None:
            raise s.error
    return [s.text for s in sessions]


# ---------------------------------------------------------------------------
# Batched coordinator (phase 2)
# ---------------------------------------------------------------------------


def run_streams_batched(engine, sources: Sequence[np.ndarray],
                        on_token=None) -> List[Optional[str]]:
    """Advance all sessions chunk-by-chunk on a shared clock, batching each
    round's prefills + bounded decodes through the batch-native decoder.

    Every session keeps its own StreamState (encoder window cache, commit
    frontier, recovery logic — runtime/stream.py); only the model-call
    middle of each chunk is replaced.  The batched middle re-prefills each
    session's FULL prompt every chunk (no per-session KV reuse: the
    left-padded batch layout re-aligns rows each round) — recompute is
    token-exact vs the cached path by construction (pinned by the
    stream-cache and KV-reuse equivalence tests), and one batched prefill
    of N prompts costs far less than N single prefills on TPU.
    """
    states = []
    for i, src in enumerate(sources):
        view = clone_session(engine)
        cb = (lambda piece, _i=i: on_token(_i, piece)) if on_token else (lambda piece: None)
        view.token_cb = cb
        states.append(stream_mod.StreamState(view, np.asarray(src, np.float32), None))

    while True:
        works = []
        for st in states:
            if st.active():
                w = st.begin_chunk()
                if w is not None:
                    works.append((st, w))
        if not works:
            if not any(st.active() for st in states):
                break
            continue
        if len(works) == 1:
            st, w = works[0]
            if not getattr(st, "_solo_kv_valid", False):
                # Every earlier round for this session ran through the
                # BATCHED cache: its solo engine view's KV has never seen
                # this prompt, so w.reused (the signature LCP vs last
                # round's prompt) would reuse zeroed/stale rows.  Reset and
                # prefill fully; subsequent consecutive solo rounds reuse
                # normally.
                st.engine.reset_kv()
                w.reused = 0
                st._solo_kv_valid = True
            stream_mod.run_solo_chunk(st, w)
            continue
        for st, _ in works:
            st._solo_kv_valid = False
        _run_batched_chunks(engine, works)

    return [st.finalize() for st in states]


def _run_batched_chunks(engine, works):
    """One shared-clock round: batch every active session's (full-prompt
    prefill + bounded greedy decode) through the batch-native decoder, then
    feed each session's tokens back into its own StreamState.

    Exact-token contract: the reconstruction below replays Engine.
    decode_greedy's loop semantics per row (first token from prefill, EOS
    terminates before the callback, n_generated counts every consumed
    token), so StreamState sees byte-identical inputs to a solo run.
    """
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.config import EOS_TOKEN_IDS
    from smolvision_tpu.parallel import batch as pbatch
    from smolvision_tpu.runtime.batch_segments import (
        BATCH_DECODE_CHUNK,
        _batched_jits,
    )
    from smolvision_tpu.runtime.buckets import bucket, bucket128

    cfg = engine.cfg
    H = cfg.dec_hidden
    max_new = max(st.max_new for st, _ in works)
    B_real = len(works)
    B = max(2, 1 << (B_real - 1).bit_length())   # pow2 batch bucket

    tcap = bucket128(max(len(w.ids) for _, w in works))
    acap = bucket(max(w.enc_seq_len for _, w in works), 16)

    t_pre0 = time.monotonic() * 1000.0

    # left-padded layout (see batch_segments.py): cache index = logical
    # position + pad; rope_start = -pad; kv_min = pad masks pad rows
    pads = [tcap - len(w.ids) for _, w in works]
    ids_arr = np.zeros((B, tcap), dtype=np.int32)
    astart = np.full((B,), -1_000_000, dtype=np.int32)
    alen = np.zeros((B,), dtype=np.int32)
    rope_start = np.zeros((B,), dtype=np.int32)
    kv_min = np.full((B,), tcap - 1, dtype=np.int32)
    audio_rows = []
    for b, (st, w) in enumerate(works):
        ids_arr[b, pads[b] :] = np.asarray(w.ids, dtype=np.int32)
        astart[b] = w.audio_start + pads[b]
        alen[b] = w.enc_seq_len
        rope_start[b] = -pads[b]
        kv_min[b] = pads[b]
        blk = w.audio_block
        if blk.shape[0] < acap:
            blk = jnp.pad(blk, ((0, acap - blk.shape[0]), (0, 0)))
        elif blk.shape[0] > acap:
            blk = blk[:acap]
        audio_rows.append(blk)
    # inactive pad rows duplicate row 0 (rows are independent in the batched
    # decoder; their outputs are discarded)
    for b in range(B_real, B):
        ids_arr[b] = ids_arr[0]
        astart[b] = astart[0]
        alen[b] = alen[0]
        rope_start[b] = rope_start[0]
        kv_min[b] = kv_min[0]
        audio_rows.append(audio_rows[0])
    audio_stack = jnp.stack(audio_rows)

    kcap = bucket128(tcap + max_new + 1)
    cache = getattr(engine, "_mstream_kv", None)
    if cache is not None and cache[0] == (B, kcap):
        kv = cache[1]   # stale contents are never attended (kv_min/start_pos)
    else:
        kv = pbatch.make_batched_kv(cfg, B, kcap, engine.kv_dtype)

    build, prefill, decode = _batched_jits(engine)
    embeds = build(engine.dec_params, jnp.asarray(ids_arr), audio_stack,
                   jnp.asarray(astart), jnp.asarray(alen))
    first, kv = prefill(engine.dec_params, embeds, kv,
                        jnp.asarray(rope_start), jnp.asarray(kv_min))
    first_host = np.asarray(jax.device_get(first))
    prefill_ms = (time.monotonic() * 1000.0 - t_pre0) / B_real

    for b, (st, w) in enumerate(works):
        w.reused = 0   # batched middle re-prefills fully; no KV reuse stats
        st.note_prefill(w, len(w.ids), prefill_ms)

    t_dec0 = time.monotonic() * 1000.0
    rows = [[int(first_host[b])] for b in range(B)]
    done = [int(first_host[b]) in EOS_TOKEN_IDS for b in range(B)]
    tokens = first
    pos = tcap
    produced = 1
    rope_offset = jnp.asarray(pads + [pads[0]] * (B - B_real), dtype=np.int32)
    kv_min_dev = jnp.asarray(kv_min)
    while produced < max_new and not all(done):
        steps = min(BATCH_DECODE_CHUNK, max_new - produced)
        buf, count, tokens, kv = decode(engine.dec_params, tokens,
                                        jnp.int32(pos), kv, rope_offset,
                                        kv_min_dev, jnp.int32(steps))
        buf_host, count = jax.device_get((buf, count))
        count = int(count)
        if count == 0:
            break
        for b in range(B):
            if done[b]:
                continue
            for t in buf_host[b][:count]:
                t = int(t)
                rows[b].append(t)
                if t in EOS_TOKEN_IDS:
                    done[b] = True
                    break
        pos += count
        produced += count
    engine._mstream_kv = ((B, kcap), kv)
    decode_ms = (time.monotonic() * 1000.0 - t_dec0) / B_real

    # replay decode_greedy's consumption semantics per session
    for b, (st, w) in enumerate(works):
        chunk_tokens = []
        n = 0
        for t in rows[b]:
            if n >= st.max_new:
                break
            n += 1
            if t in EOS_TOKEN_IDS:
                break
            chunk_tokens.append(t)
        st.finish_chunk(w, chunk_tokens, n, decode_ms)
