"""Multi-stream serving: N concurrent streaming ASR sessions on one chip.

The reference engine is strictly one stream per process (qwen_ctx_t owns a
single KV cache and stream state).  Here the expensive state — device
weight pytrees and compiled programs — is shared across sessions, and each
session gets its own lightweight view of the engine (fresh KV cache, perf
counters, callback, streaming state).

Two execution modes:
  * BATCHED (default for preloaded audio): sessions advance chunk-by-chunk
    on a shared clock; each round, every active session's delta prefill and
    bounded decode run as ONE batch through the batch-native decoder
    (models/qwen3_decoder.py batched_*, natural layout: prompt KV at
    logical positions, shared decode region).  The streaming
    state machine (runtime/stream.StreamState) is untouched — the batch
    coordinator only replaces the model-call middle of each chunk, and
    per-session tokens are EXACTLY those of a solo run (tested): greedy
    argmax is deterministic and the batched decoder matches the sequential
    one token-for-token.  The exactness contract is pinned in the host-mel
    regime (CPU tests; SMOLVISION_DEVICE_MEL=0 forces it anywhere): on TPU
    the default pre-encode uses the f16 device-mel front end (the same
    ~1e-4-mel relaxation the serving path takes, _use_device_mel) while
    prediction MISSES fall back to host mel inside begin_chunk — the same
    relaxation class as bf16 decode drift, but not bit-identical to solo.
    One decode dispatch serves all N sessions, so
    aggregate throughput scales with N until the batch hits its bandwidth
    bound instead of paying N single-stream decodes.  When
    engine.serving_mesh is set (same knob as runtime/serving.py) the row
    axis additionally shards over the mesh "data" axis — the multi-chip
    lever past the measured single-chip plateau (docs/MULTISTREAM.md).
  * THREADED (single source, or SMOLVISION_BATCH_STREAMS=0): one host
    thread per session, independent device dispatches.  Correct but bounded
    by the serialized single-stream dispatch rate (jax serializes dispatch
    internally).  Live sources run on the BATCHED coordinator too since
    round 3 (NOT_READY polling on the shared clock, token traces identical
    to preloaded audio); threaded survives only as the opt-out fallback.
"""

from __future__ import annotations

import copy
import os
import sys
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

    Preloaded audio arrays AND live sources (io/live.py protocol) go
    through the BATCHED coordinator (per-chunk model calls batched across
    sessions); single sources or SMOLVISION_BATCH_STREAMS=0 use one host
    thread per session.

    on_token: optional callable (session_index, piece_bytes) invoked as
    text commits (from session threads in threaded mode).
    """
    def _live_like(s):
        # io/live.py protocol + the non-blocking poll the coordinator needs
        return (hasattr(s, "snapshot_and_reset")
                and hasattr(s, "available_through"))

    batched_ok = (len(sources) > 1
                  and all(isinstance(s, np.ndarray) or _live_like(s)
                          for s in sources)
                  and os.environ.get("SMOLVISION_BATCH_STREAMS", "") != "0")
    if batched_ok:
        return run_streams_batched(engine, sources, on_token)
    from smolvision_tpu.parallel.mesh import mesh_tp

    if mesh_tp(getattr(engine, "serving_mesh", None)) > 1:
        # the threaded mode drives the engine's tp-UNAWARE single-stream
        # jits: a TP-interleaved engine would silently decode scrambled
        # heads — fail loudly instead
        raise ValueError(
            "threaded multistream cannot run on a TP-sharded engine "
            "(serving_mesh model axis > 1); use >1 preloaded/live sources "
            "so the batched coordinator runs, or a tp=1 mesh")

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
    middle of each chunk is replaced.  The batched middle REUSES each
    session's KV across rounds (_BatchKV, NATURAL layout): sessions keep a
    FIXED batch row and their prompt KV sits at its logical positions, so
    kept rows never move; only the tail block below the shallowest per-row
    reuse point is re-prefilled (token-exact by greedy determinism — rows
    with deeper reuse recompute a few kept tokens into identical values),
    and the bounded decodes run in a shared decode region past the prompt
    cap.  SMOLVISION_MSTREAM_NO_REUSE=1 forces full re-prefill every round
    — the degraded path the equivalence tests compare against.
    """
    states = []
    for i, src in enumerate(sources):
        view = clone_session(engine)
        cb = (lambda piece, _i=i: on_token(_i, piece)) if on_token else (lambda piece: None)
        view.token_cb = cb
        if isinstance(src, np.ndarray):
            states.append(stream_mod.StreamState(
                view, np.asarray(src, np.float32), None))
        else:
            # LIVE source on the shared clock: the session polls its buffer
            # (nowait) and reports NOT_READY instead of blocking the round
            st = stream_mod.StreamState(view, None, src)
            st.nowait = True
            states.append(st)

    # Optional data-parallel coordination over a device mesh: when
    # engine.serving_mesh is set (the same knob runtime/serving.py uses),
    # the batched cache's row axis is sharded over the mesh "data" axis and
    # the round's prefill/decode jits compile to GSPMD programs — the
    # "second chip" lever docs/MULTISTREAM.md names at the N=16 plateau
    # (rows are independent streams, so DP sharding cannot change tokens;
    # pinned by tests/test_multistream.py and the multichip dryrun).
    # Default None: byte-identical single-device behavior.
    min_b = 2
    kv_shard = None
    smesh = getattr(engine, "serving_mesh", None)
    if smesh is not None:
        import jax.numpy as jnp

        from smolvision_tpu.parallel import mesh as mesh_mod

        min_b = max(2, int(smesh.shape[mesh_mod.DATA_AXIS]))
        kv_shard = mesh_mod.batched_kv_sharding(
            smesh, quant=(engine.batched_kv_dtype == jnp.int8))

    cache = _BatchKV(len(states), min_b=min_b)
    cache.kv_shard = kv_shard
    row_of = {id(st): r for r, st in enumerate(states)}
    if len(states) > 1:
        arr_lens = [len(np.asarray(s)) for s in sources
                    if isinstance(s, np.ndarray)]
        horizon = max(arr_lens) if arr_lens else 45 * 16000
        cache.prewarm_args = (horizon, max(st.max_new for st in states))
        _prewarm_batched(engine, cache.B, *cache.prewarm_args)

    while True:
        act = [st for st in states if st.active()]
        _compact_rows(engine, cache, row_of, act)
        if len(act) > 1:
            _pre_encode_round(engine, act)
        works = []
        n_pending = 0
        for st in act:
            w = st.begin_chunk()
            if w is stream_mod.NOT_READY:
                n_pending += 1
                continue
            if w is not None:
                works.append((st, w))
        if not works:
            if not any(st.active() for st in states):
                break
            if n_pending:
                time.sleep(0.005)   # live buffers filling; don't spin
            continue
        if (len(works) == 1
                and cache.kv_shard is None
                and os.environ.get("SMOLVISION_MSTREAM_SOLO_BATCHED",
                                   "1") == "0"):
            # (under a mesh the env is ignored: run_solo_chunk drives the
            # engine's tp-UNAWARE single-stream jits, which would silently
            # scramble a TP-interleaved engine's heads — the batched
            # singleton path below is the only mesh-supported one)
            # LEGACY solo fallback (opt-in via ...SOLO_BATCHED=0).  The
            # default routes singleton rounds through the batched
            # machinery below (one active row, pad rows masked), which
            # preserves KV reuse in BOTH directions: the solo transition
            # previously cost a full re-prefill AND invalidated the
            # session's batched row (its signature advances), so a live
            # fleet with one straggler alternating 1-active/2-active
            # rounds paid two full prefills per alternation
            # (docs/MULTISTREAM.md).  Token-exact either way
            # (test_multistream.py pins both paths against each other).
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
            cache.valid[row_of[id(st)]] = False   # batched row now stale
            stream_mod.run_solo_chunk(st, w)
            continue
        for st, _ in works:
            st._solo_kv_valid = False
        _run_batched_chunks(engine, works, cache, row_of)

    return [st.finalize() for st in states]


def _prewarm_batched(engine, B: int, max_src_samples: int, max_new: int):
    """Issue the coordinator's program ladder to the compile service UP
    FRONT, concurrently.

    The coordinator discovers its shapes round-by-round (tcap grows as
    prompts grow), so without this the big prefill/decode compiles
    SERIALIZE across rounds — measured warmups of 6-17 min.  Server-side
    compiles overlap when issued concurrently (docs/COLDSTART.md,
    tools/probe_parallel_compile.py) and the compile service caches by
    program, so lowering the ladder here and firing .compile() from a
    thread pool lets the server crunch every shape while the early rounds
    execute.  Traces run serially (single-core host); only the compile
    RPCs fan out.  SMOLVISION_MSTREAM_NO_PREWARM=1 disables.
    """
    if os.environ.get("SMOLVISION_MSTREAM_NO_PREWARM", "") == "1":
        return
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        # only the axon remote-compile service returns from .compile()
        # before the real compile finishes; a local backend would BLOCK
        # here for the whole ladder (and CPU tests would crawl)
        return

    from smolvision_tpu.runtime.batch_segments import _batched_jits
    from smolvision_tpu.runtime.buckets import bucket128

    from smolvision_tpu.parallel.mesh import batched_kv_sharding, mesh_tp

    cfg = engine.cfg
    smesh = getattr(engine, "serving_mesh", None)
    key = (B, max_src_samples // 16000, max_new,
           str(engine.batched_kv_dtype),
           mesh_tp(smesh), bool(getattr(engine, "serving_ep", False)))
    warmed = getattr(engine, "_mstream_prewarmed", None)
    if warmed is None:
        warmed = engine._mstream_prewarmed = set()
    if key in warmed:
        return
    warmed.add(key)
    _, prefill_delta_j, decode_j = _mstream_jits(engine)

    # prompt-length ceiling from the audio length: template+suffix+prefix
    # (~190 tokens) + up to MAX_ENC_WINDOWS' worth of audio tokens
    ews = cfg.enc_n_window_infer * 160   # frames -> samples (8 s default)
    n_win = min(4, max(1, (max_src_samples + ews - 1) // ews))
    wts = cfg.window_token_size()
    est = 190 + (n_win + 1) * wts
    top = bucket128(est)

    H = cfg.dec_hidden
    KH = cfg.dec_kv_heads
    D = cfg.dec_head_dim
    L = cfg.dec_layers
    f32 = jnp.float32
    i32 = jnp.int32
    S = jax.ShapeDtypeStruct
    # under a mesh, lower with the REAL shardings: the axon compile
    # service dedupes by program, and a GSPMD program (mesh-committed
    # params + sharded cache) is a different program from the unsharded
    # lowering — sharding-free avals would prewarm executables the rounds
    # never run.  Single-device: plain avals, as before (uncommitted
    # inputs lower sharding-free).
    if smesh is not None:
        pshape = jax.tree_util.tree_map(
            lambda x: S(x.shape, x.dtype, sharding=x.sharding),
            engine.dec_params)
        kv_shard = batched_kv_sharding(
            smesh, quant=(engine.batched_kv_dtype == jnp.int8))
    else:
        pshape = jax.tree_util.tree_map(
            lambda x: S(x.shape, x.dtype), engine.dec_params)
        kv_shard = None

    from smolvision_tpu.runtime.batch_segments import BATCH_DECODE_CHUNK
    from smolvision_tpu.runtime.buckets import bucket

    dec_w = max(BATCH_DECODE_CHUNK, bucket(max_new, 64))
    lowered = []
    seen = set()
    for pcap in range(128, top + 1, 128):
        kcap = pcap + dec_w
        kv_shape = (L, 2, B, KH, kcap, D)
        if engine.batched_kv_dtype == jnp.int8:
            from smolvision_tpu.ops.quant import QuantKV
            kv_s = QuantKV(
                S(kv_shape, jnp.int8,
                  sharding=kv_shard.q if kv_shard else None),
                S(kv_shape[:-1], f32,
                  sharding=kv_shard.s if kv_shard else None))
        else:
            kv_s = S(kv_shape, engine.batched_kv_dtype, sharding=kv_shard)
        if ("dec", kcap) not in seen:
            seen.add(("dec", kcap))
            lowered.append(decode_j.lower(
                pshape, S((B,), i32), S((), i32), kv_s, S((B,), i32),
                S((B,), i32), S((B,), i32), S((), i32), S((), i32),
                S((B,), jnp.bool_)))
        blks = [64]
        while blks[-1] * 2 < pcap:      # every pow2 width the runtime's
            blks.append(blks[-1] * 2)   # ladder quantization can pick
        for blk in (*blks, pcap):
            if ("pf", blk, kcap) in seen:
                continue
            seen.add(("pf", blk, kcap))
            lowered.append(prefill_delta_j.lower(
                pshape, S((B, blk, H), f32), S((), i32), kv_s,
                S((B,), i32), S((B,), i32), S((B,), i32), S((B,), i32),
                S((), i32)))
        # stratified reset-row prefill (see _strat_jit): one program per
        # (Gcap, pcap, kcap) — discovered mid-run otherwise.  Opt-in only:
        # dead shapes would just lengthen the warmup ladder
        if (os.environ.get("SMOLVISION_MSTREAM_STRAT") == "1"
                and smesh is None   # strat is skipped under mesh DP
                and B >= MSTRAT_MIN_ACTIVE and pcap >= MSTRAT_MIN_S + 64):
            sj = _strat_jit(engine)
            for gc in (1, 2, 4):
                if gc > MSTRAT_MAX_ROWS or ("st", gc, pcap, kcap) in seen:
                    continue
                seen.add(("st", gc, pcap, kcap))
                skv_shape = (L, 2, gc, KH, pcap, D)
                if engine.batched_kv_dtype == jnp.int8:
                    from smolvision_tpu.ops.quant import QuantKV
                    skv_s = QuantKV(S(skv_shape, jnp.int8),
                                    S(skv_shape[:-1], f32))
                else:
                    skv_s = S(skv_shape, engine.batched_kv_dtype)
                lowered.append(sj.lower(
                    pshape, S((B, pcap, H), f32), S((gc,), i32), skv_s,
                    kv_s, S((gc,), i32), S((B,), i32)))
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda lw: lw.compile(), lowered))


def _compact_rows(engine, cache: "_BatchKV", row_of, act_states):
    """Shrink the batch bucket when enough sessions have drained.

    Mixed-duration fleets otherwise keep paying the original B for every
    decode step after short sessions finish.  Surviving sessions' rows are
    copied into a fresh smaller cache (per-row static slices — a plain
    copy) and re-numbered 0..n-1; triggered only when the pow2 bucket
    actually halves, so at most log2(B) compactions per run.
    """
    n = len(act_states)
    if n == 0 or cache.kv is None:
        return
    new_b = max(cache.min_B, 1 << (n - 1).bit_length())
    if new_b >= cache.B:
        return
    import jax
    import jax.numpy as jnp

    keep = []
    for i, st in enumerate(act_states):
        keep.append(row_of[id(st)])
    while len(keep) < new_b:          # pad rows: duplicate row 0 (garbage)
        keep.append(keep[0])

    from smolvision_tpu.ops.quant import kv_rows_gather

    cache.kv = jax.jit(lambda old: kv_rows_gather(old, tuple(keep)))(cache.kv)
    if cache.kv_shard is not None:
        # the gather changed the row-axis extent; re-assert the mesh
        # sharding rather than trusting GSPMD output propagation
        cache.kv = jax.device_put(cache.kv, cache.kv_shard)
    cache.lens = [cache.lens[r] for r in keep]
    cache.valid = [cache.valid[r] for r in keep]
    for i in range(new_b - len(act_states)):
        cache.valid[len(act_states) + i] = False
    cache.B = new_b
    row_of.clear()
    for i, st in enumerate(act_states):
        row_of[id(st)] = i
    if getattr(cache, "prewarm_args", None):
        # the prewarmed programs are keyed on B: without re-issuing the
        # ladder at the new bucket, the first post-compaction round blocks
        # on cold serialized prefill+decode compiles (the exact warmup
        # class _prewarm_batched exists to prevent).  .compile() RPCs
        # return fast on axon; already-compiled shapes dedupe server-side.
        _prewarm_batched(engine, new_b, *cache.prewarm_args)


def _pre_encode_round(engine, states):
    """Batch the round's encoder work across sessions.

    begin_chunk encodes each session's newly-completed 8 s windows and its
    partial tail SERIALLY (~10 ms of device work per call — ~100 ms/round
    for 8 sessions).  For preloaded audio the spans each session will
    encode are deterministic (cursor advance is pure arithmetic), so the
    coordinator predicts them, encodes ALL of them in one batched
    conv+transformer pass (runtime/batch_segments._encode_batch) and hands
    the results to begin_chunk via the span-checked _pre_windows/_pre_tail
    hooks — any prediction miss falls back to the solo encode silently.
    SMOLVISION_MSTREAM_NO_BATCH_ENC=1 disables.
    """
    if os.environ.get("SMOLVISION_MSTREAM_NO_BATCH_ENC", "") == "1":
        return
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime.batch_segments import _encode_batch

    reqs = []   # (state, key, samples)
    for st in states:
        if st.live is not None or not st.use_enc_cache:
            continue
        cursor = min(st.audio_cursor + st.chunk_samples, st.total_samples)
        ews = st.enc_window_samples
        full_end = (cursor // ews) * ews
        ws = st.enc_cache.next_window_start
        pre_w = getattr(st, "_pre_windows", None) or {}
        pre_t = getattr(st, "_pre_tail", None)
        while ws < full_end:
            lo = ws - st.local_base
            if lo < 0 or lo + ews > len(st.local):
                break
            if ws not in pre_w:     # not already pipelined from last round
                reqs.append((st, ("win", ws), st.local[lo : lo + ews]))
            ws += ews
        if full_end < cursor and (pre_t is None
                                  or pre_t[0] != (full_end, cursor)):
            lo = full_end - st.local_base
            if 0 <= lo and cursor - st.local_base <= len(st.local):
                reqs.append((st, ("tail", (full_end, cursor)),
                             st.local[lo : cursor - st.local_base]))
    if len(reqs) < 2:
        return
    from smolvision_tpu.runtime.batch_segments import _use_device_mel

    if _use_device_mel(engine.cfg, len(reqs), engine.param_dtype):
        # device mel (one packed f16 upload + matmul-DFT on the MXU) — the
        # serving front end's path; host numpy log_mel on this single-core
        # host costs ~5-15 ms PER SPAN (~16-20 spans/round at N=16).
        # Shared gate so SMOLVISION_DEVICE_MEL=0 (host-mel bit-exactness
        # escape hatch) applies to pre-encodes like every other batch path.
        from smolvision_tpu.runtime.batch_segments import (
            _encode_batch_device_mel,
        )
        stack, n_toks = _encode_batch_device_mel(
            engine, [s for _, _, s in reqs])
    else:
        mels = [log_mel(s) for _, _, s in reqs]
        stack, n_toks = _encode_batch(engine, mels)
    for i, (st, key, _) in enumerate(reqs):
        if n_toks[i] <= 0:
            continue
        if key[0] == "win":
            if getattr(st, "_pre_windows", None) is None:
                st._pre_windows = {}
            st._pre_windows[key[1]] = (stack[i], n_toks[i])
        else:
            st._pre_tail = (key[1], stack[i], n_toks[i])


class _BatchKV:
    """Round-persistent batched KV cache in the NATURAL layout: each session
    owns a fixed row, and its prompt KV lives at its LOGICAL positions
    [0, lens[r]) — rows never move between rounds (no realign).  The shared
    decode region sits at [pcap, kcap): every round's bounded decode writes
    there batch-uniformly and is overwritten next round.  End-pad garbage in
    [lens[r], pcap) is masked out of attention via prompt_max.  Growing pcap
    is ONE contiguous block copy (positions are absolute), preserving reuse.

    valid[r] = row r's kept rows match its session's last prompt signature
    (cleared when the session runs solo, or skips a round — the shared block
    write clobbers its rows — or has not participated yet).

    min_b > 2 (the mesh "data" axis size under DP coordination) floors the
    batch bucket so the sharded row axis always divides; kv_shard, when set,
    is the NamedSharding re-asserted on every fresh/grown/compacted cache."""

    def __init__(self, n_sessions: int, min_b: int = 2):
        self.min_B = max(2, min_b)
        self.B = max(self.min_B,
                     1 << (max(1, n_sessions) - 1).bit_length())
        self.kv = None
        self.kv_shard = None
        self.pcap = 0
        self.kcap = 0
        self.lens = [0] * self.B
        self.valid = [False] * self.B


def _mstream_jits(engine):
    """Jitted cache-grow + delta-prefill + decode for the batched
    coordinator (natural layout).  Keyed on the mesh's TP degree (a
    TP-interleaved+sharded engine needs the decoder's matching tp-aware
    fused-weight split; tp=1 otherwise) and engine.serving_ep (expert-
    parallel owner-compute MoE dispatch — see runtime/serving.py)."""
    from smolvision_tpu.parallel.mesh import mesh_tp

    tp = mesh_tp(getattr(engine, "serving_mesh", None))
    ep = bool(getattr(engine, "serving_ep", False))
    cached = getattr(engine, "_mstream_jits_cache", None)
    if cached is None:
        cached = engine._mstream_jits_cache = {}
    if (tp, ep) in cached:
        return cached[(tp, ep)]
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.models import qwen3_decoder as dec_mod
    from smolvision_tpu.parallel import batch as pbatch
    from smolvision_tpu.runtime.batch_segments import BATCH_DECODE_CHUNK

    cfg = engine.cfg

    from smolvision_tpu.ops.quant import kv_grow_k

    # positions are absolute in the natural layout: growing the cache is
    # ONE contiguous block copy, reuse preserved
    grow_j = jax.jit(kv_grow_k, static_argnums=(1,), donate_argnums=(0,))
    prefill_delta_j = jax.jit(
        lambda p, e, s, k, rs, km, lr, pm, rg: dec_mod.batched_prefill_delta(
            p, cfg, e, s, k, rs, km, greedy=True, last_rows=lr,
            prompt_max=pm, region_start=rg, tp=tp, ep=ep),
        donate_argnums=(3,))
    decode_j = jax.jit(
        lambda p, t, pos, k, off, km, pm, rg, ns, act: (
            pbatch.batched_decode_chunk(
                p, cfg, t, pos, k, BATCH_DECODE_CHUNK, rope_offset=off,
                kv_min=km, n_steps=ns, prompt_max=pm, region_start=rg,
                row_active=act, tp=tp, ep=ep)),
        donate_argnums=(3,))
    cached[(tp, ep)] = (grow_j, prefill_delta_j, decode_j)
    return cached[(tp, ep)]


# Stratified reset-row prefill (OPT-IN: SMOLVISION_MSTREAM_STRAT=1).
# Design: a freshly-reset row's kept cache is INVALID, so there is
# nothing to gather/preserve for it — the few reset rows take their own
# small-batch FULL prefill into a fresh cache and are admitted back into
# the big cache with unrolled scalar-indexed DUS block copies
# (serving.py's admit pattern — no batch-varying-index scatter), while
# the batch-uniform delta start S follows the non-reset majority.
#
# MEASURED OFF by default (round 3): on the real conditioned-streaming
# workload the per-round reuse distribution is TRIMODAL — e.g. at N=16
# [0,0,9,9,9,9,9,9,9,9,113,217,217,217,217,217] — because any row that
# committed text last round gets a new rollback prefix and its signature
# LCP collapses to the 9-token prompt header (prompt token order is
# fixed by the parity contract, so audio cannot precede the prefix).
# With 5-10 rows at reuse<64 the small batch exceeds MSTRAT_MAX_ROWS,
# and the rare eligible rounds have s_hi=64 (some row is always exactly
# one 104-token window deep), below MSTRAT_MIN_S — the interleaved A/B
# (tools/probe_mstrat.py) fired on 0 of ~180 rounds.  The path stays
# (exact, tested) for unconditioned workloads, where reuse IS
# append-only and resets are the only reuse breaker.
MSTRAT_MIN_S = 128        # stratify only when the majority delta start
#                           is deep enough to be worth a second dispatch
MSTRAT_MAX_ROWS = 4       # reset-row small batch cap (Gcap <= 4)
MSTRAT_MIN_ACTIVE = 4     # below this, one batch is always cheaper
# test hook: rows forced to reuse 0 (narrowing reuse is always exact —
# rows recompute kept tokens into identical values by greedy determinism)
MSTRAT_TEST_FORCE_RESET: frozenset = frozenset()


def _strat_jit(engine):
    """ONE-dispatch stratified prefill: gather the reset rows' embeds,
    full-prefill them into a fresh small cache (positions [0, pcap), no
    decode region), admit each finished row back into the big cache, and
    merge their first tokens.  jax.jit re-specializes per (Gcap, pcap,
    kcap, kv dtype) shape key."""
    cached = getattr(engine, "_strat_jit_cache", None)
    if cached is not None:
        return cached
    import jax
    import jax.numpy as jnp

    from smolvision_tpu.models import qwen3_decoder as dec_mod
    from smolvision_tpu.ops.quant import QuantKV
    from smolvision_tpu.parallel import batch as pbatch

    cfg = engine.cfg

    def strat(p, embeds, rows, small_kv, kv_big, lens, tokens_big):
        Gcap = (small_kv.q if isinstance(small_kv, QuantKV)
                else small_kv).shape[2]
        e_small = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(embeds, rows[g], 1, axis=0)
             for g in range(Gcap)], axis=0)
        zeros = jnp.zeros((Gcap,), jnp.int32)
        first, small_kv = dec_mod.batched_prefill_delta(
            p, cfg, e_small, jnp.int32(0), small_kv, zeros, zeros,
            greedy=True, last_rows=lens - 1, prompt_max=lens,
            region_start=jnp.int32(1 << 30))
        # Gcap scalar-indexed DUS block copies of the K prefix [0, pcap) —
        # kcap_big >= pcap; the decode region is rewritten by the next
        # decode chunk anyway (shared helper parallel/batch.admit_rows)
        kv_big = pbatch.admit_rows(kv_big, small_kv, rows, Gcap)
        # duplicate pad indices write the same value — order irrelevant
        tokens = tokens_big.at[rows].set(first)
        return tokens, kv_big

    fn = jax.jit(strat, donate_argnums=(3, 4))
    engine._strat_jit_cache = fn
    return fn


def quantize_block(S: int, W: int, pcap: int):
    """Quantize a delta-prefill block [S, S+W) to the PREWARMED width
    ladder (pow2 widths + full pcap, _prewarm_batched): an off-ladder
    width — the pcap-S cap (e.g. 320) or a 64-bucket like 448 — is a
    fresh big-prefill program compiling serially mid-round over the
    tunnel.  Rounding W UP and sliding S DOWN recomputes kept rows only
    (identical by determinism — the reuse contract).  Invariants pinned
    by tests/test_multistream.py: S' <= S, S' + W' <= pcap, W' >= W,
    S' stays 64-granular, W' is a pow2 or the full pcap.

    Interleaved A/B (8x45s, 4 pairs, 2026-08-19): medians 11.4 s quant
    vs 17.3 s plain but adjacent pairs split 2-2 under the axon server's
    variance — throughput-neutral on the conditioned workload (its few
    shapes repeat, so plain pays each off-ladder compile once).  Default
    ON for the tail risk it removes: novel shape mixes stall tens of
    seconds per off-ladder compile.  SMOLVISION_MSTREAM_WQUANT=0
    restores exact-width blocks."""
    Wq = 64
    while Wq < W:
        Wq *= 2
    if Wq >= pcap:
        return 0, pcap
    return min(S, pcap - Wq), Wq


def _run_batched_chunks(engine, works, cache: _BatchKV, row_of):
    """One shared-clock round: batch every active session's (delta prefill +
    bounded greedy decode) through the batch-native decoder in the NATURAL
    cache layout, then feed each session's tokens back into its StreamState.

    Layout per row b: prompt KV at logical positions [0, len_b) (kept rows
    NEVER move between rounds), end-pad garbage [len_b, pcap) masked via
    prompt_max, the shared decode region at [pcap, kcap) rewritten each
    round.  Only the tail block [S, S+W) below the shallowest per-row reuse
    point re-prefills (S = min over active rows of reused_b) — rows with
    deeper reuse recompute kept tokens into bit-identical values, so
    exactness vs solo holds by greedy determinism.

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
    no_reuse = os.environ.get("SMOLVISION_MSTREAM_NO_REUSE", "") == "1"
    # SMOLVISION_MSTREAM_DEBUG=1: per-phase stderr marks with device-fetch
    # fences (exact but slows the round; default mode is async)
    dbg = os.environ.get("SMOLVISION_MSTREAM_DEBUG", "") == "1"
    _t = [time.monotonic()]

    def mark(name, sync=None):
        if not dbg:
            return
        import sys as _sys

        import jax as _jax

        if sync is not None:
            _jax.device_get(sync)
        now = time.monotonic()
        print(f"    [mstream] {name}: {(now - _t[0]) * 1000:.1f} ms",
              file=_sys.stderr, flush=True)
        _t[0] = now

    max_new = max(st.max_new for st, _ in works)
    B = cache.B
    max_len = max(len(w.ids) for _, w in works)
    pcap = max(cache.pcap, bucket128(max_len))
    kcap = pcap + max(BATCH_DECODE_CHUNK, bucket(max_new, 64))
    acap = bucket(max(w.enc_seq_len for _, w in works), 16)

    t_pre0 = time.monotonic() * 1000.0

    # ---- per-row reuse --------------------------------------------------
    active = {row_of[id(st)]: (st, w) for st, w in works}
    lens_new = [0] * B
    reused_eff = [0] * B
    for r, (st, w) in active.items():
        n = len(w.ids)
        lens_new[r] = n
        if cache.valid[r] and not no_reuse:
            reused_eff[r] = max(0, min(w.reused, cache.lens[r], n - 1))

    mark("host-setup")

    grow_j, prefill_delta_j, decode_j = _mstream_jits(engine)
    if cache.kv is None or engine.batched_kv_dtype != cache.kv.dtype:
        cache.kv = pbatch.make_batched_kv(cfg, B, kcap,
                                          engine.batched_kv_dtype)
        if cache.kv_shard is not None:
            cache.kv = jax.device_put(cache.kv, cache.kv_shard)
    elif kcap > cache.kcap:
        cache.kv = grow_j(cache.kv, kcap)
        if cache.kv_shard is not None:
            # growth pads the K axis only; re-assert the row sharding
            cache.kv = jax.device_put(cache.kv, cache.kv_shard)
        mark("grow", cache.kv[0, 0, 0, 0, 0, 0])

    # ---- assemble the round's inputs (natural layout: no left pad) -----
    ids_arr = np.zeros((B, pcap), dtype=np.int32)
    astart = np.full((B,), -1_000_000, dtype=np.int32)
    alen = np.zeros((B,), dtype=np.int32)
    prompt_max = np.zeros((B,), dtype=np.int32)
    audio_rows = [None] * B
    a0 = None
    for r, (st, w) in active.items():
        ids_arr[r, : lens_new[r]] = np.asarray(w.ids, dtype=np.int32)
        astart[r] = w.audio_start
        alen[r] = w.enc_seq_len
        prompt_max[r] = lens_new[r]
        blk = w.audio_block
        if blk.shape[0] < acap:
            blk = jnp.pad(blk, ((0, acap - blk.shape[0]), (0, 0)))
        elif blk.shape[0] > acap:
            blk = blk[:acap]
        audio_rows[r] = blk
        if a0 is None:
            a0 = r
    for r in range(B):
        # inactive rows duplicate an active row's inputs (independent rows;
        # outputs discarded; prompt_max 0 masks their rows) — their kept
        # rows are clobbered by the shared block write, so invalidate
        if r not in active:
            ids_arr[r] = ids_arr[a0]
            astart[r] = astart[a0]
            alen[r] = alen[a0]
            audio_rows[r] = audio_rows[a0]
            cache.valid[r] = False
    audio_stack = jnp.stack(audio_rows)
    mark("audio-stack", audio_stack[0, 0, 0])

    # batch-uniform delta block [S, S+W): down to the shallowest reuse
    # point among ACTIVE rows (deeper-reuse rows recompute kept tokens —
    # identical values by determinism).  S is FLOORED to a 64 multiple and
    # W bucketed: the eager embeds slice below bakes its start into the
    # compiled program, so an unbucketed S would trigger a fresh tiny
    # compile (~70-90 ms over the tunnel) nearly every round.
    #
    # STRATIFIED exception (OPT-IN via SMOLVISION_MSTREAM_STRAT=1;
    # constants + measured-dead-by-default rationale above _strat_jit):
    # a few freshly-reset rows
    # (reuse < 64) no longer pin S to 0 for the whole batch — they take a
    # separate small-batch full prefill and S follows the non-reset
    # majority.  Exactness: reset rows get exactly the S=0 computation
    # they would get solo; non-reset rows see a deeper S, which the reuse
    # contract already covers.
    for r in MSTRAT_TEST_FORCE_RESET:
        if r in active:
            reused_eff[r] = 0
    strat_rows: List[int] = []
    S = (min(reused_eff[r] for r in active) // 64) * 64
    # stratification is skipped under mesh DP: its small reset-row cache
    # has Gcap <= 4 rows (not divisible by the data axis) and the path is
    # measured dead on the real workload anyway (docs/MULTISTREAM.md)
    if (os.environ.get("SMOLVISION_MSTREAM_STRAT") == "1"
            and cache.kv_shard is None
            and len(active) >= MSTRAT_MIN_ACTIVE):
        lo = sorted(r for r in active if reused_eff[r] < 64)
        hi = [r for r in active if reused_eff[r] >= 64]
        if lo and hi and len(lo) <= min(MSTRAT_MAX_ROWS, len(active) // 2):
            s_hi = (min(reused_eff[r] for r in hi) // 64) * 64
            if s_hi >= MSTRAT_MIN_S:
                strat_rows, S = lo, s_hi
    W = min(bucket(max_len - S, 64), pcap - S)
    if os.environ.get("SMOLVISION_MSTREAM_WQUANT", "1") != "0":
        S, W = quantize_block(S, W, pcap)

    build, _prefill_full, _decode_lp = _batched_jits(engine)
    rope_start = np.full((B,), S, dtype=np.int32)   # logical == cache pos
    kv_min = np.zeros((B,), dtype=np.int32)
    embeds = build(engine.dec_params, jnp.asarray(ids_arr), audio_stack,
                   jnp.asarray(astart), jnp.asarray(alen))
    embeds_blk = jax.lax.dynamic_slice_in_dim(embeds, S, W, axis=1)
    mark("build+slice", embeds_blk[0, 0, 0])
    last_rows = np.asarray(
        [max(0, lens_new[r] - 1 - S) if r in active else 0 for r in range(B)],
        dtype=np.int32)
    pm_dev = jnp.asarray(prompt_max)
    rg_dev = jnp.int32(pcap)
    first, kv = prefill_delta_j(engine.dec_params, embeds_blk, jnp.int32(S),
                                cache.kv, jnp.asarray(rope_start),
                                jnp.asarray(kv_min), jnp.asarray(last_rows),
                                pm_dev, rg_dev)
    if strat_rows:
        # the big delta block above wrote garbage rows [S, S+W) for the
        # reset rows (their cache below S is invalid); the small full
        # prefill overwrites their entire [0, pcap) prefix and their
        # first token
        G = len(strat_rows)
        Gcap = 1 << (G - 1).bit_length() if G > 1 else 1
        rows_pad = strat_rows + [strat_rows[-1]] * (Gcap - G)
        lens_pad = np.asarray([lens_new[r] for r in rows_pad], np.int32)
        small_kv = pbatch.make_batched_kv(cfg, Gcap, pcap,
                                          engine.batched_kv_dtype)
        first, kv = _strat_jit(engine)(
            engine.dec_params, embeds, jnp.asarray(rows_pad, jnp.int32),
            small_kv, kv, jnp.asarray(lens_pad), first)
        engine._strat_round_count = getattr(
            engine, "_strat_round_count", 0) + 1
    if dbg:
        ru = sorted(reused_eff[r] for r in active)
        print(f"    [mstream] block S={S} W={W} pcap={pcap} "
              f"strat={strat_rows} reuse={ru} "
              f"lens max={max_len}", file=sys.stderr, flush=True)
    mark("prefill", first[0])
    B_real = len(works)
    prefill_ms = (time.monotonic() * 1000.0 - t_pre0) / B_real  # async (dispatch)

    for r, (st, w) in active.items():
        w.reused = reused_eff[r]   # actual reuse for the stats line
        st.note_prefill(w, len(w.ids), prefill_ms)

    t_dec0 = time.monotonic() * 1000.0
    # The first decode chunk is dispatched BEFORE the first token is
    # fetched: its value rides back on the same tunnel round trip (~27 ms
    # saved per round — same trick as Engine.decode_greedy).  If every row's
    # first token is EOS the chunk's device-side early-exit returns count 0.
    first_host = None
    rows = {}
    done = [r not in active for r in range(B)]
    tokens = first
    pos = pcap                                     # shared decode region
    produced = 1
    rope_offset = jnp.asarray(
        [pcap - lens_new[r] if r in active else pcap for r in range(B)],
        dtype=np.int32)                            # rope pos = len_b + step
    kv_min_dev = jnp.asarray(kv_min)
    # pad rows decode promptless garbage that rarely hits EOS: mask them out
    # of the device-side all-rows-EOS early exit (ADVICE r2)
    act_dev = jnp.asarray(
        np.array([r in active for r in range(B)], dtype=np.bool_))
    while produced < max_new:
        steps = min(BATCH_DECODE_CHUNK, max_new - produced)
        buf, count, tokens, kv = decode_j(engine.dec_params, tokens,
                                          jnp.int32(pos), kv, rope_offset,
                                          kv_min_dev, pm_dev, rg_dev,
                                          jnp.int32(steps), act_dev)
        if first_host is None:
            # NOTE: dispatching the NEXT round's pre-encode here (in this
            # decode chunk's shadow, the serving.py upload trick) measured
            # 52 vs 64 s-speech/s at N=16 — the encoder dispatches contend
            # with the in-flight decode round trip on the tunnel.  Pre-
            # encode stays at round start; only its span-dedup remains.
            first_host, buf_host, count = jax.device_get((first, buf, count))
            first_host = np.asarray(first_host)
            rows = {r: [int(first_host[r])] for r in active}
            for r in active:
                done[r] = int(first_host[r]) in EOS_TOKEN_IDS
        else:
            buf_host, count = jax.device_get((buf, count))
        count = int(count)
        if count == 0:
            break
        for r in active:
            if done[r]:
                continue
            for t in buf_host[r][:count]:
                t = int(t)
                rows[r].append(t)
                if t in EOS_TOKEN_IDS:
                    done[r] = True
                    break
        pos += count
        produced += count
        if all(done):
            break
    if first_host is None:   # max_new == 1 or immediate exit: plain fetch
        first_host = np.asarray(jax.device_get(first))
        rows = {r: [int(first_host[r])] for r in active}
    mark("decode")
    decode_ms = (time.monotonic() * 1000.0 - t_dec0) / B_real

    # ---- persist the round's cache state -------------------------------
    cache.kv = kv
    cache.pcap = pcap
    cache.kcap = kcap
    for r, (st, w) in active.items():
        cache.lens[r] = lens_new[r]
        cache.valid[r] = True

    # replay decode_greedy's consumption semantics per session
    for r, (st, w) in active.items():
        chunk_tokens = []
        n = 0
        for t in rows[r]:
            if n >= st.max_new:
                break
            n += 1
            if t in EOS_TOKEN_IDS:
                break
            chunk_tokens.append(t)
        st.finish_chunk(w, chunk_tokens, n, decode_ms)
    mark("feedback")
