"""Batched segment transcription: decode B segments together.

The reference processes -S segments strictly sequentially (qwen_asr.c:987).
On TPU that wastes the dominant cost of greedy decoding — streaming ~1.2 GB
of weights from HBM per step — which is identical for batch 1 and batch 8.
Batching all segments through a vmapped prefill + decode multiplies
long-audio throughput by nearly the segment count on one chip, and shards
across chips over the "data" mesh axis unchanged (parallel/batch.py).

Constraints: past-text conditioning is inherently sequential, so this path
runs only with conditioning off (the reference's own -S default); tokens are
emitted per segment once decoding finishes rather than streamed.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import EOS_TOKEN_IDS, NUM_MEL_BINS, TOKEN_ASR_TEXT
from smolvision_tpu.ops.mel import log_mel
from smolvision_tpu.parallel import batch as pbatch
from smolvision_tpu.runtime import prompt as prompt_mod
from smolvision_tpu.runtime.buckets import bucket, bucket64, bucket128

BATCH_DECODE_CHUNK = 64


def _batched_jits(engine, tp: int = 1, ep: bool = False):
    """Jitted batched entry points, built once per engine and (tp, ep) key
    (a fresh jax.jit wrapper per call would re-trace every invocation).

    tp > 1: the engine's decoder weights were interleaved per TP rank
    (parallel/mesh.interleave_decoder_for_tp) and sharded on a mesh "model"
    axis — the decoder's tp-aware fused-weight split must match.  ep=True:
    expert-parallel owner-compute MoE dispatch (see runtime/serving.py)."""
    cached = getattr(engine, "_batch_seg_jits", None)
    if cached is None:
        cached = engine._batch_seg_jits = {}
    if (tp, ep) in cached:
        return cached[(tp, ep)]
    from smolvision_tpu.models import qwen3_decoder as dec_mod

    cfg = engine.cfg
    build = (cached[(1, False)][0] if (1, False) in cached else
             jax.jit(jax.vmap(dec_mod.build_embeds,
                              in_axes=(None, 0, 0, 0, 0))))
    prefill = jax.jit(
        lambda p, e, k, rs, km: pbatch.batched_prefill(
            p, cfg, e, k, rope_start=rs, kv_min=km, greedy=True, tp=tp,
            ep=ep),
        donate_argnums=(2,))
    decode = jax.jit(
        lambda p, t, pos, k, off, km, ns: pbatch.batched_decode_chunk(
            p, cfg, t, pos, k, BATCH_DECODE_CHUNK, rope_offset=off, kv_min=km,
            n_steps=ns, tp=tp, ep=ep),
        donate_argnums=(3,))
    cached[(tp, ep)] = (build, prefill, decode)
    return cached[(tp, ep)]


def _prompt_cap(n: int) -> int:
    """Prompt-cap granularity: 64 by default (jfk 186 -> 192 instead of 256;
    prefill FLOPs and decode KV rows scale with it).  SMOLVISION_CAP128=1
    restores the round-2 128-granular caps for A/B (probe_serving capalt)."""
    import os as _o

    if _o.environ.get("SMOLVISION_CAP128", "") == "1":
        return bucket128(n)
    return bucket64(n)


def _conv_bucket(n: int) -> int:
    """Conv-stem block-count bucket: pow2 below 64 (small offline cases pay
    nothing), 64-granular above (a pow2 jump 384->512 at serving B=32 is
    33% wasted conv FLOPs — every block costs ~4.4 GFLOP)."""
    return bucket(n, 4) if n < 64 else -(-n // 64) * 64



def _conv_partial_tails(engine, rems, tails_of):
    """Shared partial-tail stage: group tail chunks by width, run each width
    group through the width-specialized conv stem ONCE, and return the
    (partial_rows, partial_blocks) bookkeeping `_pool_and_encode` consumes.
    `tails_of(width, idxs)` supplies that group's [n, 128, width] mel array
    (host-stacked tails or device-sliced ones) — the ONLY difference between
    the host-mel and device-mel encode paths."""
    partial_rows = {}           # b -> (block_idx, row_start, n_rows)
    partial_blocks = []         # flat [rows, d] device blocks
    by_width = {}
    for b, rem in enumerate(rems):
        if rem:
            by_width.setdefault(rem, []).append(b)
    for w, idxs in by_width.items():
        out = engine._conv_stem(engine.enc_params, tails_of(w, idxs))
        n, rows_w, d_ = out.shape
        blk = len(partial_blocks)
        partial_blocks.append(out.reshape(n * rows_w, d_))
        for j, b in enumerate(idxs):
            partial_rows[b] = (blk, j * rows_w, rows_w)
    return partial_rows, partial_blocks


def _encode_batch(engine, mels: Sequence[np.ndarray]):
    """Encode B mel spectrograms with batched conv + vmapped transformer.

    The conv stem treats every clip's full 100-frame chunks as one batch
    (chunks are independent by construction); partial tail chunks group by
    width.  The windowed transformer is vmapped over clips at a common token
    bucket.  Returns (audio_stack [B, cap, H], n_tokens list).
    """
    import jax

    cfg = engine.cfg
    if cfg.family == "q25" or len(mels) == 1:
        per_clip = [engine.encode_mel(m) for m in mels]
        cap = max(a.shape[0] for a, _ in per_clip)
        stack = jnp.stack([
            a if a.shape[0] == cap else jnp.pad(a, ((0, cap - a.shape[0]), (0, 0)))
            for a, _ in per_clip])
        return stack, [n for _, n in per_clip]

    chunk = cfg.enc_chunk_size
    tpc = cfg.tokens_per_chunk
    wts = cfg.window_token_size()
    B = len(mels)

    # mels arrive as (n_frames, full_np [n,128,chunk] | None, part_np
    # [128,rem] | None) from the threaded mel stage, or as raw [128, F]
    # arrays from the fallback path
    full_counts = []
    rems = []
    np_fulls = []
    np_parts = []
    for m in mels:
        if isinstance(m, tuple):
            frames, np_full, np_part = m
        else:
            frames = m.shape[1]
            n_full = frames // chunk
            np_full = (np.ascontiguousarray(
                m[:, : n_full * chunk].reshape(m.shape[0], n_full, chunk)
                .transpose(1, 0, 2)).astype(np.float32)
                if n_full else None)
            np_part = (np.ascontiguousarray(
                m[:, n_full * chunk :]).astype(np.float32)
                if frames % chunk else None)
        full_counts.append(frames // chunk)
        rems.append(frames % chunk)
        np_fulls.append(np_full)
        np_parts.append(np_part)

    # all full chunks across clips -> ONE host assembly + ONE upload (the
    # tunnel charges ~8.5 ms per transfer call on top of throughput, so
    # per-clip uploads cost more in fixed overhead than the bytes)
    full_tok = None
    n_full_sum = sum(full_counts)
    if n_full_sum:
        ncap = _conv_bucket(n_full_sum)
        dt = next(f for f in np_fulls if f is not None).dtype
        arr = np.zeros((ncap, NUM_MEL_BINS, chunk), dtype=dt)
        off = 0
        for f in np_fulls:
            if f is not None:
                arr[off : off + len(f)] = f
                off += len(f)
        full_tok = engine._conv_stem(engine.enc_params, jnp.asarray(arr))

    # partial tails grouped by width (each width is its own jit bucket);
    # each group's output stays ONE device block — per-clip rows are
    # addressed by pool offset, never sliced out (a per-clip slice is a
    # dispatch, and dispatches over a remote tunnel are milliseconds)
    partial_rows, partial_blocks = _conv_partial_tails(
        engine, rems,
        lambda w, idxs: jnp.asarray(np.stack([np_parts[b] for b in idxs])))

    full_starts = []
    off = 0
    for b in range(B):
        full_starts.append(off)
        off += full_counts[b]
    return _pool_and_encode(engine, B, full_tok, off, full_starts,
                            full_counts, partial_rows, partial_blocks)


def _pool_and_encode(engine, B, full_tok, n_pool_blocks, full_starts,
                     full_counts, partial_rows, partial_blocks):
    """Shared tail: flatten conv outputs into one row pool, build the
    [B, tcap] gather index host-side, and run gather + windowed transformer
    as ONE jit.  full_tok [N, tpc, d] (blocks >= n_pool_blocks are padding);
    clip b's full chunks are blocks full_starts[b]..+full_counts[b]-1."""
    import jax

    cfg = engine.cfg
    tpc = cfg.tokens_per_chunk
    wts = cfg.window_token_size()
    n_tokens = [full_counts[b] * tpc
                + (partial_rows[b][2] if b in partial_rows else 0)
                for b in range(B)]
    from smolvision_tpu.runtime.buckets import window_bucket

    tcap = max(window_bucket(n, wts) for n in n_tokens)
    d = cfg.enc_d_model

    pool_parts = []
    if n_pool_blocks:
        pool_parts.append(full_tok[:n_pool_blocks].reshape(-1, d))
    block_base = []
    off = n_pool_blocks * tpc
    for blk in partial_blocks:
        block_base.append(off)
        off += blk.shape[0]
        pool_parts.append(blk)
    R = off  # total pool rows; rows >= R are the zero pad
    idx = np.full((B, tcap), R, dtype=np.int32)
    for b in range(B):
        n_f = full_counts[b] * tpc
        if n_f:
            idx[b, :n_f] = full_starts[b] * tpc + np.arange(n_f)
        if b in partial_rows:
            blk, row_start, nr = partial_rows[b]
            idx[b, n_f : n_f + nr] = block_base[blk] + row_start + np.arange(nr)

    rcap = bucket(R + 1, 64)
    pool = jnp.concatenate(
        pool_parts + [jnp.zeros((rcap - R, d), pool_parts[0].dtype)], axis=0)

    enc_jit = getattr(engine, "_batched_enc_jit", None)
    if enc_jit is None:
        from smolvision_tpu.models.qwen3_encoder import encoder_transformer

        def gather_encode(p, pool, idx, vlens):
            x_stack = pool[idx]                   # [B, tcap, d]
            # encoder SP under a dp mesh (parallel/mesh.shard_engine):
            # shard the clip axis over "data" so the group encode
            # partitions instead of running replicated per device; the
            # pool gather stays local (pool is replicated).  flash=False:
            # GSPMD cannot partition a pallas_call.  shard_engine clears
            # this cached jit, so the flag is fixed at (re)trace time.
            m = getattr(engine, "_enc_sp_mesh", None)
            if m is not None:
                from smolvision_tpu.parallel.mesh import batch_sharding

                x_stack = jax.lax.with_sharding_constraint(
                    x_stack, batch_sharding(m, 3))
                return jax.vmap(lambda x, v: encoder_transformer(
                    p, x, v, cfg, wts, flash=False))(x_stack, vlens)
            return jax.vmap(
                lambda x, v: encoder_transformer(p, x, v, cfg, wts))(x_stack, vlens)

        enc_jit = jax.jit(gather_encode)
        engine._batched_enc_jit = enc_jit
    out = enc_jit(engine.enc_params, pool, jnp.asarray(idx),
                  jnp.asarray(n_tokens, dtype=jnp.int32))
    return out, n_tokens


def _use_device_mel(cfg, B: int, param_dtype=None) -> bool:
    """Shared gate for the device-mel serving front end: TPU default for
    qwen3-family batches >2; SMOLVISION_DEVICE_MEL=0 forces host mel
    (bit-exact vs the sequential engine), =1 forces device mel anywhere
    (CPU tests).  An f32 engine (--f32, the C-parity arithmetic family)
    defaults to the host-mel path — the device front end's f16 audio upload
    is outside that family — but the explicit =1 force still wins (the CPU
    equivalence tests run f32 engines)."""
    import os

    dm_env = os.environ.get("SMOLVISION_DEVICE_MEL", "")
    if dm_env == "0" or cfg.family == "q25" or B <= 2:
        return False
    if dm_env == "1":
        return True
    return (param_dtype != jnp.float32
            and jax.default_backend() == "tpu")


def _upload_audio(engine, segments: Sequence[np.ndarray]):
    """Host prep + the ONE tunnel transfer of a serving encode group: reflect-
    pad, f16-pack and upload the padded audio stack.  Split out of
    `_encode_batch_device_mel` so the continuous scheduler
    (runtime/serving.py) can issue the ~285 ms/32-clip upload in a dispatch
    shadow DECOUPLED from the (cheap, async) mel/conv/window dispatches —
    the upload is the serving path's single largest term over the tunnel
    (docs/SERVING_ROOFLINE.md).  Returns (buf_dev [B, pcap] f16,
    frames_list, fcap)."""
    from smolvision_tpu.ops.mel import HOP_LENGTH, N_FFT, num_frames, reflect_pad

    cfg = engine.cfg
    chunk = cfg.enc_chunk_size
    B = len(segments)
    frames_list = [num_frames(len(s)) for s in segments]
    # frame cap: multiple of the conv chunk (the block reshape needs it),
    # 2-chunk granular (one compile per 2 s of max clip length)
    fcap = -(-max(frames_list) // (2 * chunk)) * (2 * chunk)
    pcap = fcap * HOP_LENGTH + N_FFT
    buf = np.zeros((B, pcap), np.float16)
    for b, s in enumerate(segments):
        p = reflect_pad(np.asarray(s, dtype=np.float32))
        # len(p) = n + N_FFT can exceed pcap (e.g. frames % (2*chunk) == 0
        # with n % HOP != 0); every mel frame reads < pcap samples
        # ((frames-1)*HOP + N_FFT <= pcap - HOP), so the excess tail is
        # unused — truncate instead of overflowing the row
        m = min(len(p), pcap)
        buf[b, :m] = p[:m].astype(np.float16)
    return jnp.asarray(buf), frames_list, fcap


def _encode_batch_device_mel(engine, segments: Sequence[np.ndarray],
                             uploaded=None):
    """Serving encode with the mel on DEVICE: upload float16 reflect-padded
    audio (one transfer, ~3x fewer bytes than f32 mel), matmul-DFT log-mel
    on the MXU (ops/mel.py log_mel_batch_jax), conv over ALL Fcap//chunk
    blocks per clip (garbage tail blocks are computed but never selected by
    the pool gather — conv cost is trivial next to the saved host work),
    width-grouped TRUE-width partial tails sliced on device.

    f16 audio (~5e-4 relative) and the f32 DFT are both inside the C
    reference's own f32 naive-DFT rounding; the host-mel path remains the
    default off-TPU so CPU tests stay bit-exact vs the sequential path.

    `uploaded` (from `_upload_audio`) skips the upload stage when the
    scheduler already shipped the audio in an earlier dispatch shadow.
    """
    from smolvision_tpu.ops.mel import log_mel_batch_jax

    cfg = engine.cfg
    chunk = cfg.enc_chunk_size
    B = len(segments)
    buf_dev, frames_list, fcap = (uploaded if uploaded is not None
                                  else _upload_audio(engine, segments))

    jits = getattr(engine, "_device_mel_jits", None)
    if jits is None:
        jits = engine._device_mel_jits = {}
    if "mel" not in jits:
        import functools as _ft

        jits["mel"] = jax.jit(log_mel_batch_jax, static_argnums=(2,))

        def to_blocks(mel_t, ncap):
            Bq, M, F = mel_t.shape
            nc = F // chunk
            blocks = (mel_t.reshape(Bq, M, nc, chunk)
                      .transpose(0, 2, 1, 3).reshape(Bq * nc, M, chunk))
            if ncap > Bq * nc:
                blocks = jnp.pad(blocks, ((0, ncap - Bq * nc), (0, 0), (0, 0)))
            return blocks

        jits["blocks"] = jax.jit(to_blocks, static_argnums=(1,))

        def slice_tails(mel_t, rows, starts, w):
            def one(b, s):
                return jax.lax.dynamic_slice(
                    mel_t[b], (0, s), (mel_t.shape[1], w))

            return jax.vmap(one)(rows, starts)

        jits["tails"] = jax.jit(slice_tails, static_argnums=(3,))

    mel_t = jits["mel"](buf_dev,
                        jnp.asarray(frames_list, jnp.int32), fcap)
    nc = fcap // chunk
    ncap = _conv_bucket(B * nc)
    blocks = jits["blocks"](mel_t, ncap)
    full_tok = engine._conv_stem(engine.enc_params, blocks)

    full_counts = [f // chunk for f in frames_list]
    rems = [f % chunk for f in frames_list]

    def tails_of(w, idxs):
        rows = jnp.asarray(idxs, jnp.int32)
        starts = jnp.asarray([full_counts[b] * chunk for b in idxs], jnp.int32)
        return jits["tails"](mel_t, rows, starts, w)

    partial_rows, partial_blocks = _conv_partial_tails(engine, rems, tails_of)

    full_starts = [b * nc for b in range(B)]
    return _pool_and_encode(engine, B, full_tok, B * nc, full_starts,
                            full_counts, partial_rows, partial_blocks)


def _estimate_prompt_len(cfg, n_samples: int, overhead: int) -> int:
    """Predict a segment's prompt length from its sample count (exact enough
    for bucketing: mel frames -> conv token count -> + prompt overhead)."""
    from smolvision_tpu.config import HOP_LENGTH, conv_out_width

    frames = max(n_samples // HOP_LENGTH, 1)
    chunk = cfg.enc_chunk_size
    n_full = frames // chunk
    rem = frames % chunk
    tokens = n_full * cfg.tokens_per_chunk
    if rem:
        tokens += conv_out_width(conv_out_width(conv_out_width(rem)))
    return tokens + overhead


def _length_groups(engine, segments: Sequence[np.ndarray]) -> List[List[int]]:
    """Partition segment indices into length-sorted sub-batches.

    Mixed-duration batches pay B x (tcap_max - tcap_i) wasted prefill rows
    per short segment; splitting pays one extra dispatch + possible compile
    per group.  DP over length-sorted segments minimizes
        sum_g (B_g * tcap_g + OVERHEAD)
    with OVERHEAD (token-rows, SMOLVISION_SUBBATCH_OVERHEAD, default 8192)
    standing in for the fixed per-group cost.  One group in == unchanged
    behavior; rows are independent, so any grouping is token-exact.
    """
    import os

    cfg = engine.cfg
    ids, _ = prompt_mod.build_asr_prompt(
        cfg, 16, engine._prompt_tokens, engine._force_tokens, None)
    overhead_tok = len(ids) - 16

    n = len(segments)
    est = [(_prompt_cap(_estimate_prompt_len(cfg, len(s), overhead_tok)), i)
           for i, s in enumerate(segments)]
    est.sort()
    caps = [c for c, _ in est]
    if caps[0] == caps[-1]:
        return [list(range(n))]

    OVERHEAD = int(os.environ.get("SMOLVISION_SUBBATCH_OVERHEAD", "8192"))
    # dp[i]: min cost of grouping the first i sorted segments
    dp = [0.0] + [float("inf")] * n
    cut = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(i):
            c = dp[j] + (i - j) * caps[i - 1] + OVERHEAD
            if c < dp[i]:
                dp[i] = c
                cut[i] = j
    groups = []
    i = n
    while i > 0:
        j = cut[i]
        groups.append([est[k][1] for k in range(j, i)])
        i = j
    groups.reverse()
    return groups


def transcribe_segments_batched(engine, segments: Sequence[np.ndarray],
                                mesh=None) -> List[str]:
    """Transcribe independent audio segments batched, in length-sorted
    sub-batches when durations are mixed (short clips don't pay long clips'
    prompt padding).  Returns texts in input order.  Uses engine.max_tokens
    as the per-segment decode cap.

    mesh defaults to engine.serving_mesh (the DP knob runtime/serving.py and
    runtime/multistream.py honor): an engine whose params were sharded onto
    a mesh must also shard the batched KV, or the jits would mix
    mesh-committed and single-device-committed inputs."""
    if mesh is None:
        mesh = getattr(engine, "serving_mesh", None)
    groups = _length_groups(engine, segments)
    if len(groups) == 1:
        return _transcribe_segment_group(engine, segments, mesh)
    texts: List[Optional[str]] = [None] * len(segments)
    for idxs in groups:
        out = _transcribe_segment_group(engine, [segments[i] for i in idxs], mesh)
        for i, t in zip(idxs, out):
            texts[i] = t
    return texts  # type: ignore[return-value]


def _transcribe_segment_group(engine, segments: Sequence[np.ndarray],
                              mesh=None) -> List[str]:
    """One batched transcription of segments sharing a prompt bucket."""
    import os
    import sys
    import time as _time

    cfg = engine.cfg
    engine.prepare_prompt()
    tok = engine.tokenizer
    n_real = len(segments)
    if mesh is not None:
        # the batched KV's row axis shards over "data": pad the group to a
        # multiple of the axis size (rows are independent; pad rows
        # duplicate the last clip and their texts are dropped below)
        from smolvision_tpu.parallel.mesh import mesh_dp

        pad_rows = (-n_real) % mesh_dp(mesh)
        if pad_rows:
            segments = list(segments) + [segments[-1]] * pad_rows
    B = len(segments)

    # SMOLVISION_BATCH_DEBUG=1: sync + print per-stage wall times (each sync
    # costs a tunnel round trip, so this is debug-only attribution)
    debug = os.environ.get("SMOLVISION_BATCH_DEBUG", "") == "1"
    _last = [_time.monotonic()]

    def mark(stage, sync=None):
        if not debug:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        now = _time.monotonic()
        print(f"  batch[{stage}]: {(now - _last[0]) * 1000:.0f} ms",
              file=sys.stderr, flush=True)
        _last[0] = now

    # --- encode all segments as one batch ------------------------------
    # mel on host threads (np.fft releases the GIL; keeps the exact f64-FFT
    # numerics of the sequential path), and each worker STARTS the async
    # upload of its clip's conv-chunk blocks as soon as the mel is done —
    # the host->device transfer (~0.6 MB/clip, throughput-limited over a
    # remote tunnel) overlaps the remaining mel work instead of blocking
    # in one big post-hoc upload.
    enc_t0 = _time.monotonic()
    chunk = cfg.enc_chunk_size

    # f16 transfer halves the mel upload bytes (the tunnel is throughput-
    # limited at ~45 MB/s); quantization is ~2.5e-4 in normalized-mel units —
    # far below the C reference's own naive-DFT rounding.  CPU (tests) keeps
    # f32 so batched==sequential stays bit-exact; SMOLVISION_MEL_F32=1
    # forces f32 on TPU too.
    xfer_dt = (np.float16 if jax.default_backend() == "tpu"
               and os.environ.get("SMOLVISION_MEL_F32", "") != "1"
               and engine.param_dtype != jnp.float32   # --f32: stay in family
               else np.float32)

    def mel_chunks(seg):
        """Worker: mel + host-side chunk layout (no jax calls — multithreaded
        jax dispatch serializes on an internal lock)."""
        m = log_mel(seg)
        frames = m.shape[1]
        n_full = frames // chunk
        full = (np.ascontiguousarray(
            m[:, : n_full * chunk].reshape(m.shape[0], n_full, chunk)
            .transpose(1, 0, 2)).astype(xfer_dt) if n_full else None)
        part = (np.ascontiguousarray(m[:, n_full * chunk :]).astype(xfer_dt)
                if frames % chunk else None)
        return frames, full, part

    use_device_mel = _use_device_mel(cfg, B, engine.param_dtype)
    if use_device_mel:
        if engine.verbose >= 1 and not getattr(engine, "_device_mel_noted", False):
            engine._device_mel_noted = True
            print("Batch mel: device f16 matmul-DFT path (tokens may differ "
                  "~1ulp from the single-file host mel; SMOLVISION_DEVICE_MEL=0 "
                  "/ SMOLVISION_MEL_F32=1 force exact parity)",
                  file=sys.stderr, flush=True)
        mark("mel")  # host work is pad+quantize inside the encode call
        enc_stack, n_tokens_list = _encode_batch_device_mel(engine, segments)
    else:
        if B > 2 and cfg.family != "q25":
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, B)) as pool:
                mels = list(pool.map(mel_chunks, segments))
        else:
            mels = [log_mel(seg) for seg in segments]
        mark("mel")
        enc_stack, n_tokens_list = _encode_batch(engine, mels)
    mark("enc dispatch")
    id_rows = []
    starts = []
    for n_audio in n_tokens_list:
        ids, audio_start = prompt_mod.build_asr_prompt(
            cfg, n_audio, engine._prompt_tokens, engine._force_tokens, None)
        id_rows.append(ids)
        starts.append(audio_start)

    # LEFT-padded layout: every row's last prompt token sits at cache row
    # tcap-1 and decode positions are batch-uniform (a batch-varying cache
    # write position lowers to a catastrophic scatter on TPU).  Cache index =
    # logical position + pad; rope_start = -pad; kv_min = pad masks the pad
    # rows' garbage K/V.
    tcap = _prompt_cap(max(len(i) for i in id_rows))
    acap = bucket(max(n_tokens_list), 16)
    H = cfg.dec_hidden

    pads = [tcap - len(ids) for ids in id_rows]
    ids_arr = np.zeros((B, tcap), dtype=np.int32)
    for b, ids in enumerate(id_rows):
        ids_arr[b, pads[b] :] = ids
    # enc_stack is already [B, enc_cap, H]; one slice/pad to the prompt's
    # audio bucket (no per-clip device loop)
    enc_cap = enc_stack.shape[1]
    if acap <= enc_cap:
        audio_stack = enc_stack[:, :acap]
    else:
        audio_stack = jnp.pad(enc_stack, ((0, 0), (0, acap - enc_cap), (0, 0)))
    astart = jnp.asarray([starts[b] + pads[b] for b in range(B)], dtype=jnp.int32)
    alen = jnp.asarray(n_tokens_list, dtype=jnp.int32)
    rope_start = jnp.asarray([-p for p in pads], dtype=jnp.int32)
    kv_min = jnp.asarray(pads, dtype=jnp.int32)

    # decode reads B x kcap KV rows per step, so every spare 128-row bucket
    # costs real bandwidth: size to the actual decode horizon and let the
    # in-loop regrow handle max_tokens overruns
    kcap = bucket64(tcap + min(engine.max_tokens, 2 * BATCH_DECODE_CHUNK) + 1)
    kv = pbatch.make_batched_kv(cfg, B, kcap, engine.batched_kv_dtype)

    if mesh is not None:
        from smolvision_tpu.parallel import mesh as mesh_mod

        from smolvision_tpu.ops.quant import QuantKV
        kv = jax.device_put(kv, mesh_mod.batched_kv_sharding(
            mesh, quant=isinstance(kv, QuantKV)))
        audio_stack = jax.device_put(audio_stack, mesh_mod.batch_sharding(mesh, 3))

    mark("layout", sync=audio_stack)
    engine.perf.encode_ms += (_time.monotonic() - enc_t0) * 1000.0
    dec_t0 = _time.monotonic()

    from smolvision_tpu.parallel.mesh import mesh_tp

    build, prefill, decode = _batched_jits(
        engine, tp=mesh_tp(mesh),
        ep=bool(getattr(engine, "serving_ep", False)))
    embeds = build(engine.dec_params, jnp.asarray(ids_arr), audio_stack,
                   astart, alen)
    mark("build embeds", sync=embeds)
    first, kv = prefill(engine.dec_params, embeds, kv, rope_start, kv_min)
    mark("prefill", sync=first)

    rows: List[List[int]] = [[] for _ in range(B)]
    done = [False] * B
    first_host = np.asarray(jax.device_get(first))
    for b in range(B):
        rows[b].append(int(first_host[b]))
        if int(first_host[b]) in EOS_TOKEN_IDS:
            done[b] = True

    tokens = first
    pos = tcap  # uniform cache row for all batch rows
    rope_offset = jnp.asarray(pads, dtype=jnp.int32)
    produced = 1
    while produced < engine.max_tokens and not all(done):
        steps = min(BATCH_DECODE_CHUNK, engine.max_tokens - produced)
        if pos + BATCH_DECODE_CHUNK + 1 > kcap:
            kcap = bucket64(pos + BATCH_DECODE_CHUNK + 64)
            from smolvision_tpu.ops.quant import kv_grow_k
            kv = jax.jit(kv_grow_k, static_argnums=(1,),
                         donate_argnums=(0,))(kv, kcap)
        buf, count, tokens, kv = decode(engine.dec_params, tokens,
                                        jnp.int32(pos), kv, rope_offset,
                                        kv_min, jnp.int32(steps))
        buf_host, count = jax.device_get((buf, count))  # [B, CHUNK], scalar
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

    mark("decode loop")
    engine.perf.decode_ms += (_time.monotonic() - dec_t0) * 1000.0

    # --- gate <asr_text> + detokenize per segment ----------------------
    texts = []
    forced_or_past = bool(engine._force_tokens)
    for b in range(n_real):        # mesh pad rows: no text, no perf counts
        past_asr = forced_or_past
        pieces = []
        n_text = 0
        for t in rows[b]:
            if t in EOS_TOKEN_IDS:
                break
            if t == TOKEN_ASR_TEXT:
                past_asr = True
            elif past_asr:
                pieces.append(tok.decode_piece(t))
                n_text += 1
        engine.perf.text_tokens += n_text
        texts.append(b"".join(pieces).decode("utf-8", errors="replace").strip())
    return texts
