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

from smolvision_tpu.config import EOS_TOKEN_IDS, TOKEN_ASR_TEXT
from smolvision_tpu.ops.mel import log_mel
from smolvision_tpu.parallel import batch as pbatch
from smolvision_tpu.runtime import prompt as prompt_mod
from smolvision_tpu.runtime.buckets import bucket, bucket128

BATCH_DECODE_CHUNK = 64


def _batched_jits(engine):
    """Jitted batched entry points, built once per engine (a fresh jax.jit
    wrapper per call would re-trace every invocation)."""
    cached = getattr(engine, "_batch_seg_jits", None)
    if cached is not None:
        return cached
    from smolvision_tpu.models import qwen3_decoder as dec_mod

    cfg = engine.cfg
    build = jax.jit(jax.vmap(dec_mod.build_embeds, in_axes=(None, 0, 0, 0, 0)))
    prefill = jax.jit(
        lambda p, e, s, v, k, rs, km: pbatch.batched_prefill(
            p, cfg, e, s, v, k, greedy=True, rope_start=rs, kv_min=km),
        donate_argnums=(4,))
    decode = jax.jit(
        lambda p, t, pos, k, off, km: pbatch.batched_decode_chunk(
            p, cfg, t, pos, k, BATCH_DECODE_CHUNK, rope_offset=off, kv_min=km),
        donate_argnums=(3,))
    engine._batch_seg_jits = (build, prefill, decode)
    return engine._batch_seg_jits


def _encode_batch(engine, mels: Sequence[np.ndarray]):
    """Encode B mel spectrograms with batched conv + vmapped transformer.

    The conv stem treats every clip's full 100-frame chunks as one batch
    (chunks are independent by construction); partial tail chunks group by
    width.  The windowed transformer is vmapped over clips at a common token
    bucket.  Returns [(audio [Tcap, H], n_tokens)] like engine.encode_mel.
    """
    import jax

    cfg = engine.cfg
    if cfg.family == "q25" or len(mels) == 1:
        return [engine.encode_mel(m) for m in mels]

    chunk = cfg.enc_chunk_size
    tpc = cfg.tokens_per_chunk
    wts = cfg.window_token_size()
    B = len(mels)

    # gather all full chunks across clips into one conv batch
    full_counts = [m.shape[1] // chunk for m in mels]
    rems = [m.shape[1] % chunk for m in mels]
    all_full = []
    for m, n_full in zip(mels, full_counts):
        for c in range(n_full):
            all_full.append(m[:, c * chunk : (c + 1) * chunk])
    full_tok = None
    if all_full:
        arr = np.stack(all_full).astype(np.float32)
        ncap = bucket(len(arr), 4)
        if ncap > len(arr):
            arr = np.concatenate([arr, np.zeros((ncap - len(arr), *arr.shape[1:]), np.float32)])
        full_tok = engine._conv_stem(engine.enc_params, jnp.asarray(arr))

    # partial tails grouped by width (each width is its own jit bucket)
    partial_tok = {}
    by_width = {}
    for b, (m, n_full, rem) in enumerate(zip(mels, full_counts, rems)):
        if rem:
            by_width.setdefault(rem, []).append((b, m[:, n_full * chunk :]))
    for w, items in by_width.items():
        arr = np.stack([p for _, p in items]).astype(np.float32)
        out = engine._conv_stem(engine.enc_params, jnp.asarray(arr))
        for (b, _), row in zip(items, out):
            partial_tok[b] = row

    # assemble per-clip token sequences at a common bucket
    n_tokens = [full_counts[b] * tpc + (partial_tok[b].shape[0] if b in partial_tok else 0)
                for b in range(B)]
    from smolvision_tpu.runtime.buckets import window_bucket

    tcap = max(window_bucket(n, wts) for n in n_tokens)
    d = cfg.enc_d_model
    xs = []
    off = 0
    for b in range(B):
        parts = []
        if full_counts[b]:
            parts.append(full_tok[off : off + full_counts[b]].reshape(-1, d))
            off += full_counts[b]
        if b in partial_tok:
            parts.append(partial_tok[b])
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        if x.shape[0] < tcap:
            x = jnp.pad(x, ((0, tcap - x.shape[0]), (0, 0)))
        xs.append(x)
    x_stack = jnp.stack(xs)

    enc_jit = getattr(engine, "_batched_enc_jit", None)
    if enc_jit is None:
        from smolvision_tpu.models.qwen3_encoder import encoder_transformer

        enc_jit = jax.jit(jax.vmap(
            lambda p, x, v: encoder_transformer(p, x, v, cfg, wts),
            in_axes=(None, 0, 0)))
        engine._batched_enc_jit = enc_jit
    out = enc_jit(engine.enc_params, x_stack,
                  jnp.asarray(n_tokens, dtype=jnp.int32))
    return [(out[b], n_tokens[b]) for b in range(B)]


def transcribe_segments_batched(engine, segments: Sequence[np.ndarray],
                                mesh=None) -> List[str]:
    """Transcribe independent audio segments as one batch.  Returns texts in
    order.  Uses engine.max_tokens as the per-segment decode cap."""
    cfg = engine.cfg
    engine.prepare_prompt()
    tok = engine.tokenizer
    B = len(segments)

    import time as _time

    # --- encode all segments as one batch ------------------------------
    enc_t0 = _time.monotonic()
    audios = _encode_batch(engine, [log_mel(seg) for seg in segments])
    id_rows = []
    starts = []
    for _, n_audio in audios:
        ids, audio_start = prompt_mod.build_asr_prompt(
            cfg, n_audio, engine._prompt_tokens, engine._force_tokens, None)
        id_rows.append(ids)
        starts.append(audio_start)

    # LEFT-padded layout: every row's last prompt token sits at cache row
    # tcap-1 and decode positions are batch-uniform (a batch-varying cache
    # write position lowers to a catastrophic scatter on TPU).  Cache index =
    # logical position + pad; rope_start = -pad; kv_min = pad masks the pad
    # rows' garbage K/V.
    tcap = bucket128(max(len(i) for i in id_rows))
    acap = max(bucket(a.shape[0], 16) for a, _ in audios)
    H = cfg.dec_hidden

    pads = [tcap - len(ids) for ids in id_rows]
    ids_arr = np.zeros((B, tcap), dtype=np.int32)
    for b, ids in enumerate(id_rows):
        ids_arr[b, pads[b] :] = ids
    audio_stack = jnp.stack([
        jnp.pad(a, ((0, acap - a.shape[0]), (0, 0))) if a.shape[0] < acap else a[:acap]
        for a, _ in audios])
    astart = jnp.asarray([starts[b] + pads[b] for b in range(B)], dtype=jnp.int32)
    alen = jnp.asarray([n for _, n in audios], dtype=jnp.int32)
    valid = jnp.full((B,), tcap, dtype=jnp.int32)
    startpos = jnp.zeros((B,), dtype=jnp.int32)
    rope_start = jnp.asarray([-p for p in pads], dtype=jnp.int32)
    kv_min = jnp.asarray(pads, dtype=jnp.int32)

    kcap = bucket128(tcap + min(engine.max_tokens, BATCH_DECODE_CHUNK) + BATCH_DECODE_CHUNK)
    kv = pbatch.make_batched_kv(cfg, B, kcap, engine.kv_dtype)

    if mesh is not None:
        from smolvision_tpu.parallel import mesh as mesh_mod

        kv = jax.device_put(kv, mesh_mod.batched_kv_sharding(mesh))
        audio_stack = jax.device_put(audio_stack, mesh_mod.batch_sharding(mesh, 3))

    engine.perf.encode_ms += (_time.monotonic() - enc_t0) * 1000.0
    dec_t0 = _time.monotonic()

    build, prefill, decode = _batched_jits(engine)
    embeds = build(engine.dec_params, jnp.asarray(ids_arr), audio_stack,
                   astart, alen)
    first, kv = prefill(engine.dec_params, embeds, startpos, valid, kv,
                        rope_start, kv_min)

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
        if pos + BATCH_DECODE_CHUNK + 1 > kcap:
            kcap = bucket128(pos + BATCH_DECODE_CHUNK + 128)
            new_kv = pbatch.make_batched_kv(cfg, B, kcap, engine.kv_dtype)
            new_kv = new_kv.at[:, :, :, : kv.shape[3]].set(kv)
            kv = new_kv
        buf, kv = decode(engine.dec_params, tokens, jnp.int32(pos), kv,
                         rope_offset, kv_min)
        buf_host = np.asarray(jax.device_get(buf))  # [B, CHUNK]
        for b in range(B):
            if done[b]:
                continue
            for t in buf_host[b]:
                t = int(t)
                rows[b].append(t)
                if t in EOS_TOKEN_IDS:
                    done[b] = True
                    break
        tokens = buf[:, -1]
        pos += BATCH_DECODE_CHUNK
        produced += BATCH_DECODE_CHUNK

    engine.perf.decode_ms += (_time.monotonic() - dec_t0) * 1000.0

    # --- gate <asr_text> + detokenize per segment ----------------------
    texts = []
    forced_or_past = bool(engine._force_tokens)
    for b in range(B):
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
