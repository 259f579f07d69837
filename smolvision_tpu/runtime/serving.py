"""Continuous-batching serving: a rolling decode batch with mid-flight row
admission and retirement.

batch_segments.py runs ONE static batch to completion: every row waits for
the slowest row's decode, and no new work starts until the whole batch
drains.  This scheduler keeps a fixed pool of S row slots decoding on a
shared clock and admits queued clips into slots as rows hit EOS — the
continuous-batching shape of the upstream vendor serving stack
(/root/reference/MODEL.md:466-468, ~2000 s-speech/s at 128 concurrency),
built TPU-first:

  * NATURAL-layout KV [L, 2, S, KH, K, D]: each row's prompt lives at its
    logical positions [0, len_b); decode rows live in a SHARED region at
    [pcap, clock) so the per-step cache write stays ONE batch-uniform
    dynamic_update_slice (a batch-varying write position lowers to a
    ~1300 ms/token scatter — CLAUDE.md landmine).
  * admission = compact group prefill + slot insertion: the admitted group
    prefills in its own small [L, 2, G, KH, pcap, D] cache (full MXU
    efficiency, no waste on resident rows), then G scalar-indexed
    dynamic_update_slices copy the prompt KV into the big cache's slots
    (~60 MB/row, a few ms — NOT a per-row gather/scatter).
  * late-admission masking: a row admitted at clock c must not attend the
    decode region below c (those rows belong to other rows' histories).
    region_start is per-row ([B]) in _batched_attention_two_part; admitted
    rows carry region_start[b] = admission clock.
  * per-row rope: logical position of row b at clock p is
    len_b + (p - admit_b), so rope_offset[b] = admit_b - len_b.
  * retirement: EOS rows leave the active mask (device early-exit waits
    only on active rows); their slots are immediately reusable.

Clips are admitted longest-first so the prompt region cap is set by the
first group and later admissions always fit; results return in input order.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import EOS_TOKEN_IDS, TOKEN_ASR_TEXT
from smolvision_tpu.parallel import batch as pbatch
from smolvision_tpu.runtime import batch_segments as bs_mod
from smolvision_tpu.runtime import prompt as prompt_mod
from smolvision_tpu.runtime.buckets import bucket, bucket64

DECODE_CHUNK = 48


def _serve_chunk(engine) -> int:
    """Decode-chunk depth: engine.serve_chunk > 0 wins, else
    SMOLVISION_SERVE_CHUNK, else DECODE_CHUNK (48).  A sweep knob for the
    ceiling search (VERDICT r4 Next #2): deeper chunks amortize the
    per-chunk tunnel RTT + host bookkeeping across more steps but overrun
    further past EOS rows; consulted when the serving jits are built."""
    v = int(getattr(engine, "serve_chunk", 0) or 0)
    if v > 0:
        return v
    return int(os.environ.get("SMOLVISION_SERVE_CHUNK", "") or DECODE_CHUNK)


def _serving_jits(engine):
    # keyed on the mesh's TP degree (a TP-interleaved+sharded engine needs
    # the decoder's matching tp-aware fused-weight split; tp=1 otherwise),
    # on engine.serving_ep (expert-parallel owner-compute+psum MoE
    # dispatch instead of the cross-shard expert gather — the right
    # formulation when the expert axis is sharded on "model": gather moves
    # expert weights over ICI per token, owner-compute moves activations),
    # and on the decode-chunk depth
    from smolvision_tpu.parallel.mesh import mesh_tp

    tp = mesh_tp(getattr(engine, "serving_mesh", None))
    ep = bool(getattr(engine, "serving_ep", False))
    chunk = _serve_chunk(engine)
    cached = getattr(engine, "_serving_jits_cache", None)
    if cached is None:
        cached = engine._serving_jits_cache = {}
    if (tp, ep, chunk) in cached:
        return cached[(tp, ep, chunk)]
    from smolvision_tpu.models import qwen3_decoder as dec_mod

    cfg = engine.cfg

    # named (not lambdas) so profiler traces attribute device time per stage
    # (tools/probe_serving_stages.py aggregates ops by jit program name)
    def serving_build_embeds(p, ids, audio, astart, alen):
        return jax.vmap(dec_mod.build_embeds,
                        in_axes=(None, 0, 0, 0, 0))(p, ids, audio,
                                                    astart, alen)

    def serving_group_prefill(p, e, k, rs, km, lr, pm):
        return dec_mod.batched_prefill_delta(
            p, cfg, e, jnp.int32(0), k, rs, km, greedy=True, last_rows=lr,
            prompt_max=pm, region_start=jnp.int32(1 << 30), tp=tp, ep=ep)

    def serving_decode_chunk(p, t, pos, k, off, km, pm, rg, ns, act):
        return pbatch.batched_decode_chunk(
            p, cfg, t, pos, k, chunk, rope_offset=off, kv_min=km,
            n_steps=ns, prompt_max=pm, region_start=rg, row_active=act,
            tp=tp, ep=ep)

    build = jax.jit(serving_build_embeds)
    group_prefill = jax.jit(serving_group_prefill, donate_argnums=(2,))
    decode = jax.jit(serving_decode_chunk, donate_argnums=(3,))

    from smolvision_tpu.ops.quant import kv_grow_k

    grow_j = jax.jit(kv_grow_k, static_argnums=(1,), donate_argnums=(0,))

    # admit[K]: copy K rows' prompt KV from the standby group cache into
    # the big cache's slots — K scalar-indexed DUS (plain block copies;
    # shared helper parallel/batch.admit_rows).  src indices allow partial
    # admission of a standby-prefilled wave as slots free up.
    admit_cache = {}

    def admit_src_jit(K: int):
        fn = admit_cache.get(K)
        if fn is None:
            def serving_admit(big, small, slots, src):
                return pbatch.admit_rows(big, small, slots, K, src=src)

            fn = jax.jit(serving_admit, donate_argnums=(0,))
            admit_cache[K] = fn
        return fn

    cached[(tp, ep, chunk)] = (build, group_prefill, decode, grow_j,
                               admit_src_jit)
    return cached[(tp, ep, chunk)]


def _prompt_len(engine, n_samples: int) -> int:
    """Prompt length for a clip, from host arithmetic only."""
    from smolvision_tpu.models.qwen3_encoder import total_encoder_tokens
    from smolvision_tpu.ops.mel import num_frames

    cfg = engine.cfg
    n_audio = total_encoder_tokens(num_frames(n_samples), cfg)
    ids, _ = prompt_mod.build_asr_prompt(
        cfg, n_audio, engine._prompt_tokens, engine._force_tokens, None)
    return len(ids)


def prestage_uploads(engine, clips: Sequence[np.ndarray],
                     encode_group: int = 32) -> List:
    """Pre-upload every encode group's padded audio stack to the device,
    OUTSIDE any timing.  Returns the opaque list `serve_continuous` accepts
    as `prestaged=`.

    Purpose: measurement.  Over the axon tunnel the audio upload runs at
    ~43 MB/s effective and is ~35% of continuous-serving wall
    (docs/SERVING_ROOFLINE.md); a production host ships audio at NIC/PCIe
    speed where the same term is ~milliseconds.  Pre-staging lets bench
    report the ON-CHIP serving rate as an explicitly-labeled extra line —
    the tunnel-inclusive number stays the primary serving metric."""
    cfg = engine.cfg
    n = len(clips)
    order = sorted(range(n), key=lambda i: -len(clips[i]))  # == serve order
    groups = []
    for k in range(0, n, encode_group):
        group = order[k : k + encode_group]
        segs = [clips[i] for i in group]
        if bs_mod._use_device_mel(cfg, len(segs), engine.param_dtype):
            up = bs_mod._upload_audio(engine, segs)
            jax.block_until_ready(up[0])
            groups.append((group, segs, up))
        else:
            groups.append((group, segs, None))   # host-mel path: no upload
    # self-describing so serve_continuous can reject a mismatched pairing
    # (different clips list or encode_group) instead of decoding the wrong
    # audio or KeyError-ing mid-run
    return {"n": n, "encode_group": encode_group, "groups": groups}


def serve_continuous(engine, clips: Sequence[np.ndarray], slots: int = 32,
                     encode_group: int = 32, prestaged=None,
                     admit_cap: int = 0) -> List[str]:
    """Transcribe `clips` through a rolling batch of `slots` rows.
    Returns texts in input order.  engine.max_tokens caps each row.
    `prestaged` (from `prestage_uploads`) substitutes already-on-device
    audio stacks for the upload stage — measurement aid only.

    `admit_cap` > 0 (or SMOLVISION_SERVE_ADMIT) bounds each admission
    wave: a LATENCY knob.  The first admit_cap clips start decoding after
    a small-group prefill instead of waiting for the full slots-wide wave,
    cutting admission->first-token; later sub-waves admit into the free
    slots mid-decode through the same machinery EOS retirement uses, so
    tokens are unchanged (greedy rows are independent; tested).  Costs
    throughput — partial-occupancy decode chunks still pay the full slot
    count (same economics that killed eager admission)."""
    cfg = engine.cfg
    engine.prepare_prompt()
    tok = engine.tokenizer
    if cfg.family == "q25":   # CLI blocks this earlier; guard library callers
        raise ValueError("continuous serving supports the qwen3 family only "
                         "(q25 checkpoints route through the thinker path)")

    n = len(clips)
    if n == 0:
        return []
    if admit_cap <= 0:
        admit_cap = int(os.environ.get("SMOLVISION_SERVE_ADMIT", "0") or 0)
    if prestaged is not None and (prestaged["n"] != n or
                                  prestaged["encode_group"] != encode_group):
        raise ValueError(
            f"prestaged uploads were built for n={prestaged['n']} clips / "
            f"encode_group={prestaged['encode_group']}, but serve_continuous "
            f"got n={n} / encode_group={encode_group} — rebuild with "
            "prestage_uploads(engine, clips, encode_group)")
    order = sorted(range(n), key=lambda i: -len(clips[i]))  # longest first
    S = min(slots, max(2, 1 << (n - 1).bit_length()))

    build, group_prefill, decode, grow_j, admit_src_jit = _serving_jits(engine)

    pcap = bs_mod._prompt_cap(max(_prompt_len(engine, len(clips[i]))
                               for i in order))
    acap_all = 0

    # ---- encode queue: groups of clips encoded on demand ---------------
    # (device mel + batched encoder — the same path as one-shot serving)
    # Two stages so the dispatch shadows can be used at finer grain:
    #   upload stage  = host reflect-pad/f16-pack + the ONE big tunnel
    #                   transfer (~285 ms / 32 clips — the largest single
    #                   serving term, docs/SERVING_ROOFLINE.md)
    #   encode stage  = mel/conv/window/encoder dispatches (cheap, async)
    # A decode-chunk shadow fits the upload of group k+1 while group k's
    # encode dispatches ride a later shadow.  SMOLVISION_SERVE_NO_UPSPLIT=1
    # reverts to the round-3 combined encode_more for interleaved A/B.
    enc_ready = {}   # clip index -> (audio_block [cap, H] device, n_tokens)
    up_ready: List = []   # FIFO of (group, segs, uploaded-or-None)
    next_up = 0      # clips whose audio upload has been issued
    next_enc = 0     # clips whose encode has been dispatched
    upsplit = os.environ.get("SMOLVISION_SERVE_NO_UPSPLIT", "") != "1"

    def _upload_group():
        nonlocal next_up
        if next_up >= n:
            return
        if prestaged is not None:    # groups are exact order-chunks
            group, segs, up = prestaged["groups"][next_up // encode_group]
            next_up += len(group)
            up_ready.append((group, segs, up))
            return
        group = order[next_up : next_up + encode_group]
        next_up += len(group)
        segs = [clips[i] for i in group]
        if bs_mod._use_device_mel(cfg, len(segs), engine.param_dtype):
            up_ready.append((group, segs,
                             bs_mod._upload_audio(engine, segs)))
        else:
            up_ready.append((group, segs, None))  # host-mel path: no upload

    def upload_more():
        # shadow hook: stage the next group's audio onto the device while
        # the decode/prefill round-trip is in flight
        if upsplit and next_up < n and next_up - admitted < 2 * S:
            _upload_group()

    def encode_more():
        nonlocal next_enc, acap_all
        if next_enc >= n:
            return
        if not up_ready:
            _upload_group()
        group, segs, uploaded = up_ready.pop(0)
        next_enc += len(group)
        if uploaded is not None:
            stack, n_toks = bs_mod._encode_batch_device_mel(
                engine, segs, uploaded)
        else:
            from smolvision_tpu.ops.mel import log_mel

            stack, n_toks = bs_mod._encode_batch(
                engine, [log_mel(s) for s in segs])
        acap_all = max(acap_all, stack.shape[1])
        for j, i in enumerate(group):
            enc_ready[i] = (stack[j], n_toks[j])

    # ---- slot state ----------------------------------------------------
    chunk = _serve_chunk(engine)
    kcap = pcap + bucket(min(engine.max_tokens, 2 * chunk) + 1, 64)
    kv = pbatch.make_batched_kv(cfg, S, kcap, engine.batched_kv_dtype)
    # Optional data-parallel serving: when engine.serving_mesh is a Mesh
    # whose "data" axis divides S, the big cache's slot axis is sharded
    # over it and the decode/admit jits compile to GSPMD programs where
    # each shard owns its rows (shard dec_params via parallel/mesh for
    # TP on top).  This is the measured path past one chip's ~1500-1800
    # s-speech/s bf16 ceiling (docs/SERVING_ROOFLINE.md); exercised on
    # the virtual mesh by __graft_entry__.dryrun_multichip and
    # tests/test_serving.py.  Default None: byte-identical behavior.
    _kv_shard = None
    smesh = getattr(engine, "serving_mesh", None)
    if smesh is not None:
        from smolvision_tpu.ops.quant import QuantKV
        from smolvision_tpu.parallel import mesh as mesh_mod

        _kv_shard = mesh_mod.batched_kv_sharding(
            smesh, quant=isinstance(kv, QuantKV))
        kv = jax.device_put(kv, _kv_shard)
    slot_clip = [-1] * S                  # clip index per slot (-1 free)
    slot_done = [True] * S
    rows: List[Optional[List[int]]] = [None] * n
    tokens_h = np.zeros(S, np.int32)      # current token per slot
    rope_off = np.zeros(S, np.int32)
    prompt_max = np.zeros(S, np.int32)
    region_min = np.full(S, 1 << 30, np.int32)
    produced = np.zeros(S, np.int32)
    kv_min = jnp.zeros((S,), jnp.int32)

    clock = pcap                          # shared decode-region write head
    emitted = 0                           # clips fully decoded
    admitted = 0                          # clips admitted so far
    tokens_dev = jnp.zeros((S,), jnp.int32)

    # per-clip latency (all clips "arrive" at t0 — the queued-batch analog
    # of the upstream serving TTFT metric, MODEL.md:466-468): first token
    # exists when the admission wave's prefill returns; completion when the
    # row hits EOS / its cap
    t_first = np.zeros(n)
    t_done = np.zeros(n)
    # admission->first-token per clip: the continuous-serving TTFT analog
    # (the t_first percentiles above count QUEUE WAIT from t0, since all
    # clips "arrive" at once here; a 92 ms-class upstream TTFT figure is
    # measured from per-request arrival, which admission approximates)
    t_admit_first = np.zeros(n)
    # clips admitted in the FIRST wave: their admit->first pays the cold
    # synchronous group prefill (nothing in flight to hide behind), while
    # every later wave rides the standby prefill dispatched in a decode
    # shadow — steady-state percentiles exclude them (the comparable
    # number to a per-request steady-server TTFT)
    first_wave_ids: list = []

    # round-3 pipelining (SMOLVISION_SERVE_NO_PIPE3=1 reverts for A/B):
    # encode in the PREFILL shadow too, top up the encode queue ahead of
    # demand, and reset the shared clock at wave boundaries so kcap never
    # grows across waves (wave 2 otherwise decodes against a 512-deep
    # cache where 320 suffices — ~40% more KV bytes per step at B=64)
    pipe3 = os.environ.get("SMOLVISION_SERVE_NO_PIPE3", "") != "1"

    # ---- standby wave prefill (SMOLVISION_SERVE_NO_STANDBY=1 reverts) --
    # The group prefill writes only its own fresh small cache, and the
    # prompt computation depends only on the clip — so the NEXT wave's
    # build+prefill can be dispatched in a decode-chunk shadow, long
    # before any slot frees.  At the wave boundary only the row-copy admit
    # and host bookkeeping remain: the ~200 ms prefill stall disappears
    # from the boundary and wave-2+ admission->first-token drops to ~an
    # RTT.  (This is NOT eager admission — occupancy is unchanged; the
    # prefill is merely computed early.)
    standby = None          # {"group_idx", "lens", "first", "small_kv",
    #                          "first_h", "consumed", "G"}
    standby_on = (pipe3 and
                  os.environ.get("SMOLVISION_SERVE_NO_STANDBY", "") != "1")

    def _prepare_wave(G):
        """Build + group-prefill clips order[admitted : admitted+G] into a
        fresh small cache — no slot assignment, no big-cache write."""
        nonlocal acap_all
        while len(enc_ready) < G and next_enc < n:
            encode_more()
        group_idx = [order[admitted + g] for g in range(G)]
        # pow2-bucket the group so admission compiles O(log S) programs,
        # not one per distinct wave size; pad rows repeat the last clip
        Gcap = 1 << (G - 1).bit_length() if G > 1 else 1
        lens = []
        id_rows = np.zeros((Gcap, pcap), np.int32)
        astart = np.zeros(Gcap, np.int32)
        alen = np.zeros(Gcap, np.int32)
        blocks = []
        for g, i in enumerate(group_idx):
            blk, n_audio = enc_ready.pop(i)
            ids, a0 = prompt_mod.build_asr_prompt(
                cfg, n_audio, engine._prompt_tokens,
                engine._force_tokens, None)
            lens.append(len(ids))
            id_rows[g, : len(ids)] = ids
            astart[g] = a0
            alen[g] = n_audio
            if blk.shape[0] < acap_all:
                blk = jnp.pad(blk, ((0, acap_all - blk.shape[0]), (0, 0)))
            blocks.append(blk[:acap_all])
        for g in range(G, Gcap):   # pad rows mirror the last real clip
            id_rows[g] = id_rows[G - 1]
            astart[g] = astart[G - 1]
            alen[g] = alen[G - 1]
            lens.append(lens[G - 1])
            blocks.append(blocks[G - 1])
        audio_stack = jnp.stack(blocks)
        small_kv = pbatch.make_batched_kv(cfg, Gcap, pcap,
                                          engine.batched_kv_dtype)
        embeds = build(engine.dec_params, jnp.asarray(id_rows),
                       audio_stack, jnp.asarray(astart),
                       jnp.asarray(alen))
        first, small_kv = group_prefill(
            engine.dec_params, embeds, small_kv,
            jnp.zeros((Gcap,), jnp.int32), jnp.zeros((Gcap,), jnp.int32),
            jnp.asarray(np.asarray(lens, np.int32) - 1),
            jnp.asarray(lens, dtype=jnp.int32))
        return {"group_idx": group_idx, "lens": lens, "first": first,
                "small_kv": small_kv, "first_h": None, "consumed": 0,
                "G": G}

    t0 = time.monotonic()
    while emitted < n:
        # ---- admit into free slots ------------------------------------
        free = [s for s in range(S) if slot_done[s]]
        if free and admitted < n:
            if pipe3 and len(free) == S:
                # wave boundary: no live rows reference the decode region,
                # so rewind the shared write head — the next wave decodes
                # against [pcap, ...) again instead of ever-deeper kcap
                clock = pcap
            # admission fills ALL free slots (the shadows below keep
            # enc_ready ahead of demand, so this loop rarely encodes).
            # EAGER admission — admitting only what was already encoded —
            # was measured and REVERTED: interleaved A/B on the mixed-length
            # 128-queue read median 408 s-speech/s eager vs 451 fill-free
            # (admission churn spends extra decode chunks at partial
            # occupancy, and every chunk costs the full slot count).
            wave = min(len(free), n - admitted)
            if admit_cap > 0:
                wave = min(wave, admit_cap)
            t_wave = time.monotonic()   # admission instant for this wave
            if standby is None:
                standby = _prepare_wave(wave)
                # prefill shadow: with the group prefill dispatched and
                # the device busy, push the next group's encode (upload +
                # mel/conv dispatches) before blocking on `first` — same
                # dispatch-order trick as the decode-chunk shadow below
                if pipe3 and next_enc < n and next_enc - admitted < 2 * S:
                    upload_more()
                    encode_more()
            if standby["first_h"] is None:
                standby["first_h"] = np.asarray(
                    jax.device_get(standby["first"]))
            take = min(wave, standby["G"] - standby["consumed"])
            src0 = standby["consumed"]
            now = time.monotonic()
            taken_slots = free[:take]
            Kcap = 1 << (take - 1).bit_length() if take > 1 else 1
            slot_vec = np.asarray(
                taken_slots + [taken_slots[-1]] * (Kcap - take), np.int32)
            src_vec = np.asarray(
                list(range(src0, src0 + take))
                + [src0 + take - 1] * (Kcap - take), np.int32)
            kv = admit_src_jit(Kcap)(kv, standby["small_kv"],
                                     jnp.asarray(slot_vec),
                                     jnp.asarray(src_vec))
            is_first_wave = admitted == 0
            for k in range(take):
                g = src0 + k
                i = standby["group_idx"][g]
                ln = standby["lens"][g]
                ft = int(standby["first_h"][g])
                s = taken_slots[k]
                if is_first_wave:
                    first_wave_ids.append(i)
                slot_clip[s] = i
                slot_done[s] = False
                rows[i] = [ft]
                tokens_h[s] = ft
                rope_off[s] = clock - ln
                prompt_max[s] = ln
                region_min[s] = clock
                produced[s] = 1
                t_first[i] = now - t0
                t_admit_first[i] = now - t_wave
                if ft in EOS_TOKEN_IDS or engine.max_tokens <= 1:
                    slot_done[s] = True
                    emitted += 1
                    t_done[i] = now - t0
            admitted += take
            standby["consumed"] += take
            if standby["consumed"] >= standby["G"]:
                standby = None
            tokens_dev = jnp.asarray(tokens_h)

        if all(slot_done):
            continue

        # ---- one decode chunk on the shared clock ---------------------
        steps = min(chunk,
                    int(max(engine.max_tokens - produced[s]
                            for s in range(S) if not slot_done[s])))
        if clock + steps + 1 > kcap:
            kcap = bucket64(clock + chunk + 64)
            kv = grow_j(kv, kcap)
            if _kv_shard is not None:
                # growth pads the K axis only; re-assert the slot-axis
                # sharding rather than trusting GSPMD propagation (no-op
                # when propagation already kept it)
                kv = jax.device_put(kv, _kv_shard)
        act = np.asarray([not d for d in slot_done], np.bool_)
        buf, count, tokens_dev, kv = decode(
            engine.dec_params, tokens_dev, jnp.int32(clock), kv,
            jnp.asarray(rope_off), kv_min, jnp.asarray(prompt_max),
            jnp.asarray(region_min), jnp.int32(steps), jnp.asarray(act))
        # pipeline: with the decode chunk dispatched and the device busy,
        # push the NEXT wave's encode (host mel prep + the ~280 ms/32-clip
        # audio upload over the tunnel + conv/window dispatches) NOW, before
        # blocking on the decode result — the upload overlaps device decode
        # instead of serializing ahead of the next admission.  (Dispatching
        # it BEFORE the decode call measured ~20% WORSE: the upload then
        # sits on the serialized tunnel channel ahead of the decode
        # round-trip, stretching every round — tools/probe_serving.py.)
        upload_more()   # stage group k+1's audio in the decode shadow
        if next_enc < n and (not enc_ready
                             if not pipe3 else next_enc - admitted < 2 * S):
            encode_more()
        # standby: dispatch the NEXT wave's build+group-prefill behind the
        # in-flight decode chunk — it fills the device-idle RTT gaps of the
        # chunk loop and removes the prefill stall from the wave boundary
        if standby_on and standby is None and admitted < n:
            g_next = min(S, n - admitted)
            if admit_cap > 0:
                g_next = min(g_next, admit_cap)
            standby = _prepare_wave(g_next)
        # one fetch for the chunk result AND the current-token mirror the
        # next admission wave needs — folding tokens_dev in here saves a
        # separate ~27 ms tunnel RTT per chunk
        buf_h, count, tokens_h = jax.device_get((buf, count, tokens_dev))
        tokens_h = np.array(tokens_h)
        count = int(count)
        now = time.monotonic()
        if count == 0:
            # every active row's current token was already EOS
            for s in range(S):
                if not slot_done[s]:
                    slot_done[s] = True
                    emitted += 1
                    t_done[slot_clip[s]] = now - t0
            continue
        for s in range(S):
            if slot_done[s]:
                continue
            i = slot_clip[s]
            for t in buf_h[s][:count]:
                t = int(t)
                if produced[s] >= engine.max_tokens:
                    break
                rows[i].append(t)
                produced[s] += 1
                if t in EOS_TOKEN_IDS:
                    break
            last = rows[i][-1]
            if last in EOS_TOKEN_IDS or produced[s] >= engine.max_tokens:
                slot_done[s] = True
                emitted += 1
                t_done[i] = now - t0
        clock += count

    engine.perf.decode_ms += (time.monotonic() - t0) * 1000.0
    # p50/p99 over the queue (seconds -> ms); consumers: bench.py, --debug
    tf = np.sort(t_first) * 1000.0
    td = np.sort(t_done) * 1000.0
    ta = np.sort(t_admit_first) * 1000.0
    # steady-state admit->first: drop the first wave's cold-prefill clips
    # (falls back to the full set when everything fit in one wave, so the
    # keys below always exist)
    steady = (np.delete(t_admit_first, first_wave_ids)
              if 0 < len(first_wave_ids) < n else t_admit_first)
    ts = np.sort(steady) * 1000.0
    engine.perf.serving_latency = {
        "ttft_min_ms": round(float(tf[0]), 1),
        "ttft_p50_ms": round(float(tf[len(tf) // 2]), 1),
        "ttft_p99_ms": round(float(tf[min(len(tf) - 1, int(len(tf) * 0.99))]), 1),
        "admit_ttft_min_ms": round(float(ta[0]), 1),
        "admit_ttft_p50_ms": round(float(ta[len(ta) // 2]), 1),
        "admit_ttft_p99_ms": round(float(ta[min(len(ta) - 1, int(len(ta) * 0.99))]), 1),
        "admit_ttft_steady_p50_ms": round(float(ts[len(ts) // 2]), 1),
        "admit_ttft_steady_p99_ms": round(float(ts[min(len(ts) - 1, int(len(ts) * 0.99))]), 1),
        "first_wave_clips": len(first_wave_ids),
        "done_p50_ms": round(float(td[len(td) // 2]), 1),
        "done_p99_ms": round(float(td[min(len(td) - 1, int(len(td) * 0.99))]), 1),
        "clips": int(n),
    }

    # ---- gate + detokenize (identical to batch_segments) ---------------
    texts: List[str] = [""] * n
    forced = bool(engine._force_tokens)
    for i in range(n):
        past_asr = forced
        pieces = []
        n_text = 0
        for t in rows[i] or []:
            if t in EOS_TOKEN_IDS:
                break
            if t == TOKEN_ASR_TEXT:
                past_asr = True
            elif past_asr:
                pieces.append(tok.decode_piece(t))
                n_text += 1
        engine.perf.text_tokens += n_text
        texts[i] = b"".join(pieces).decode("utf-8", errors="replace").strip()
    return texts
