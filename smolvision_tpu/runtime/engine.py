"""Engine: model loading, jit caches, encode / prefill / decode primitives.

This is the TPU equivalent of qwen_ctx_t + the qwen_load / transcribe entry
points (qwen_asr.c).  The engine owns:
  * device-resident weight pytrees (bf16),
  * the static KV cache (grow-by-rebucket),
  * one jitted callable per phase; JAX's shape cache provides the per-bucket
    specialization,
  * host-side text logic (prompt tokens, <asr_text> gating, callbacks),
  * perf counters matching the reference's stderr contract (main.c:378-394).

Decode runs in device-side chunks (`lax.while_loop`, up to DECODE_CHUNK
tokens per dispatch with on-device EOS early-exit) so the host syncs ~once
per 32 tokens instead of every token.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smolvision_tpu.config import (
    EOS_TOKEN_IDS,
    SUPPORTED_LANGUAGES,
    TOKEN_ASR_TEXT,
    ModelConfig,
    detect_config,
)
from smolvision_tpu.io.safetensors import MultiSafetensors
from smolvision_tpu.models import params as params_mod
from smolvision_tpu.models import q25_encoder as q25e
from smolvision_tpu.models import qwen3_decoder as dec_mod
from smolvision_tpu.models import qwen3_encoder as enc_mod
from smolvision_tpu.ops.mel import log_mel
from smolvision_tpu.runtime import prompt as prompt_mod
from smolvision_tpu.runtime.buckets import bucket, window_bucket
from smolvision_tpu.runtime.sampling import CRefSampler, Sampler
from smolvision_tpu.text.tokenizer import Tokenizer, load_tokenizer

# Tokens per device decode dispatch.  Each chunk costs one host<->device
# round trip (~27 ms over the axon tunnel); typical ASR outputs are ~40
# tokens, so 64 usually means a single sync per segment.
DECODE_CHUNK = 64
KV_HEADROOM = 256
# speculative draft depth (--spec): int8 draft tokens verified per bf16
# forward; tokens/iter <= SPEC_DRAFT+1, cost ~= SPEC_DRAFT int8 steps + one
# bf16 weight pass
SPEC_DRAFT = max(1, int(os.environ.get("SMOLVISION_SPEC_DRAFT", "4")))

TokenCallback = Callable[[bytes], None]


class PerfStats:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_ms = 0.0
        self.text_tokens = 0
        self.audio_ms = 0.0
        self.encode_ms = 0.0
        self.decode_ms = 0.0
        # streaming latency (runtime/stream.py): wall ms per chunk round and
        # session-start -> first committed token (the TTFT analog; upstream
        # reports 92 ms, MODEL.md:466-468)
        self.stream_chunk_ms = []
        self.stream_first_commit_ms = None
        # continuous-serving per-clip latency (runtime/serving.py): ttft /
        # completion p50/p99 dict over the last queue, or None
        self.serving_latency = None
        # speculative decoding (--spec): verify iterations and tokens they
        # produced; tokens/iter is the measured acceptance (max SPEC_DRAFT+1)
        self.spec_iters = 0
        self.spec_tokens = 0

    def stream_latency(self):
        """(first_commit_ms, p50, p99) over the recorded chunk rounds, or
        None when no streaming ran."""
        if not self.stream_chunk_ms:
            return None
        import numpy as _np

        arr = _np.asarray(self.stream_chunk_ms)
        return (self.stream_first_commit_ms,
                float(_np.percentile(arr, 50)),
                float(_np.percentile(arr, 99)))


def _now_ms() -> float:
    return time.monotonic() * 1000.0


class Engine:
    """One loaded checkpoint + its jitted programs + generation settings."""

    def __init__(self, model_dir: str, param_dtype=jnp.bfloat16,
                 kv_dtype=jnp.bfloat16, enc_window_sec: Optional[float] = None,
                 verbose: int = 0, q8: bool = False, moe_offload: bool = False,
                 kv8: bool = False, spec: bool = False):
        self.model_dir = model_dir
        self.verbose = verbose
        self.reader = MultiSafetensors(model_dir)
        cfg = detect_config(model_dir, self.reader)
        if enc_window_sec is not None:
            frames = int(enc_window_sec * 100.0 + 0.5)
            frames = min(max(frames, 100), 800)
            cfg = ModelConfig(**{**cfg.__dict__, "enc_n_window_infer": frames})
        self.cfg = cfg
        self.param_dtype = param_dtype
        self.kv_dtype = kv_dtype

        if verbose >= 1:
            print(f"Detected: {cfg.name} ({cfg.family})", file=sys.stderr, flush=True)

        if cfg.family == "q25":
            self.enc_params = params_mod.load_q25_encoder(self.reader, cfg, param_dtype)
        else:
            self.enc_params = params_mod.load_qwen3_encoder(self.reader, cfg, param_dtype)
        # Plan B host-offload (docs/MOE_30B_PLAN.md): experts stay as host
        # mmap views and stream per layer; everything else stays resident.
        # This is how a 30B MoE (58 GB of experts) executes on one chip.
        self.moe_offload = bool(moe_offload) and cfg.is_moe
        self.dec_params = params_mod.load_decoder(
            self.reader, cfg, param_dtype, experts_on_host=self.moe_offload)
        self.expert_store = None
        self._dec_layers_list = None
        self._kv_list = None
        self._kv_list_cap = 0
        # int8 KV cache (--kv8): batched decode paths only — the KV read is
        # their dominant decode term (serving B=32: ~1.17 GB/step vs 0.63 GB
        # of weights; docs/SERVING_ROOFLINE.md).  Single-stream paths keep
        # kv_dtype: at B=1 the cache is a minor term and the bf16 cache is
        # part of the token-parity contract.
        self.kv8 = bool(kv8)
        if self.kv8 and verbose >= 1:
            print("int8 KV cache active (--kv8) on batched paths: output "
                  "may differ from the bf16 parity path",
                  file=sys.stderr, flush=True)
        self.q8 = bool(q8)
        if self.q8:
            # int8 decoder weights (--q8): ~1.7x decode bandwidth for bounded
            # quantization noise — OUTSIDE the bf16 token-parity contract
            # (ops/quant.py).  Encoder stays bf16 (it is ~8% of the time).
            # Must run BEFORE the offload layer list is sliced below so the
            # offload hot path sees the int8 weights too.
            self.dec_params = params_mod.quantize_decoder(self.dec_params)
            if verbose >= 1:
                print("int8 decoder weights active (--q8): output may differ "
                      "from the bf16 parity path", file=sys.stderr, flush=True)
        # Speculative self-draft decoding (--spec): draft SPEC_DRAFT tokens
        # per iteration with an int8 copy of the decoder, then verify them in
        # ONE bf16 forward over the draft block — output is BIT-EXACT bf16
        # greedy (the verify argmax decides every emitted token; the draft
        # only chooses which positions get batched into one weight pass), at
        # a decode cost approaching the int8 stream.  Orthogonal to --q8
        # (which trades exactness); meaningless combined with it.
        self.spec = bool(spec) and not self.q8 and not self.moe_offload
        if spec and not self.spec:
            print("warning: --spec disabled (meaningless with --q8 / "
                  "--moe-offload); output follows the quantized/offload "
                  "path, NOT bit-exact bf16 greedy", file=sys.stderr,
                  flush=True)
        self.dec_params_draft = None
        self._spec_chunk_jit = None
        if self.spec:
            self.dec_params_draft = params_mod.quantize_decoder(self.dec_params)
            if verbose >= 1:
                print("speculative int8-draft decoding active (--spec): "
                      "tokens remain exactly the bf16 greedy sequence",
                      file=sys.stderr, flush=True)
        if self.moe_offload:
            from smolvision_tpu.models.moe_offload import HostExpertStore
            from smolvision_tpu.ops.quant import qtake

            self.expert_store = HostExpertStore(self.reader, cfg)
            layers = self.dec_params["layers"]
            # w_gate_up/w_down present only for mixed sparse_step
            # checkpoints: dense interleave layers keep their FFN resident
            keys = [k for k in ("input_ln", "post_ln", "wqkv", "bqkv",
                                "q_norm", "k_norm", "wo", "router",
                                "w_gate_up", "w_down")
                    if layers.get(k) is not None]
            self._dec_layers_list = [
                {k: qtake(layers[k], l) for k in keys}
                for l in range(cfg.dec_layers)
            ]
            # The per-layer slices above are the only consumers of the stacked
            # [L, ...] arrays in offload mode (the remaining jits read only
            # embed / final_norm / lm_head) — drop the stacks so the non-expert
            # weights are not resident twice (~2.5 GB at 30B scale).
            for k in keys:
                layers[k] = None
            if verbose >= 1:
                print("MoE host-offload active: experts stream from host "
                      "mmap per layer", file=sys.stderr, flush=True)

        # ---- generation settings (defaults mirror qwen_asr.c:257-272) ----
        self.segment_sec = 0.0
        self.search_sec = 3.0
        self.stream_chunk_sec = 2.0
        self.stream_rollback = 5
        self.stream_unfixed_chunks = 2
        self.stream_max_new_tokens = 32
        self.past_text_conditioning = False
        self.skip_silence = False
        self.thinker_max_tokens = 2048
        self.temperature = 0.7
        self.repetition_penalty = 1.1
        self.top_k = 40
        self.seed = 0
        # "np": reproducible default (np RNG host first-token + device
        # sampled chunks).  "cref": replay the reference C engine's exact
        # sampled stream (drand48 + its -ffast-math sampler arithmetic,
        # runtime/sampling.CRefSampler) in a per-token host loop — the
        # SAMPLED-mode cross-engine parity arm (CLI --sampler cref).
        self.sampler_mode = "np"
        self.max_tokens = 2048
        # batch independent -S segments on device (offload engines decode
        # through the host-streaming path, which has no batched formulation)
        self.batch_segments = not self.moe_offload

        self.prompt_text: Optional[str] = None
        self.force_language: Optional[str] = None
        self._prompt_tokens: List[int] = []
        self._force_tokens: List[int] = []
        self._prompt_ready = False

        self.token_cb: Optional[TokenCallback] = None
        self.monitor = False
        self.perf = PerfStats()
        self._tokenizer: Optional[Tokenizer] = None

        self._kv = None
        self._kv_cap = 0
        self._build_jits()

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _build_jits(self):
        cfg = self.cfg
        wts = cfg.window_token_size()

        if self.moe_offload:
            from smolvision_tpu.models.moe_offload import build_offload_fns
            from smolvision_tpu.ops.quant import embed_rows

            self._offload_fns = build_offload_fns(cfg)
            self._embed_one = jax.jit(
                lambda p, t: embed_rows(p["embed"], t)[None])
            self._final_argmax = jax.jit(
                lambda p, hidden, row: jnp.argmax(
                    dec_mod.logits_at(p, cfg, hidden, row)).astype(jnp.int32))
            self._final_logits = jax.jit(
                lambda p, hidden, row: dec_mod.logits_at(p, cfg, hidden, row))

        # The conv stem reads the encoder-SP mesh (parallel/mesh.shard_engine
        # sets engine._enc_sp_mesh for dp>1 meshes) at TRACE time: sharding
        # the chunk-block axis over "data" partitions the conv collective-
        # free AND bitwise-exactly — each block's conv has a fixed shape
        # regardless of how many blocks a device holds, so no f32 order
        # changes (pinned in tests/test_enc_sp.py).  A pre-mesh trace never
        # goes stale: shard_engine re-device_puts the params, and the new
        # input shardings force a retrace.
        #
        # The solo windowed transformer (_enc_tf) is deliberately NOT
        # sharded: partitioning the flat [Tcap, d] token axis changes the
        # GEMM tiling and therefore the f32 summation order (measured
        # ~1e-7 drift on the CPU mesh), which would break the byte-equality
        # DP contract for solo runs.  The BATCHED group encode
        # (runtime/batch_segments._pool_and_encode) — the front end all
        # three mesh schedulers actually use — shards the clip axis
        # instead, which keeps every per-clip shape identical and stays
        # bitwise (see that file).
        def conv_stem_fn(p, chunks):
            m = getattr(self, "_enc_sp_mesh", None)
            if m is not None:
                from smolvision_tpu.parallel.mesh import batch_sharding

                chunks = jax.lax.with_sharding_constraint(
                    chunks, batch_sharding(m, chunks.ndim))
            return enc_mod.conv_stem(p, chunks, cfg)

        self._conv_stem = jax.jit(conv_stem_fn)
        self._enc_tf = jax.jit(
            lambda p, x, vlen: enc_mod.encoder_transformer(p, x, vlen, cfg, wts))
        if cfg.family == "q25":
            self._q25_conv = jax.jit(lambda p, mel: q25e.q25_conv_stem(p, mel, cfg))
            self._q25_tf = jax.jit(
                lambda p, x, vlen: q25e.q25_encoder_transformer(p, x, vlen, cfg))

        self._build_embeds = jax.jit(dec_mod.build_embeds)

        self._prefill_greedy = jax.jit(
            lambda p, e, s, v, kv: dec_mod.prefill(p, cfg, e, s, v, kv, greedy=True),
            donate_argnums=(4,))
        self._prefill_logits = jax.jit(
            lambda p, e, s, v, kv: dec_mod.prefill(p, cfg, e, s, v, kv, greedy=False),
            donate_argnums=(4,))
        self._step_logits = jax.jit(
            lambda p, t, pos, kv: dec_mod.decode_step(p, cfg, t, pos, kv, greedy=False),
            donate_argnums=(3,))

        eos = jnp.asarray(list(EOS_TOKEN_IDS), dtype=jnp.int32)

        def decode_chunk(p, token, pos, kv, n_steps):
            """Up to n_steps (traced, <= DECODE_CHUNK) greedy tokens on
            device; early-exits on EOS.  token/pos stay device scalars across
            chunks — the only host traffic per chunk is the buf download."""
            buf = jnp.zeros((DECODE_CHUNK,), dtype=jnp.int32)

            def cond(c):
                i, _, _, _, _, done = c
                return (~done) & (i < n_steps) & (i < DECODE_CHUNK)

            def body(c):
                i, tok, pos_, kv_, buf_, _ = c
                nxt, kv_ = dec_mod.decode_step(p, cfg, tok, pos_, kv_, greedy=True)
                buf_ = buf_.at[i].set(nxt)
                done = jnp.any(nxt == eos)
                return (i + 1, nxt, pos_ + 1, kv_, buf_, done)

            i, tok, pos, kv, buf, done = jax.lax.while_loop(
                cond, body, (jnp.int32(0), token, pos, kv, buf, jnp.bool_(False)))
            return buf, i, tok, pos, kv

        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(3,))

        self._slice_rows = jax.jit(
            lambda x, start, n: jax.lax.dynamic_slice(x, (start, 0), (n, x.shape[1])),
            static_argnums=(2,))

        def sample_chunk(p, token, pos, kv, recent, n_recent, key,
                         temp, penalty, n_steps, top_k):
            """Device-side sampled decoding (thinker): repetition penalty
            (divide-positive/multiply-negative per occurrence over a 64-token
            window — sign never flips, so penalty^count is exact), optional
            top-k, temperature softmax, categorical draw.  Mirrors
            sample_token (qwen_asr.c:2250-2313) with a reproducible PRNG."""
            V = cfg.vocab_size
            buf = jnp.zeros((DECODE_CHUNK,), dtype=jnp.int32)
            REP = recent.shape[0]

            def cond(c):
                i, *_, done = c
                return (~done) & (i < n_steps) & (i < DECODE_CHUNK)

            def body(c):
                i, tok, pos_, kv_, recent_, n_recent_, key_, buf_, _ = c
                # observe current token in the window (ring buffer)
                recent_ = jax.lax.dynamic_update_index_in_dim(
                    recent_, tok, n_recent_ % REP, 0)
                n_recent_ = n_recent_ + 1

                logits, kv_ = dec_mod.decode_step(p, cfg, tok, pos_, kv_, greedy=False)
                from smolvision_tpu.runtime.sampling import transform_logits_jnp
                logits = transform_logits_jnp(logits, recent_, n_recent_,
                                              penalty, temp, top_k)
                key_, sub = jax.random.split(key_)
                nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
                buf_ = buf_.at[i].set(nxt)
                done = jnp.any(nxt == eos)
                return (i + 1, nxt, pos_ + 1, kv_, recent_, n_recent_, key_, buf_, done)

            i, tok, pos, kv, recent, n_recent, key, buf, done = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), token, pos, kv, recent, n_recent, key, buf,
                 jnp.bool_(False)))
            return buf, i, tok, pos, kv, recent, n_recent, key

        self._sample_chunk = jax.jit(
            sample_chunk, static_argnums=(10,), donate_argnums=(3,))

    # ------------------------------------------------------------------
    # tokenizer / prompt settings
    # ------------------------------------------------------------------

    @property
    def batched_kv_dtype(self):
        """Cache dtype for the BATCHED decode paths (serving / multistream /
        batched segments): int8 under --kv8, else kv_dtype."""
        return jnp.int8 if self.kv8 else self.kv_dtype

    @property
    def tokenizer(self) -> Tokenizer:
        if self._tokenizer is None:
            self._tokenizer = load_tokenizer(self.model_dir)
        return self._tokenizer

    def set_prompt(self, text: Optional[str]):
        self.prompt_text = text or None
        self._prompt_ready = False

    def set_force_language(self, language: Optional[str]) -> bool:
        """Normalize + validate like qwen_set_force_language (qwen_asr.c:98-120).

        BYTE-level per the C locale (qwen_asr.c:74-96): trim = C isspace on
        bytes, case-fold = ASCII toupper/tolower on bytes, 64-byte buffer
        cap.  Python str.strip()/.upper() are Unicode-semantic and DIVERGE:
        'ıtalian' upper-cases to 'Italian' (accepted) and a leading NBSP is
        stripped (accepted) where the C engine rejects both."""
        if not language:
            self.force_language = None
            self._prompt_ready = False
            return True
        raw = language.encode("utf-8", errors="surrogateescape")
        b = raw.strip(b" \t\n\r\x0b\x0c")
        if not b or len(b) + 1 > 64:
            return False
        def up(c):  # ASCII-only, as C-locale toupper/tolower
            return c - 32 if 0x61 <= c <= 0x7A else c
        def lo(c):
            return c + 32 if 0x41 <= c <= 0x5A else c
        norm_b = bytes([up(b[0])]) + bytes(lo(c) for c in b[1:])
        for cand in SUPPORTED_LANGUAGES:
            if norm_b == cand.encode("ascii"):
                self.force_language = cand
                self._prompt_ready = False
                return True
        return False

    def prepare_prompt(self):
        """Tokenize --prompt / --language once (qwen_asr.c:563-607)."""
        if self._prompt_ready:
            return
        tok = self.tokenizer
        self._prompt_tokens = tok.encode(self.prompt_text) if self.prompt_text else []
        if self.force_language:
            self._force_tokens = tok.encode(f"language {self.force_language}") + [TOKEN_ASR_TEXT]
        else:
            self._force_tokens = []
        self._prompt_ready = True

    # ------------------------------------------------------------------
    # KV cache management
    # ------------------------------------------------------------------

    def reset_kv(self):
        self._kv = None
        self._kv_cap = 0
        self._kv_list = None
        self._kv_list_cap = 0

    def _ensure_kv_list(self, needed: int):
        """Per-layer KV caches for the host-offload path ([2, cap, KH, D]
        each, donated to the per-layer jit so updates stay in place)."""
        cfg = self.cfg
        cap = bucket(needed, 256)
        shape = (2, cap, cfg.dec_kv_heads, cfg.dec_head_dim)
        if self._kv_list is None:
            self._kv_list = [jnp.zeros(shape, self.kv_dtype)
                             for _ in range(cfg.dec_layers)]
            self._kv_list_cap = cap
        elif cap > self._kv_list_cap:
            old = self._kv_list_cap
            self._kv_list = [
                jnp.zeros(shape, self.kv_dtype).at[:, :old].set(kv_l)
                for kv_l in self._kv_list
            ]
            self._kv_list_cap = cap
        return self._kv_list

    def _offload_forward_ids(self, embeds, start_pos: int, valid_len: int,
                             tcap: int, greedy: bool):
        """Prefill/step through the host-offload layer loop; returns
        (token | logits) for the last valid row."""
        from smolvision_tpu.models import moe_offload as off_mod

        kvl = self._ensure_kv_list(start_pos + tcap + KV_HEADROOM)
        hidden, self._kv_list = off_mod.offload_forward(
            self._dec_layers_list, self.expert_store, self.cfg,
            self._offload_fns, embeds, start_pos, valid_len, kvl)
        fn = self._final_argmax if greedy else self._final_logits
        return fn(self.dec_params, hidden, jnp.int32(valid_len - 1))

    def _ensure_kv(self, needed: int):
        """Static cache sized to a pow2 bucket; grows by copy when exceeded."""
        cap = bucket(needed, 256)
        if self._kv is None:
            self._kv = dec_mod.make_kv_cache(self.cfg, cap, self.kv_dtype)
            self._kv_cap = cap
        elif cap > self._kv_cap:
            new = dec_mod.make_kv_cache(self.cfg, cap, self.kv_dtype)
            new = new.at[:, :, : self._kv_cap].set(self._kv)
            self._kv = new
            self._kv_cap = cap
        return self._kv

    def _get_spec_chunk(self):
        """Speculative decode chunk (--spec): same contract as _decode_chunk
        but each device iteration drafts SPEC_DRAFT tokens with the int8
        weights and verifies them in ONE bf16 forward over the block.

        Exactness by construction: every emitted token is the bf16 verify
        forward's argmax over the TRUE accepted prefix — the draft only
        decides how many positions share one weight pass.  The draft writes
        its (approximate) KV rows first and the verify forward overwrites
        the same rows with exact bf16 K/V, so ONE cache serves both: the
        draft reads exact history, and rows past the accepted prefix are
        rewritten by the next iteration before anything attends them.
        """
        if self._spec_chunk_jit is not None:
            return self._spec_chunk_jit
        cfg = self.cfg
        from smolvision_tpu.ops.common import rms_norm
        from smolvision_tpu.ops.quant import embed_rows, proj, wdtype

        eos = jnp.asarray(list(EOS_TOKEN_IDS), dtype=jnp.int32)
        n = SPEC_DRAFT

        def spec_chunk(p, pq, token, pos, kv, n_steps):
            # buf oversized: the last block's n+1 tokens may start at
            # DECODE_CHUNK-1; the consumer reads buf[:count]
            buf = jnp.zeros((DECODE_CHUNK + n + 1,), dtype=jnp.int32)

            def cond(c):
                out, _, _, _, _, _, done = c
                return (~done) & (out < n_steps) & (out < DECODE_CHUNK)

            def body(c):
                out, it, tok, pos_, kv_, buf_, _ = c
                # draft phase: n int8 steps (unrolled; n is small + static)
                d = jnp.zeros((n,), jnp.int32)
                td = tok
                for j in range(n):
                    td, kv_ = dec_mod.decode_step(
                        pq, cfg, td, pos_ + jnp.int32(j), kv_, greedy=True)
                    d = d.at[j].set(td)
                # verify phase: one bf16 forward over [tok, d_0..d_{n-1}];
                # g[i] = exact greedy successor of the prefix through row i
                seq = jnp.concatenate([tok[None], d])
                embeds = embed_rows(p["embed"], seq)
                hidden, kv_ = dec_mod.decoder_forward(
                    p, cfg, embeds, pos_, jnp.int32(n + 1), kv_,
                    allow_flash=False)
                hn = rms_norm(hidden, p["final_norm"], cfg.rms_norm_eps)
                logits = proj("th,vh->tv", hn.astype(wdtype(p["lm_head"])),
                              p["lm_head"])
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                # accept the longest draft prefix the verify agrees with;
                # emit one extra token (the verify's own argmax after it)
                match = jnp.cumprod((d == g[:n]).astype(jnp.int32))
                a = jnp.sum(match)
                idx = jnp.arange(n + 1, dtype=jnp.int32)
                is_eos = jnp.any(g[:, None] == eos[None, :], axis=-1)
                eos_pos = jnp.min(jnp.where(is_eos & (idx <= a), idx,
                                            jnp.int32(n + 1)))
                e = jnp.minimum(jnp.minimum(a + 1, eos_pos + 1),
                                n_steps - out)
                e = jnp.maximum(e, 1)
                done = eos_pos + 1 <= e        # an emitted token is EOS
                buf_ = jax.lax.dynamic_update_slice(buf_, g, (out,))
                tok = g[e - 1]
                return (out + e, it + 1, tok, pos_ + e, kv_, buf_, done)

            out, it, tok, pos, kv, buf, done = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.int32(0), token, pos, kv, buf,
                 jnp.bool_(False)))
            return buf, out, tok, pos, kv, it

        self._spec_chunk_jit = jax.jit(spec_chunk, donate_argnums=(4,))
        return self._spec_chunk_jit

    # ------------------------------------------------------------------
    # encoder
    # ------------------------------------------------------------------

    def encode(self, samples: np.ndarray) -> Tuple[jnp.ndarray, int]:
        """Audio samples -> (audio embeddings [Acap, dec_hidden], n_tokens)."""
        mel = log_mel(samples)
        return self.encode_mel(mel)

    def encode_mel(self, mel: np.ndarray) -> Tuple[jnp.ndarray, int]:
        if self.cfg.family == "q25":
            return self._encode_mel_q25(mel)
        return self._encode_mel_qwen3(mel)

    def _encode_mel_qwen3(self, mel: np.ndarray) -> Tuple[jnp.ndarray, int]:
        cfg = self.cfg
        chunk = cfg.enc_chunk_size
        frames = mel.shape[1]
        n_full = frames // chunk
        rem = frames % chunk

        parts = []
        if n_full:
            chunks = np.stack(
                [mel[:, c * chunk : (c + 1) * chunk] for c in range(n_full)]
            ).astype(np.float32)
            ncap = bucket(n_full, 4)
            if ncap > n_full:
                chunks = np.concatenate(
                    [chunks, np.zeros((ncap - n_full, *chunks.shape[1:]), np.float32)])
            full_tok = self._conv_stem(self.enc_params, jnp.asarray(chunks))
            d = full_tok.shape[-1]
            parts.append(full_tok[:n_full].reshape(n_full * cfg.tokens_per_chunk, d))
        if rem:
            partial = mel[:, n_full * chunk :].astype(np.float32)[None]
            parts.append(self._conv_stem(self.enc_params, jnp.asarray(partial))[0])

        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        n_tokens = x.shape[0]
        wts = cfg.window_token_size()
        tcap = window_bucket(n_tokens, wts)
        if tcap > n_tokens:
            x = jnp.pad(x, ((0, tcap - n_tokens), (0, 0)))
        enc = self._enc_tf(self.enc_params, x, jnp.int32(n_tokens))
        return enc, n_tokens

    def _encode_mel_q25(self, mel: np.ndarray) -> Tuple[jnp.ndarray, int]:
        cfg = self.cfg
        x = self._q25_conv(self.enc_params, jnp.asarray(mel, dtype=jnp.float32))
        n_tokens = x.shape[0]
        tcap = window_bucket(n_tokens, cfg.q25_token_window)
        if tcap > n_tokens:
            x = jnp.pad(x, ((0, tcap - n_tokens), (0, 0)))
        proj = self._q25_tf(self.enc_params, x, jnp.int32(n_tokens))
        bos_eos = self.enc_params["audio_bos_eos"].astype(jnp.float32)
        out = jnp.concatenate([bos_eos[0:1], proj[:n_tokens], bos_eos[1:2]], axis=0)
        n_audio = n_tokens + 2
        acap = bucket(n_audio, 16)
        if acap > n_audio:
            out = jnp.pad(out, ((0, acap - n_audio), (0, 0)))
        return out, n_audio

    # ------------------------------------------------------------------
    # decoder primitives
    # ------------------------------------------------------------------

    def prefill_ids(self, ids: Sequence[int], audio: Optional[jnp.ndarray],
                    audio_start: int, n_audio: int, start_pos: int = 0,
                    greedy: bool = True):
        """Embed + splice + prefill.  Returns (token_or_logits, total_pos).

        ids are the FULL prompt ids; when start_pos > 0 (streaming KV reuse)
        only ids[start_pos:] are recomputed — callers pass the delta ids and
        absolute start_pos."""
        total = len(ids)
        tcap = bucket(total, 64)
        ids_arr = np.zeros(tcap, dtype=np.int32)
        ids_arr[:total] = np.asarray(ids, dtype=np.int32)
        if audio is None:
            audio = jnp.zeros((16, self.cfg.dec_hidden), dtype=jnp.float32)
            audio_start, n_audio = -1_000_000, 0
        embeds = self._build_embeds(self.dec_params, jnp.asarray(ids_arr), audio,
                                    jnp.int32(audio_start), jnp.int32(n_audio))
        if self.moe_offload:
            out = self._offload_forward_ids(embeds, start_pos, total, tcap, greedy)
            return out, start_pos + total
        kv = self._ensure_kv(start_pos + tcap + KV_HEADROOM)
        fn = self._prefill_greedy if greedy else self._prefill_logits
        out, self._kv = fn(self.dec_params, embeds, jnp.int32(start_pos),
                           jnp.int32(total), kv)
        return out, start_pos + total

    def prefill_with_reuse(self, ids: Sequence[int], audio: Optional[jnp.ndarray],
                           audio_start: int, n_audio: int, reused: int,
                           greedy: bool = True):
        """Prefill only the delta past `reused` already-cached KV positions
        (streaming KV reuse, qwen_asr.c:1807-1831; we key reuse on a host-side
        prompt signature instead of the reference's embedding-row memcmp).
        Returns (token_or_logits, total_len)."""
        total = len(ids)
        reused = max(0, min(reused, total - 1))
        delta_len = total - reused
        delta_cap = bucket(delta_len, 64)
        # embeds must cover [reused, reused+delta_cap) or dynamic_slice would
        # clamp the start and misalign the delta rows
        tcap = bucket(max(total, reused + delta_cap), 64)
        ids_arr = np.zeros(tcap, dtype=np.int32)
        ids_arr[:total] = np.asarray(ids, dtype=np.int32)
        if audio is None:
            audio = jnp.zeros((16, self.cfg.dec_hidden), dtype=jnp.float32)
            audio_start, n_audio = -1_000_000, 0
        embeds = self._build_embeds(self.dec_params, jnp.asarray(ids_arr), audio,
                                    jnp.int32(audio_start), jnp.int32(n_audio))
        delta = self._slice_rows(embeds, jnp.int32(reused), delta_cap)
        if self.moe_offload:
            out = self._offload_forward_ids(delta, reused, delta_len,
                                            delta_cap, greedy)
            return out, total
        kv = self._ensure_kv(reused + delta_cap + KV_HEADROOM)
        fn = self._prefill_greedy if greedy else self._prefill_logits
        out, self._kv = fn(self.dec_params, delta, jnp.int32(reused),
                           jnp.int32(delta_len), kv)
        return out, total

    def decode_greedy(self, first_token, start_pos: int, max_tokens: int,
                      on_token: Callable[[int], bool]) -> int:
        """Greedy loop in device chunks of DECODE_CHUNK tokens.

        `on_token(tid) -> keep_going` sees every token in order (the prefill
        token first); EOS tokens terminate the loop before the callback, like
        the C loop (qwen_asr.c:788-818).  Gating never alters the generated
        sequence, so running the model a chunk ahead of the host is exact.
        Returns the iteration count (C's n_generated)."""
        if self.moe_offload:
            return self._decode_greedy_offload(first_token, start_pos,
                                               max_tokens, on_token)
        from collections import deque

        pos = start_pos
        first_dev = jnp.asarray(first_token, dtype=jnp.int32)
        cur_dev = first_dev
        pos_dev = jnp.int32(pos)
        pending = deque()
        n = 0
        got_first = False

        def dispatch_and_fetch(steps, with_first):
            """One chunk dispatch + ONE host round trip (buf/count, and the
            first token's value piggybacked on the same fetch)."""
            nonlocal cur_dev, pos_dev, pos
            # --spec writes up to SPEC_DRAFT+1 rows past the last accepted
            # position (the unaccepted tail of the final verify block)
            kv = self._ensure_kv(pos + steps + 1
                                 + (SPEC_DRAFT + 1 if self.spec else 0))
            iters = None
            if self.spec:
                buf, count, cur_dev, pos_dev, kv, iters = \
                    self._get_spec_chunk()(
                        self.dec_params, self.dec_params_draft, cur_dev,
                        pos_dev, kv, jnp.int32(steps))
            else:
                buf, count, cur_dev, pos_dev, kv = self._decode_chunk(
                    self.dec_params, cur_dev, pos_dev, kv, jnp.int32(steps))
            self._kv = kv
            tail = (iters,) if iters is not None else ()
            if with_first:
                fv, buf_host, count, *tail = jax.device_get(
                    (first_dev, buf, count) + tail)
            else:
                fv = None
                buf_host, count, *tail = jax.device_get((buf, count) + tail)
            if tail:
                self.perf.spec_iters += int(tail[0])
                self.perf.spec_tokens += int(count)
            count = int(count)
            pos += count
            pending.extend(int(t) for t in buf_host[:count])
            return (int(fv) if fv is not None else None), count

        while n < max_tokens:
            if not got_first:
                # Dispatch the first chunk BEFORE fetching the first token:
                # its value rides back on the same round trip.  (If the first
                # token turns out to be EOS the chunk was wasted work — rare,
                # harmless: KV rows past EOS are overwritten/masked later.)
                steps = min(DECODE_CHUNK, max_tokens - n - 1)
                if steps > 0:
                    tid, _ = dispatch_and_fetch(steps, with_first=True)
                else:
                    tid = int(jax.device_get(first_dev))
                got_first = True
            elif pending:
                tid = pending.popleft()
            else:
                steps = min(DECODE_CHUNK, max_tokens - n)
                if steps <= 0:
                    break
                _, count = dispatch_and_fetch(steps, with_first=False)
                if count == 0:
                    break
                tid = pending.popleft()
            n += 1
            if tid in EOS_TOKEN_IDS:
                break
            if not on_token(tid):
                break
        return n

    def _offload_step(self, token: int, pos: int, greedy: bool = True):
        """One host-offload decode step (per-token host loop — the expert
        gather needs the router scores on host, see models/moe_offload.py)."""
        embed = self._embed_one(self.dec_params, jnp.int32(token))
        return self._offload_forward_ids(embed, pos, 1, 1, greedy)

    def _decode_greedy_offload(self, first_token, start_pos: int,
                               max_tokens: int, on_token) -> int:
        """Per-token greedy loop for the host-offload path; same callback /
        EOS / count semantics as the chunked decode_greedy."""
        pos = start_pos
        cur = int(jax.device_get(first_token))
        n = 0
        while n < max_tokens:
            n += 1
            if cur in EOS_TOKEN_IDS:
                break
            if not on_token(cur):
                break
            nxt = self._offload_step(cur, pos, greedy=True)
            pos += 1
            cur = int(jax.device_get(nxt))
        return n

    # ------------------------------------------------------------------
    # segment transcription (the core ASR path)
    # ------------------------------------------------------------------

    def transcribe_segment(self, samples: np.ndarray,
                           past_tokens: Optional[Sequence[int]] = None,
                           ) -> Tuple[str, int]:
        """One segment: mel -> encode -> prompt -> prefill -> greedy decode.
        Mirrors transcribe_segment (qwen_asr.c:649-842).  Returns
        (text, n_text_tokens); streams pieces via self.token_cb."""
        cfg = self.cfg
        seg_t0 = _now_ms()
        self.prepare_prompt()
        tok = self.tokenizer

        # NOTE: phases are NOT synced in production mode — every
        # block_until_ready is a ~27 ms tunnel round trip, so mel/enc/prefill
        # chain asynchronously into the decode loop and per-phase attribution
        # is only exact under --debug (verbose >= 2).
        sync = self.verbose >= 2

        t0 = _now_ms()
        mel = log_mel(samples)
        mel_ms = _now_ms() - t0

        t0 = _now_ms()
        audio, n_audio = self.encode_mel(mel)
        if sync:
            audio.block_until_ready()
        enc_ms = _now_ms() - t0

        ids, audio_start = prompt_mod.build_asr_prompt(
            cfg, n_audio, self._prompt_tokens, self._force_tokens, past_tokens)

        t0 = _now_ms()
        self.reset_kv()
        first, pos = self.prefill_ids(ids, audio, audio_start, n_audio)
        if sync:
            first.block_until_ready()
        prefill_ms = _now_ms() - t0

        t0 = _now_ms()
        state = {
            "past_asr_text": bool(self._force_tokens) or bool(past_tokens),
            "pieces": [],
            "n_text": 0,
        }

        def on_token(tid: int) -> bool:
            if tid == TOKEN_ASR_TEXT:
                state["past_asr_text"] = True
            elif state["past_asr_text"]:
                piece = tok.decode_piece(tid)
                state["pieces"].append(piece)
                state["n_text"] += 1
                if self.token_cb:
                    self.token_cb(piece)
            return True

        self.decode_greedy(first, pos, self.max_tokens, on_token)
        decode_ms = _now_ms() - t0

        text = b"".join(state["pieces"]).decode("utf-8", errors="replace").strip()
        self.perf.total_ms += _now_ms() - seg_t0
        self.perf.text_tokens += state["n_text"]
        self.perf.encode_ms += mel_ms + enc_ms
        self.perf.decode_ms += prefill_ms + decode_ms
        if self.verbose >= 2:
            print(f"  Mel: {mel.shape[1]} frames ({mel_ms:.0f} ms); "
                  f"Encoder: {n_audio} tokens ({enc_ms:.0f} ms); "
                  f"Prefill: {len(ids)} tokens ({prefill_ms:.0f} ms); "
                  f"Decode: {state['n_text']} text tokens ({decode_ms:.0f} ms)",
                  file=sys.stderr, flush=True)
            if self.spec and self.perf.spec_iters:
                p = self.perf
                print(f"  Spec: {p.spec_tokens} tokens / {p.spec_iters} "
                      f"verify iters = {p.spec_tokens / p.spec_iters:.2f} "
                      f"tokens/iter (draft {SPEC_DRAFT}, max "
                      f"{SPEC_DRAFT + 1})", file=sys.stderr, flush=True)
        return text, state["n_text"]

    # ------------------------------------------------------------------
    # thinker mode
    # ------------------------------------------------------------------

    def thinker_generate(self, samples: Optional[np.ndarray],
                         user_text: Optional[str]) -> Optional[str]:
        """Free-form generation (qwen_asr.c:2319-2612): audio or text prompt,
        temperature/top-k/repetition-penalty sampling, no <asr_text> gate."""
        if samples is None and not user_text:
            return None
        cfg = self.cfg
        self.perf.reset()
        total_t0 = _now_ms()
        self.prepare_prompt()
        tok = self.tokenizer
        self.perf.audio_ms = (len(samples) / 16.0) if samples is not None else 0.0

        enc_ms = 0.0
        if samples is not None and len(samples) > 0:
            t0 = _now_ms()
            audio, n_audio = self.encode(samples)
            audio.block_until_ready()
            enc_ms = _now_ms() - t0
            ids, audio_start = prompt_mod.build_thinker_audio_prompt(
                cfg, n_audio, self._prompt_tokens)
        else:
            audio, n_audio, audio_start = None, 0, -1
            user_tokens = tok.encode(user_text or "")
            ids = prompt_mod.build_thinker_text_prompt(cfg, user_tokens,
                                                       self._prompt_tokens)

        sampler_cls = CRefSampler if self.sampler_mode == "cref" else Sampler
        sampler = sampler_cls(self.temperature, self.repetition_penalty,
                              self.top_k, self.seed)
        use_sampling = not sampler.greedy

        t0 = _now_ms()
        self.reset_kv()
        out, pos = self.prefill_ids(ids, audio, audio_start, n_audio,
                                    greedy=not use_sampling)
        prefill_ms = _now_ms() - t0

        pieces: List[bytes] = []
        n_text = 0
        t0 = _now_ms()
        max_tokens = self.thinker_max_tokens

        if use_sampling and self.moe_offload:
            # Host-offload: per-token loop, host-side sampler (same math as
            # the device chunk: per-occurrence repetition penalty, temp,
            # top-k, multinomial — runtime/sampling.py).
            token = sampler.sample(np.asarray(out))
            n = 0
            while n < max_tokens:
                n += 1
                if token in EOS_TOKEN_IDS:
                    break
                piece = tok.decode_piece(token)
                if piece:
                    pieces.append(piece)
                    n_text += 1
                    if self.token_cb:
                        self.token_cb(piece)
                sampler.observe(token)
                logits = self._offload_step(token, pos, greedy=False)
                pos += 1
                token = sampler.sample(np.asarray(logits))
        elif use_sampling and self.sampler_mode == "cref":
            # Parity arm: per-token host loop — every logits vector comes to
            # host and CRefSampler replays the C engine's sample_token
            # arithmetic + drand48 stream exactly (the device chunk below is
            # a different family: power-form penalty, XLA softmax, PRNGKey).
            token = sampler.sample(np.asarray(out))
            n = 0
            while n < max_tokens:
                n += 1
                if token in EOS_TOKEN_IDS:
                    break
                piece = tok.decode_piece(token)
                if piece:
                    pieces.append(piece)
                    n_text += 1
                    if self.token_cb:
                        self.token_cb(piece)
                sampler.observe(token)
                kv = self._ensure_kv(pos + 2)
                logits, self._kv = self._step_logits(
                    self.dec_params, jnp.int32(token), jnp.int32(pos), kv)
                pos += 1
                token = sampler.sample(np.asarray(logits))
        elif use_sampling:
            # First token sampled on host (one logits download); the rest run
            # in device-side sampled chunks — no per-token logits transfers.
            token = sampler.sample(np.asarray(out))
            from collections import deque

            pending = deque([token])
            cur_dev = jnp.asarray(token, dtype=jnp.int32)
            pos_dev = jnp.int32(pos)
            recent = jnp.zeros((64,), dtype=jnp.int32)
            n_recent = jnp.int32(0)
            key = jax.random.PRNGKey(self.seed)
            n = 0
            while n < max_tokens:
                if not pending:
                    steps = min(DECODE_CHUNK, max_tokens - n)
                    if steps <= 0:
                        break
                    kv = self._ensure_kv(pos + steps + 1)
                    (buf, count, cur_dev, pos_dev, kv, recent, n_recent,
                     key) = self._sample_chunk(
                        self.dec_params, cur_dev, pos_dev, kv, recent,
                        n_recent, key, jnp.float32(self.temperature),
                        jnp.float32(self.repetition_penalty),
                        jnp.int32(steps), self.top_k)
                    self._kv = kv
                    buf_host, count = jax.device_get((buf, count))
                    count = int(count)
                    if count == 0:
                        break
                    pos += count
                    pending.extend(int(t) for t in buf_host[:count])
                tid = pending.popleft()
                n += 1
                if tid in EOS_TOKEN_IDS:
                    break
                piece = tok.decode_piece(tid)
                if piece:
                    pieces.append(piece)
                    n_text += 1
                    if self.token_cb:
                        self.token_cb(piece)
        else:
            def on_token(tid: int) -> bool:
                nonlocal n_text
                piece = tok.decode_piece(tid)
                if piece:
                    pieces.append(piece)
                    n_text += 1
                    if self.token_cb:
                        self.token_cb(piece)
                return True

            self.decode_greedy(out, pos, max_tokens, on_token)

        decode_ms = _now_ms() - t0
        self.perf.total_ms = _now_ms() - total_t0
        self.perf.text_tokens = n_text
        self.perf.encode_ms = enc_ms
        self.perf.decode_ms = prefill_ms + decode_ms
        return b"".join(pieces).decode("utf-8", errors="replace")
