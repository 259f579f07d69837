"""MoE decoder + Qwen2.5-Omni family vs the torch oracle (tiny checkpoints)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from smolvision_tpu.config import detect_config
from smolvision_tpu.io.safetensors import MultiSafetensors
from smolvision_tpu.ops.mel import log_mel
from smolvision_tpu.runtime import prompt as prompt_mod

from tests.oracle import OracleDecoder, sinusoidal_pe


@pytest.fixture(scope="module")
def moe_engine(tiny_moe_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    return Engine(tiny_moe_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)


@pytest.fixture(scope="module")
def q25_engine(tiny_q25_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    return Engine(tiny_q25_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)


def test_moe_config(tiny_moe_model_dir):
    cfg = detect_config(tiny_moe_model_dir)
    assert cfg.is_moe and cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.norm_topk_prob


def test_moe_decoder_matches_oracle(moe_engine, tiny_moe_model_dir):
    eng = moe_engine
    reader = MultiSafetensors(tiny_moe_model_dir)
    dec = OracleDecoder(reader, eng.cfg)
    ids = [151644, 8948, 198, 151645, 30, 40, 50]
    embeds = dec.embed[torch.tensor(ids)]
    with torch.no_grad():
        ref_logits = dec.forward(embeds, 0)[-1].numpy()
    eng.reset_kv()
    logits, pos = eng.prefill_ids(ids, None, -1, 0, greedy=False)
    got = np.asarray(logits)
    reader.close()
    np.testing.assert_allclose(got, ref_logits, rtol=3e-3, atol=3e-3)
    assert int(np.argmax(got)) == int(np.argmax(ref_logits))


def test_moe_decode_step_matches_oracle(moe_engine, tiny_moe_model_dir):
    """Single-token decode uses the GATHERED expert path — must match the
    oracle's per-token expert loop exactly."""
    import jax.numpy as jnp

    eng = moe_engine
    reader = MultiSafetensors(tiny_moe_model_dir)
    dec = OracleDecoder(reader, eng.cfg)
    ids = [151644, 8948, 198, 10, 20]
    embeds = dec.embed[torch.tensor(ids)]
    with torch.no_grad():
        dec.forward(embeds, 0)                      # oracle prefill
        ref = dec.forward(dec.embed[77][None], len(ids))[0].numpy()

    eng.reset_kv()
    eng.prefill_ids(ids, None, -1, 0)
    kv = eng._ensure_kv(len(ids) + 4)
    logits, kv = eng._step_logits(eng.dec_params, jnp.int32(77),
                                  jnp.int32(len(ids)), kv)
    eng._kv = kv
    got = np.asarray(logits)
    reader.close()
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)
    assert int(np.argmax(got)) == int(np.argmax(ref))


def test_moe_greedy_decode_deterministic(moe_engine):
    eng = moe_engine
    ids = list(range(200, 230))
    toks = []
    for _ in range(2):
        eng.reset_kv()
        first, pos = eng.prefill_ids(ids, None, -1, 0)
        out = []
        eng.decode_greedy(first, pos, 8, lambda t: (out.append(t) or True))
        toks.append(out)
    assert toks[0] == toks[1]


# ---------------------------------------------------------------------------
# Mixed dense/MoE (decoder_sparse_step > 1)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mixed_engine(tiny_moe_mixed_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    return Engine(tiny_moe_mixed_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32)


def test_mixed_config_and_stacks(mixed_engine, tiny_moe_mixed_model_dir):
    cfg = detect_config(tiny_moe_mixed_model_dir)
    assert cfg.is_moe and cfg.decoder_sparse_step == 2 and cfg.dec_layers == 4
    layers = mixed_engine.dec_params["layers"]
    # mixed stacks carry BOTH weight sets plus the per-layer mask
    assert layers["moe_mask"] is not None
    assert np.asarray(layers["moe_mask"]).tolist() == [False, True,
                                                       False, True]
    assert layers["w_gate_up"] is not None and layers["e_gate"] is not None


def test_mixed_prefill_matches_oracle(mixed_engine, tiny_moe_mixed_model_dir):
    eng = mixed_engine
    reader = MultiSafetensors(tiny_moe_mixed_model_dir)
    dec = OracleDecoder(reader, eng.cfg)
    ids = [151644, 8948, 198, 151645, 30, 40, 50]
    embeds = dec.embed[torch.tensor(ids)]
    with torch.no_grad():
        ref_logits = dec.forward(embeds, 0)[-1].numpy()
    eng.reset_kv()
    logits, pos = eng.prefill_ids(ids, None, -1, 0, greedy=False)
    got = np.asarray(logits)
    reader.close()
    np.testing.assert_allclose(got, ref_logits, rtol=3e-3, atol=3e-3)
    assert int(np.argmax(got)) == int(np.argmax(ref_logits))


def test_mixed_greedy_tokens_match_oracle(mixed_engine,
                                          tiny_moe_mixed_model_dir):
    """Greedy token ids through prefill + decode steps — the decode path uses
    the gathered-expert branch on MoE layers and the fused dense FFN on the
    others, both under the scanned lax.cond dispatch."""
    eng = mixed_engine
    reader = MultiSafetensors(tiny_moe_mixed_model_dir)
    dec = OracleDecoder(reader, eng.cfg)
    ids = [151644, 8948, 198, 10, 20, 30]
    with torch.no_grad():
        h = dec.forward(dec.embed[torch.tensor(ids)], 0)
        tok = int(h[-1].argmax())
        ref = [tok]
        pos = len(ids)
        for _ in range(6):
            h = dec.forward(dec.embed[tok][None], pos)
            tok = int(h[0].argmax())
            ref.append(tok)
            pos += 1
    eng.reset_kv()
    first, pos = eng.prefill_ids(ids, None, -1, 0)
    got = []   # decode_greedy's callback sees every token, the first included
    eng.decode_greedy(int(np.asarray(first)), pos, 7,
                      lambda t: (got.append(t) or True))
    reader.close()
    assert got[:7] == ref[:7]


def test_mixed_offload_supported(tiny_moe_mixed_model_dir):
    """Round 4 closed the round-3 guard: mixed sparse_step composes with
    --moe-offload (MoE layers stream from host, dense layers resident).
    Full offload-vs-resident equivalence: tests/test_moe_offload.py
    test_mixed_offload_*."""
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(tiny_moe_mixed_model_dir, moe_offload=True)
    assert eng.moe_offload
    assert any(eng.expert_store.is_moe) and not all(eng.expert_store.is_moe)


# ---------------------------------------------------------------------------
# Qwen2.5-Omni
# ---------------------------------------------------------------------------

def oracle_q25_encoder(reader, cfg, mel: np.ndarray) -> torch.Tensor:
    """Conv1D stem + global PE + 100-token windows + single proj + bos/eos
    (independent torch implementation of qwen25_omni_encoder.c:174-310)."""
    import math

    p = "thinker.audio_tower"

    def g(name):
        return torch.tensor(np.asarray(reader.get(name)).astype(np.float32))

    x = torch.tensor(mel.astype(np.float32))[None]          # [1, 128, T]
    x = F.gelu(F.conv1d(x, g(f"{p}.conv1.weight"), g(f"{p}.conv1.bias"),
                        stride=1, padding=1), approximate="tanh")
    x = F.gelu(F.conv1d(x, g(f"{p}.conv2.weight"), g(f"{p}.conv2.bias"),
                        stride=2, padding=1), approximate="tanh")
    x = x[0].T.contiguous()                                  # [T2, d]
    T2, d = x.shape
    x = x + sinusoidal_pe(T2, d)

    n_heads = cfg.enc_heads
    hd = cfg.enc_head_dim
    win = cfg.q25_token_window
    for i in range(cfg.enc_layers):
        lp = f"{p}.layers.{i}"
        xn = F.layer_norm(x, (d,), g(f"{lp}.self_attn_layer_norm.weight"),
                          g(f"{lp}.self_attn_layer_norm.bias"), eps=1e-5)
        q = xn @ g(f"{lp}.self_attn.q_proj.weight").T + g(f"{lp}.self_attn.q_proj.bias")
        k = xn @ g(f"{lp}.self_attn.k_proj.weight").T  # K has NO bias
        v = xn @ g(f"{lp}.self_attn.v_proj.weight").T + g(f"{lp}.self_attn.v_proj.bias")
        attn = torch.zeros_like(q)
        for ws in range(0, T2, win):
            we = min(ws + win, T2)
            qw = q[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            kw = k[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            vw = v[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            probs = torch.softmax(qw @ kw.transpose(-1, -2) / math.sqrt(hd), dim=-1)
            attn[ws:we] = (probs @ vw).transpose(0, 1).reshape(we - ws, -1)
        x = x + attn @ g(f"{lp}.self_attn.out_proj.weight").T + g(f"{lp}.self_attn.out_proj.bias")
        xn = F.layer_norm(x, (d,), g(f"{lp}.final_layer_norm.weight"),
                          g(f"{lp}.final_layer_norm.bias"), eps=1e-5)
        mid = F.gelu(xn @ g(f"{lp}.fc1.weight").T + g(f"{lp}.fc1.bias"), approximate="tanh")
        x = x + mid @ g(f"{lp}.fc2.weight").T + g(f"{lp}.fc2.bias")

    x = F.layer_norm(x, (d,), g(f"{p}.ln_post.weight"), g(f"{p}.ln_post.bias"), eps=1e-5)
    x = x @ g(f"{p}.proj.weight").T + g(f"{p}.proj.bias")
    bos_eos = g(f"{p}.audio_bos_eos_token.weight")
    return torch.cat([bos_eos[0:1], x, bos_eos[1:2]], dim=0)


def test_q25_config(tiny_q25_model_dir):
    cfg = detect_config(tiny_q25_model_dir)
    assert cfg.family == "q25"
    assert cfg.dec_qkv_bias and not cfg.dec_qk_norm and not cfg.tied_embeddings
    assert cfg.vocab_size == 152064


def test_q25_encoder_matches_oracle(q25_engine, tiny_q25_model_dir, speech_like_audio):
    eng = q25_engine
    mel = log_mel(speech_like_audio)
    enc, n_audio = eng.encode_mel(mel)
    reader = MultiSafetensors(tiny_q25_model_dir)
    ref = oracle_q25_encoder(reader, eng.cfg, mel).numpy()
    reader.close()
    assert n_audio == ref.shape[0]  # includes bos/eos rows
    got = np.asarray(enc)[:n_audio]
    assert np.max(np.abs(got - ref)) < 5e-3, np.max(np.abs(got - ref))


@pytest.mark.parametrize("t2_target", [5, 99, 100, 101, 200, 201])
def test_q25_encoder_window_edges(q25_engine, tiny_q25_model_dir, t2_target):
    """Bucket-edge sweep for the q25 100-token attention windows
    (qwen25_omni_encoder.c:221-227): token counts below / at / one past the
    window boundary, one and two windows deep, plus a tiny sub-window clip.
    Pins the partial-window attention and the ceil(T/2) conv-stride
    arithmetic against the torch oracle at every edge."""
    from smolvision_tpu.ops.mel import num_frames

    frames = 2 * t2_target - 1          # conv k3s2p1: ceil(T/2) tokens
    n = frames * 160
    while num_frames(n) < frames:
        n += 160
    while num_frames(n) > frames:
        n -= 160
    rng = np.random.default_rng(t2_target)
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * np.sin(2 * np.pi * 467 * t)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
    mel = log_mel(audio)
    assert mel.shape[1] == frames

    eng = q25_engine
    enc, n_audio = eng.encode_mel(mel)
    reader = MultiSafetensors(tiny_q25_model_dir)
    ref = oracle_q25_encoder(reader, eng.cfg, mel).numpy()
    reader.close()
    assert ref.shape[0] == t2_target + 2     # audio_bos + tokens + audio_eos
    assert n_audio == ref.shape[0]
    got = np.asarray(enc)[:n_audio]
    assert np.max(np.abs(got - ref)) < 5e-3, np.max(np.abs(got - ref))


def test_q25_thinker_tokens_match_oracle(q25_engine, tiny_q25_model_dir, speech_like_audio):
    """Full Q25 audio-thinker path: greedy tokens vs oracle."""
    eng = q25_engine
    mel = log_mel(speech_like_audio)
    reader = MultiSafetensors(tiny_q25_model_dir)

    enc_ref = oracle_q25_encoder(reader, eng.cfg, mel)
    n_audio = enc_ref.shape[0]
    ids, audio_start = prompt_mod.build_thinker_audio_prompt(eng.cfg, n_audio)
    dec = OracleDecoder(reader, eng.cfg)
    embeds = dec.embed[torch.tensor(ids)]
    embeds[audio_start : audio_start + n_audio] = enc_ref
    with torch.no_grad():
        logits = dec.forward(embeds, 0)
    token = int(logits[-1].argmax())
    ref = [token]
    pos = len(ids)
    with torch.no_grad():
        for _ in range(7):
            if token in (151643, 151645):
                break
            logits = dec.forward(dec.embed[token][None], pos)
            token = int(logits[0].argmax())
            ref.append(token)
            pos += 1
    reader.close()

    audio, n_audio2 = eng.encode_mel(mel)
    assert n_audio2 == n_audio
    eng.reset_kv()
    first, pos = eng.prefill_ids(ids, audio, audio_start, n_audio)
    got = []
    eng.decode_greedy(first, pos, 8, lambda t: (got.append(t) or True))
    ref_trim = []
    for t in ref[:8]:
        if t in (151643, 151645):
            break
        ref_trim.append(t)
    assert got == ref_trim, (got, ref_trim)


def test_moe_capacity_dispatch_matches_dense():
    """Capacity dispatch (30B prefill path) == dense one-hot routing when no
    expert exceeds its capacity."""
    import dataclasses

    import jax.numpy as jnp
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm

    T, K, E, H, MI = 32, 2, 16, 64, 48
    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=False)
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    lp = {
        "e_gate": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_up": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_down": jnp.asarray(rng.standard_normal((E, H, MI)).astype(np.float32) * 0.1),
    }
    # balanced round-robin assignment: every expert gets exactly T*K/E slots
    top_idx = jnp.asarray([[(t * K + k) % E for k in range(K)] for t in range(T)],
                          dtype=jnp.int32)
    top_w = jnp.asarray(rng.random((T, K)).astype(np.float32))

    got, n_dropped = dm._moe_capacity_dispatch(
        xc, lp, top_idx, top_w, cfg, jnp.ones((T,), bool))
    assert int(n_dropped) == 0

    import jax
    from smolvision_tpu.ops.common import silu
    route = jnp.sum(jax.nn.one_hot(top_idx, E, dtype=jnp.float32)
                    * top_w[..., None], axis=1)
    gate = jnp.einsum("th,eih->tei", xc, lp["e_gate"])
    up = jnp.einsum("th,eih->tei", xc, lp["e_up"])
    act = silu(gate) * up
    down = jnp.einsum("tei,ehi->teh", act, lp["e_down"])
    expect = jnp.einsum("te,teh->th", route, down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_moe_capacity_dispatch_drops_overflow():
    """Tokens past an expert's capacity contribute zero (standard capacity
    semantics) — everything routed to one expert with tiny capacity."""
    import dataclasses

    import jax.numpy as jnp
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm

    T, K, E, H, MI = 64, 1, 16, 32, 16
    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=False)
    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    lp = {
        "e_gate": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32)),
        "e_up": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32)),
        "e_down": jnp.asarray(rng.standard_normal((E, H, MI)).astype(np.float32)),
    }
    top_idx = jnp.zeros((T, K), jnp.int32)       # all -> expert 0
    top_w = jnp.ones((T, K), jnp.float32)
    out, n_dropped = dm._moe_capacity_dispatch(
        xc, lp, top_idx, top_w, cfg, jnp.ones((T,), bool))
    out = np.asarray(out)
    C = min(T, int(np.ceil(T * K / E * dm.MOE_CAPACITY_FACTOR)))  # = 8
    assert C < T
    # first C tokens computed, the rest dropped to zero — and the drop
    # COUNTER reports them (the _moe_ffn caller falls back to dense on it)
    assert int(n_dropped) == T - C
    assert np.all(np.abs(out[C:]) == 0.0)
    assert np.all(np.abs(out[:C]).sum(axis=1) > 0.0)


def test_moe_ffn_adversarial_imbalance_is_exact():
    """_moe_ffn with E >= MOE_DISPATCH_MIN_EXPERTS and adversarially
    unbalanced routing (router biased so every token picks the same experts)
    must EXACTLY match the dense one-hot path — the drop counter triggers
    the lax.cond fallback, so capacity overflow never silently diverges
    (reference computes every selected expert, qwen_asr_decoder.c:362-451)."""
    import dataclasses

    import jax.numpy as jnp
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm

    T, K, E, H, MI = 64, 2, 16, 32, 16
    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=True)
    rng = np.random.default_rng(2)
    # strictly positive activations + strongly positive router rows 0/1 ->
    # every token routes to experts {0, 1}; capacity C = ceil(T*K/E*2) = 16
    # < T, so dispatch would drop and the cond must take the dense branch
    x = jnp.asarray((np.abs(rng.standard_normal((T, H))) + 0.1).astype(np.float32))
    router = rng.standard_normal((E, H)).astype(np.float32) * 0.01
    router[0] += 3.0
    router[1] += 2.5
    lp = {
        "router": jnp.asarray(router),
        "e_gate": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_up": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_down": jnp.asarray(rng.standard_normal((E, H, MI)).astype(np.float32) * 0.1),
    }
    got = np.asarray(dm._moe_ffn(x, lp, cfg))

    scores = jnp.einsum("th,eh->te", x, lp["router"])
    import jax
    top_vals, top_idx = jax.lax.top_k(scores, K)
    assert np.all(np.asarray(top_idx) < 2), "routing not adversarial"
    top_w = jax.nn.softmax(top_vals, axis=-1)
    top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
    expect = np.asarray(dm._moe_dense(x, lp, top_idx, top_w, cfg))
    np.testing.assert_array_equal(got, expect)


def test_moe_capacity_dispatch_pads_dont_crowd_out_real_tokens():
    """Left-pad rows (valid=False) get no queue rank: real tokens keep their
    expert slots even when identical pad rows flood the same experts
    (ADVICE r1: pads outranked real tokens in the cumsum capacity rank)."""
    import dataclasses

    import jax.numpy as jnp
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm

    T, K, E, H, MI = 64, 1, 16, 32, 16
    n_pad = 56  # pads first (left-padded layout), 8 real tokens
    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=False)
    rng = np.random.default_rng(3)
    xc = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    lp = {
        "e_gate": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_up": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_down": jnp.asarray(rng.standard_normal((E, H, MI)).astype(np.float32) * 0.1),
    }
    top_idx = jnp.zeros((T, K), jnp.int32)        # everyone wants expert 0
    top_w = jnp.ones((T, K), jnp.float32)
    valid = jnp.arange(T) >= n_pad
    out, n_dropped = dm._moe_capacity_dispatch(xc, lp, top_idx, top_w, cfg, valid)
    out = np.asarray(out)
    C = min(T, int(np.ceil(T * K / E * dm.MOE_CAPACITY_FACTOR)))  # = 8
    # all 8 real tokens fit in expert 0's capacity of 8; no VALID drops
    assert int(n_dropped) == 0
    assert np.all(np.abs(out[n_pad:]).sum(axis=1) > 0.0)
    # pad rows receive nothing
    assert np.all(np.abs(out[:n_pad]) == 0.0)


def test_moe_ffn_ep_owner_compute_matches_gather():
    """ep=True (expert-parallel owner-compute: dense one-hot) computes the
    same FFN output as the single-chip decode gather path — it is the same
    math routed through all-experts einsums so GSPMD can psum per-shard
    contributions (docs/MOE_30B_PLAN.md Plan A decode)."""
    import dataclasses

    import jax.numpy as jnp
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.models import qwen3_decoder as dm

    T, K, E, H, MI = 2, 2, 8, 32, 16
    cfg = dataclasses.replace(QWEN3_ASR_06B, is_moe=True, num_experts=E,
                              num_experts_per_tok=K, moe_intermediate=MI,
                              norm_topk_prob=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    lp = {
        "router": jnp.asarray(rng.standard_normal((E, H)).astype(np.float32)),
        "e_gate": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_up": jnp.asarray(rng.standard_normal((E, MI, H)).astype(np.float32) * 0.1),
        "e_down": jnp.asarray(rng.standard_normal((E, H, MI)).astype(np.float32) * 0.1),
    }
    gather = np.asarray(dm._moe_ffn(x, lp, cfg, ep=False))
    owner = np.asarray(dm._moe_ffn(x, lp, cfg, ep=True))
    np.testing.assert_allclose(owner, gather, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dur", [1.9, 2.0, 2.06, 3.94, 4.06])
def test_q25_encoder_window_edge_sweep(q25_engine, tiny_q25_model_dir, dur):
    """Bucket-edge sweep for the q25 100-TOKEN windows (VERDICT r2 weak #6):
    durations straddling the 1- and 2-window boundaries (tokens =
    (frames+1)//2; window edges at ~2 s and ~4 s).  Encoder output must
    match the torch oracle at every edge — exercises the pow2 window
    bucketing, the global-PE offsets and the bos/eos row placement at
    lengths the single 3 s case never hits."""
    rng = np.random.default_rng(int(dur * 100))
    sr = 16000
    t = np.arange(int(sr * dur)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 200 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
           + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    eng = q25_engine
    mel = log_mel(sig)
    enc, n_audio = eng.encode_mel(mel)
    reader = MultiSafetensors(tiny_q25_model_dir)
    ref = oracle_q25_encoder(reader, eng.cfg, mel).numpy()
    reader.close()
    assert n_audio == ref.shape[0], (n_audio, ref.shape[0])
    got = np.asarray(enc)[:n_audio]
    assert np.max(np.abs(got - ref)) < 5e-3, \
        (dur, float(np.max(np.abs(got - ref))))
