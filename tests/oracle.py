"""Independent torch/numpy oracle for cross-checking the JAX pipeline.

A deliberately simple, eager implementation of the model semantics in
MODEL.md (per-chunk Conv2D, windowed encoder attention, GQA decoder with
Q/K norms + NeoX RoPE, SwiGLU / MoE FFN, greedy decode).  Structured
differently from the JAX code (per-layer loops, torch convs, growing KV
lists) so that agreement is meaningful.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import torch
import torch.nn.functional as F

from smolvision_tpu.config import (
    EOS_TOKEN_IDS,
    ModelConfig,
    TOKEN_ASR_TEXT,
    conv_out_width,
)
from smolvision_tpu.runtime import prompt as prompt_mod


# Referee mode (docs/PARITY_C.md): float64 weights + activations adjudicate
# thin-argmax divergences between arithmetic families (C f32 vs TPU bf16) —
# whichever engine the f64 trajectory sides with holds the "true" argmax;
# the other arm's flip is rounding noise of its family.  Checkpoint weights
# are bf16/f32 on disk, so the f32->f64 upcast is exact.
ORACLE_DTYPE = torch.float32


def set_dtype(dt):
    """torch.float32 (default) or torch.float64 (the referee)."""
    global ORACLE_DTYPE
    ORACLE_DTYPE = dt


def _get(reader, name):
    arr = np.asarray(reader.get(name))
    return torch.tensor(arr.astype(np.float32)).to(ORACLE_DTYPE)


def sinusoidal_pe(length, channels):
    half = channels // 2
    inc = math.log(10000.0) / (half - 1)
    inv = torch.exp(-inc * torch.arange(half).to(ORACLE_DTYPE))
    t = torch.arange(length).to(ORACLE_DTYPE)[:, None] * inv[None, :]
    return torch.cat([torch.sin(t), torch.cos(t)], dim=1)


def oracle_encoder(reader, cfg: ModelConfig, mel: np.ndarray) -> torch.Tensor:
    """mel [128, F] -> [T, enc_output_dim]."""
    p = "thinker.audio_tower"
    x_chunks = []
    chunk = cfg.enc_chunk_size
    melt = torch.tensor(mel.astype(np.float32)).to(ORACLE_DTYPE)
    w1 = _get(reader, f"{p}.conv2d1.weight")
    b1 = _get(reader, f"{p}.conv2d1.bias")
    w2 = _get(reader, f"{p}.conv2d2.weight")
    b2 = _get(reader, f"{p}.conv2d2.bias")
    w3 = _get(reader, f"{p}.conv2d3.weight")
    b3 = _get(reader, f"{p}.conv2d3.bias")
    for s in range(0, mel.shape[1], chunk):
        piece = melt[:, s : s + chunk][None, None]
        h = F.gelu(F.conv2d(piece, w1, b1, stride=2, padding=1), approximate="tanh")
        h = F.gelu(F.conv2d(h, w2, b2, stride=2, padding=1), approximate="tanh")
        h = F.gelu(F.conv2d(h, w3, b3, stride=2, padding=1), approximate="tanh")
        b, c, fr, tt = h.shape
        h = h.permute(0, 3, 1, 2).reshape(tt, c * fr)
        x_chunks.append(h)

    conv_out = _get(reader, f"{p}.conv_out.weight")
    x = torch.cat(x_chunks, 0) @ conv_out.T
    d = cfg.enc_d_model
    off = 0
    for ch in x_chunks:
        n = ch.shape[0]
        x[off : off + n] += sinusoidal_pe(n, d)
        off += n

    T = x.shape[0]
    wts = cfg.window_token_size()
    n_heads, hd = cfg.enc_heads, cfg.enc_head_dim
    for i in range(cfg.enc_layers):
        lp = f"{p}.layers.{i}"
        ln_w = _get(reader, f"{lp}.self_attn_layer_norm.weight")
        ln_b = _get(reader, f"{lp}.self_attn_layer_norm.bias")
        xn = F.layer_norm(x, (d,), ln_w, ln_b, eps=1e-5)
        q = xn @ _get(reader, f"{lp}.self_attn.q_proj.weight").T + _get(reader, f"{lp}.self_attn.q_proj.bias")
        k = xn @ _get(reader, f"{lp}.self_attn.k_proj.weight").T + _get(reader, f"{lp}.self_attn.k_proj.bias")
        v = xn @ _get(reader, f"{lp}.self_attn.v_proj.weight").T + _get(reader, f"{lp}.self_attn.v_proj.bias")
        attn = torch.zeros_like(q)
        for ws in range(0, T, wts):
            we = min(ws + wts, T)
            qw = q[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            kw = k[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            vw = v[ws:we].view(-1, n_heads, hd).transpose(0, 1)
            scores = qw @ kw.transpose(-1, -2) / math.sqrt(hd)
            probs = torch.softmax(scores, dim=-1)
            out = (probs @ vw).transpose(0, 1).reshape(we - ws, n_heads * hd)
            attn[ws:we] = out
        x = x + attn @ _get(reader, f"{lp}.self_attn.out_proj.weight").T + _get(reader, f"{lp}.self_attn.out_proj.bias")
        ln2_w = _get(reader, f"{lp}.final_layer_norm.weight")
        ln2_b = _get(reader, f"{lp}.final_layer_norm.bias")
        xn = F.layer_norm(x, (d,), ln2_w, ln2_b, eps=1e-5)
        mid = F.gelu(xn @ _get(reader, f"{lp}.fc1.weight").T + _get(reader, f"{lp}.fc1.bias"), approximate="tanh")
        x = x + mid @ _get(reader, f"{lp}.fc2.weight").T + _get(reader, f"{lp}.fc2.bias")

    x = F.layer_norm(x, (d,), _get(reader, f"{p}.ln_post.weight"), _get(reader, f"{p}.ln_post.bias"), eps=1e-5)
    x = F.gelu(x @ _get(reader, f"{p}.proj1.weight").T + _get(reader, f"{p}.proj1.bias"), approximate="tanh")
    x = x @ _get(reader, f"{p}.proj2.weight").T + _get(reader, f"{p}.proj2.bias")
    return x


def _rms(x, w, eps=1e-6):
    var = x.pow(2).mean(-1, keepdim=True)
    return w * (x * torch.rsqrt(var + eps))


def _rope(x, positions, theta):
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (torch.arange(0, hd, 2).to(ORACLE_DTYPE) / hd))
    ang = positions.to(ORACLE_DTYPE)[:, None] * inv[None, :]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos()[:, None, :], emb.sin()[:, None, :]
    half = hd // 2
    rot = torch.cat([-x[..., half:], x[..., :half]], dim=-1)
    return x * cos + rot * sin


class OracleDecoder:
    def __init__(self, reader, cfg: ModelConfig):
        self.r = reader
        self.cfg = cfg
        self.embed = _get(reader, "thinker.model.embed_tokens.weight")
        self.final_norm = _get(reader, "thinker.model.norm.weight")
        if cfg.tied_embeddings:
            self.lm_head = self.embed
        else:
            self.lm_head = _get(reader, "thinker.lm_head.weight")
        self.kv: List = [None] * cfg.dec_layers

    def _layer(self, h, i, pos):
        cfg = self.cfg
        lp = f"thinker.model.layers.{i}"
        r = self.r
        T = h.shape[0]
        heads, kvh, hd = cfg.dec_heads, cfg.dec_kv_heads, cfg.dec_head_dim
        xn = _rms(h, _get(r, f"{lp}.input_layernorm.weight"), cfg.rms_norm_eps)
        q = xn @ _get(r, f"{lp}.self_attn.q_proj.weight").T
        k = xn @ _get(r, f"{lp}.self_attn.k_proj.weight").T
        v = xn @ _get(r, f"{lp}.self_attn.v_proj.weight").T
        if cfg.dec_qkv_bias:
            q = q + _get(r, f"{lp}.self_attn.q_proj.bias")
            k = k + _get(r, f"{lp}.self_attn.k_proj.bias")
            v = v + _get(r, f"{lp}.self_attn.v_proj.bias")
        q = q.view(T, heads, hd)
        k = k.view(T, kvh, hd)
        if cfg.dec_qk_norm:
            q = _rms(q, _get(r, f"{lp}.self_attn.q_norm.weight"), cfg.rms_norm_eps)
            k = _rms(k, _get(r, f"{lp}.self_attn.k_norm.weight"), cfg.rms_norm_eps)
        positions = torch.arange(pos, pos + T)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        v = v.view(T, kvh, hd)

        if self.kv[i] is None:
            kc, vc = k, v
        else:
            kc = torch.cat([self.kv[i][0], k], 0)
            vc = torch.cat([self.kv[i][1], v], 0)
        self.kv[i] = (kc, vc)

        S = kc.shape[0]
        g = heads // kvh
        kx = kc.repeat_interleave(g, dim=1)
        vx = vc.repeat_interleave(g, dim=1)
        scores = torch.einsum("thd,shd->hts", q, kx) / math.sqrt(hd)
        mask = torch.arange(S)[None, :] <= positions[:, None]
        scores = scores.masked_fill(~mask[None], float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        attn = torch.einsum("hts,shd->thd", probs, vx).reshape(T, heads * hd)
        h = h + attn @ _get(r, f"{lp}.self_attn.o_proj.weight").T

        xn = _rms(h, _get(r, f"{lp}.post_attention_layernorm.weight"), cfg.rms_norm_eps)
        # per-layer expert presence, like the reference's tensor-name probe
        # (qwen_asr_decoder.c:91-125) — sparse_step > 1 interleaves dense FFNs
        if cfg.is_moe and r.has(f"{lp}.mlp.gate.weight"):
            router = _get(r, f"{lp}.mlp.gate.weight")
            scores = xn @ router.T
            topw, topi = torch.topk(scores, cfg.num_experts_per_tok, dim=-1)
            topw = torch.softmax(topw, dim=-1)
            if cfg.norm_topk_prob:
                topw = topw / (topw.sum(-1, keepdim=True) + 1e-20)
            out = torch.zeros_like(xn)
            for t in range(T):
                for kk in range(cfg.num_experts_per_tok):
                    e = int(topi[t, kk])
                    gw = _get(r, f"{lp}.mlp.experts.{e}.gate_proj.weight")
                    uw = _get(r, f"{lp}.mlp.experts.{e}.up_proj.weight")
                    dw = _get(r, f"{lp}.mlp.experts.{e}.down_proj.weight")
                    xe = xn[t]
                    out[t] += topw[t, kk] * ((F.silu(xe @ gw.T) * (xe @ uw.T)) @ dw.T)
            h = h + out
        else:
            gate = F.silu(xn @ _get(r, f"{lp}.mlp.gate_proj.weight").T)
            up = xn @ _get(r, f"{lp}.mlp.up_proj.weight").T
            h = h + (gate * up) @ _get(r, f"{lp}.mlp.down_proj.weight").T
        return h

    def forward(self, embeds: torch.Tensor, pos: int) -> torch.Tensor:
        h = embeds
        for i in range(self.cfg.dec_layers):
            h = self._layer(h, i, pos)
        h = _rms(h, self.final_norm, self.cfg.rms_norm_eps)
        return h @ self.lm_head.T  # [T, vocab]


def oracle_transcribe_tokens(reader, cfg: ModelConfig, mel: np.ndarray,
                             max_tokens: int = 16,
                             past_tokens: Optional[Sequence[int]] = None,
                             force_tokens: Sequence[int] = (),
                             prompt_tokens: Sequence[int] = ()) -> List[int]:
    """Greedy token ids (raw, un-gated) for an ASR prompt around `mel`."""
    enc = oracle_encoder(reader, cfg, mel)
    n_audio = enc.shape[0]
    ids, audio_start = prompt_mod.build_asr_prompt(
        cfg, n_audio, prompt_tokens, force_tokens, past_tokens)
    dec = OracleDecoder(reader, cfg)
    embeds = dec.embed[torch.tensor(ids)]
    embeds[audio_start : audio_start + n_audio] = enc
    with torch.no_grad():
        logits = dec.forward(embeds, 0)
    token = int(logits[-1].argmax())
    out = [token]
    pos = len(ids)
    with torch.no_grad():
        for _ in range(max_tokens - 1):
            if token in EOS_TOKEN_IDS:
                break
            logits = dec.forward(dec.embed[token][None], pos)
            token = int(logits[0].argmax())
            out.append(token)
            pos += 1
    return out
