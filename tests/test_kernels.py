"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smolvision_tpu.kernels import jnp_reference as ref
from smolvision_tpu.kernels.flash_attention import (
    causal_cache_flash_attention,
    window_flash_attention,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("W,S,H,D,valid", [
    (2, 104, 4, 64, [104, 40]),
    (1, 16, 2, 32, [16]),
    (3, 8, 1, 8, [8, 5, 1]),
])
def test_window_flash_matches_reference(W, S, H, D, valid):
    rng = np.random.default_rng(0)
    q = _rand(rng, W, S, H, D)
    k = _rand(rng, W, S, H, D)
    v = _rand(rng, W, S, H, D)
    kv_lens = jnp.asarray(valid, dtype=jnp.int32)

    got = window_flash_attention(q, k, v, kv_lens)

    # reference: per-window equal ids, pad keys excluded via unique neg ids
    T = W * S
    ids = np.repeat(np.arange(W), S)
    for w, n in enumerate(valid):
        pad_rows = np.arange(T)[(ids == w)][n:]
        ids_pad = ids.copy()
    # build window ids with pads unique-negative
    wid = np.repeat(np.arange(W), S)
    for w, n in enumerate(valid):
        base = w * S
        for j in range(n, S):
            wid[base + j] = -(base + j + 1)
    expect = ref.windowed_attention(
        q.reshape(T, H, D), k.reshape(T, H, D), v.reshape(T, H, D),
        jnp.asarray(wid, dtype=jnp.int32)).reshape(W, S, H, D)

    # compare only valid rows (pad-row outputs are unspecified)
    for w, n in enumerate(valid):
        np.testing.assert_allclose(
            np.asarray(got)[w, :n], np.asarray(expect)[w, :n],
            rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T,K,H,KH,D,start", [
    (128, 256, 4, 2, 64, 0),
    (128, 512, 8, 4, 32, 100),
    (256, 256, 2, 1, 128, 0),
])
def test_causal_cache_flash_matches_reference(T, K, H, KH, D, start):
    rng = np.random.default_rng(1)
    q = _rand(rng, T, H, D)
    k_cache = np.asarray(rng.standard_normal((K, KH, D)), dtype=np.float32)
    v_cache = np.asarray(rng.standard_normal((K, KH, D)), dtype=np.float32)
    valid = start + T

    got = causal_cache_flash_attention(
        q, jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.int32(start), jnp.int32(valid), gqa_groups=H // KH)

    positions = jnp.arange(start, start + T)
    expect = ref.causal_attention(q, jnp.asarray(k_cache), jnp.asarray(v_cache),
                                  positions, jnp.int32(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_causal_cache_flash_ignores_stale_rows():
    """Rows beyond kv_valid_len (stale garbage) must not leak in."""
    rng = np.random.default_rng(2)
    T, K, H, KH, D = 128, 256, 2, 2, 32
    q = _rand(rng, T, H, D)
    k1 = np.asarray(rng.standard_normal((K, KH, D)), np.float32)
    v1 = np.asarray(rng.standard_normal((K, KH, D)), np.float32)
    k2 = k1.copy()
    v2 = v1.copy()
    k2[T:] = 999.0  # stale garbage beyond valid region
    v2[T:] = -999.0
    a = causal_cache_flash_attention(q, jnp.asarray(k1), jnp.asarray(v1),
                                     jnp.int32(0), jnp.int32(T), gqa_groups=1)
    b = causal_cache_flash_attention(q, jnp.asarray(k2), jnp.asarray(v2),
                                     jnp.int32(0), jnp.int32(T), gqa_groups=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("K,H,KH,D,start,kvmin", [
    (256, 4, 2, 64, 100, 0),
    (512, 8, 4, 128, 0, 0),       # empty cache: self-attention only
    (512, 2, 2, 32, 511, 0),
    (256, 4, 2, 64, 100, 30),     # left-padded batch layout
])
def test_decode_flash_matches_two_part(K, H, KH, D, start, kvmin):
    import dataclasses
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.kernels.flash_attention import decode_flash_attention
    from smolvision_tpu.models.qwen3_decoder import _attention_two_part

    cfg = dataclasses.replace(QWEN3_ASR_06B, dec_heads=H, dec_kv_heads=KH,
                              dec_head_dim=D)
    rng = np.random.default_rng(5)
    q = _rand(rng, 1, H, D)
    k_new = _rand(rng, 1, KH, D)
    v_new = _rand(rng, 1, KH, D)
    k_cache = _rand(rng, K, KH, D)
    v_cache = _rand(rng, K, KH, D)

    got = decode_flash_attention(q[0], k_new[0], v_new[0], k_cache, v_cache,
                                 jnp.int32(start), jnp.int32(kvmin),
                                 gqa_groups=H // KH)
    expect = _attention_two_part(q, k_new, v_new, k_cache, v_cache,
                                 jnp.int32(start), cfg, kv_min=jnp.int32(kvmin))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,T,H,KH,D,kvmins", [
    (2, 128, 4, 2, 64, (0, 5)),
    (3, 256, 16, 8, 128, (0, 17, 130)),
])
def test_batched_causal_flash_matches_two_part(B, T, H, KH, D, kvmins):
    """Batched fresh-block causal kernel (serving prefill) vs the batched
    two-part reference with an empty cache prefix."""
    import dataclasses
    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.kernels.flash_attention import batched_causal_flash_attention
    from smolvision_tpu.models.qwen3_decoder import _batched_attention_two_part

    cfg = dataclasses.replace(QWEN3_ASR_06B, dec_heads=H, dec_kv_heads=KH,
                              dec_head_dim=D)
    rng = np.random.default_rng(11)
    q = _rand(rng, B, T, H, D)
    k = _rand(rng, B, T, KH, D)
    v = _rand(rng, B, T, KH, D)
    kv_min = jnp.asarray(list(kvmins) + [0] * (B - len(kvmins)), jnp.int32)[:B]
    k_cache = jnp.zeros((B, KH, 128, D), jnp.float32)
    v_cache = jnp.zeros((B, KH, 128, D), jnp.float32)

    got = batched_causal_flash_attention(q, k, v, kv_min, gqa_groups=H // KH,
                                         block_q=128, block_k=128)
    expect = _batched_attention_two_part(q, k, v, k_cache, v_cache,
                                         jnp.int32(0), cfg, kv_min=kv_min)
    # rows < kv_min[b] are pad garbage in both; compare valid rows only
    got = np.asarray(got)
    expect = np.asarray(expect)
    for b in range(B):
        lo = int(kv_min[b])
        np.testing.assert_allclose(got[b, lo:], expect[b, lo:],
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,T,K,H,KH,D,start", [
    (2, 128, 256, 4, 2, 64, 192),    # cache part [0,192) + block
    (3, 64, 128, 4, 2, 64, 0),       # no cache (start 0): pure causal block
    (2, 192, 320, 4, 4, 64, 256),    # MHA (G=1), 64-granular sizes
])
def test_batched_cache_flash_matches_two_part(B, T, K, H, KH, D, start):
    """Batched delta-prefill kernel (block vs cache + itself) vs the
    two-part XLA reference, incl. per-row kv_min and the natural-layout
    prompt_max/region_start end-pad mask."""
    import dataclasses

    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.kernels.flash_attention import (
        batched_cache_flash_attention,
    )
    from smolvision_tpu.models.qwen3_decoder import _batched_attention_two_part

    cfg = dataclasses.replace(QWEN3_ASR_06B, dec_heads=H, dec_kv_heads=KH,
                              dec_head_dim=D)
    rng = np.random.default_rng(13)
    q = _rand(rng, B, T, H, D)
    k_new = _rand(rng, B, T, KH, D)
    v_new = _rand(rng, B, T, KH, D)
    k_cache = _rand(rng, B, KH, K, D)
    v_cache = _rand(rng, B, KH, K, D)
    kv_min = jnp.asarray([0, 3, 7][:B] + [0] * max(0, B - 3), jnp.int32)[:B]

    cases = [(None, None)]
    if start > 0:
        cases += [
            (jnp.asarray(rng.integers(start // 2, start + 1, B), jnp.int32),
             jnp.int32(K)),                   # scalar region_start, no region
            (jnp.asarray(rng.integers(1, start + 1, B), jnp.int32),
             jnp.asarray(rng.integers(start // 2, K, B), jnp.int32)),  # per-row
        ]
    for pm, rs in cases:
        got = batched_cache_flash_attention(
            q, k_new, v_new, k_cache, v_cache, jnp.int32(start), kv_min,
            prompt_max=pm, region_start=rs, gqa_groups=H // KH)
        expect = _batched_attention_two_part(
            q, k_new, v_new, k_cache, v_cache, jnp.int32(start), cfg,
            kv_min=kv_min, prompt_max=pm, region_start=rs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=2e-5, atol=2e-5)


def test_batched_cache_flash_random_shape_sweep():
    """Seeded random-shape sweep of the batched delta-prefill kernel vs the
    two-part XLA reference: randomized (B, T, K, H, KH, D, start) within
    the kernel's granularity constraints plus random per-row kv_min /
    prompt_max / region_start — guards mask/grid edge combinations the
    fixed parametrize tuples cannot enumerate."""
    import dataclasses

    from smolvision_tpu.config import QWEN3_ASR_06B
    from smolvision_tpu.kernels.flash_attention import (
        batched_cache_flash_attention,
    )
    from smolvision_tpu.models.qwen3_decoder import _batched_attention_two_part

    rng = np.random.default_rng(29)
    for trial in range(6):
        B = int(rng.integers(1, 4))
        # T up to 512 with block_q down to 64 makes (G*T)//bq exceed G —
        # q-tiles that SPLIT a G-folded group (the production W=512
        # multistream shape); T <= 192 alone never leaves the 1-tile case
        T = 64 * int(rng.integers(1, 9))
        block_q = int(rng.choice([64, 128, 256]))
        KH = int(rng.choice([1, 2, 4]))
        G = int(rng.choice([1, 2, 4]))
        H = KH * G
        D = int(rng.choice([32, 64]))
        start = 64 * int(rng.integers(0, 4))
        K = start + T + 64 * int(rng.integers(0, 3))
        cfg = dataclasses.replace(QWEN3_ASR_06B, dec_heads=H, dec_kv_heads=KH,
                                  dec_head_dim=D)
        q = _rand(rng, B, T, H, D)
        k_new = _rand(rng, B, T, KH, D)
        v_new = _rand(rng, B, T, KH, D)
        k_cache = _rand(rng, B, KH, K, D)
        v_cache = _rand(rng, B, KH, K, D)
        kv_min = jnp.asarray(rng.integers(0, max(start, 1), B), jnp.int32)
        if start > 0:
            pm = jnp.asarray(rng.integers(1, start + 1, B), jnp.int32)
            rs = jnp.asarray(rng.integers(start // 2, K + 1, B), jnp.int32)
        else:
            pm, rs = None, None
        got = batched_cache_flash_attention(
            q, k_new, v_new, k_cache, v_cache, jnp.int32(start), kv_min,
            prompt_max=pm, region_start=rs, gqa_groups=G, block_q=block_q)
        expect = _batched_attention_two_part(
            q, k_new, v_new, k_cache, v_cache, jnp.int32(start), cfg,
            kv_min=kv_min, prompt_max=pm, region_start=rs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=2e-5, atol=2e-5,
            err_msg=f"trial {trial}: B={B} T={T} K={K} H={H} KH={KH} "
                    f"D={D} start={start}")
