"""Pin the host sampler (runtime/sampling.Sampler — the MoE-offload thinker
path) against the device transform (sampling.transform_logits_jnp — the
jitted thinker chunk) on a grid of settings and recent-window states.

Both implement sample_token's math (qwen_asr.c:2250-2313).  The PRNGs
necessarily differ (numpy Generator vs jax categorical), so the pin is on
the full transformed distribution: if penalty/temperature/top-k semantics
drift apart in ANY way, the probabilities diverge and this fails.  The draw
itself is separately pinned for reproducibility per seed.
"""

import numpy as np
import pytest

from smolvision_tpu.runtime.sampling import (REP_WINDOW, Sampler,
                                             transform_logits_jnp)

V = 512


def _device_transform(logits, recent_tokens, penalty, temp, top_k):
    import jax.numpy as jnp

    recent = np.full(REP_WINDOW, -1, np.int32)
    n = len(recent_tokens)
    assert n <= REP_WINDOW
    recent[:n] = recent_tokens
    out = transform_logits_jnp(jnp.asarray(logits), jnp.asarray(recent),
                               jnp.int32(n), jnp.float32(penalty),
                               jnp.float32(temp), top_k)
    return np.asarray(out, np.float32)


@pytest.mark.parametrize("temp", [0.7, 1.0, 1.3])
@pytest.mark.parametrize("penalty", [1.0, 1.1, 1.5])
@pytest.mark.parametrize("top_k", [0, 40])
def test_transform_grid(temp, penalty, top_k):
    rng = np.random.default_rng(7)
    logits = (rng.standard_normal(V) * 3).astype(np.float32)
    # repeats (penalty^count), a negative-logit token, fresh tokens
    recent = [5, 5, 5, 17, 400, 401, 402, 17]

    host = Sampler(temperature=temp, repetition_penalty=penalty, top_k=top_k)
    for t in recent:
        host.observe(t)
    h = host.transform(logits)
    d = _device_transform(logits, recent, penalty, temp, top_k)

    live = h > -1e29          # compare the top-k mask sets exactly
    assert (live == (d > -1e29)).all()
    np.testing.assert_allclose(d[live], h[live], rtol=1e-5, atol=1e-5)
    assert int(np.argmax(h)) == int(np.argmax(d))
    # full softmax distributions agree
    hp = np.exp(h - h.max()); hp /= hp.sum()
    dp = np.exp(d - d.max()); dp /= dp.sum()
    np.testing.assert_allclose(dp, hp, rtol=1e-4, atol=1e-7)


def test_transform_window_overflow():
    """Past-window tokens must stop being penalized on both sides."""
    rng = np.random.default_rng(3)
    logits = (rng.standard_normal(V) * 2).astype(np.float32)
    recent = [9] * 10 + list(range(100, 100 + REP_WINDOW))  # all 9s evicted

    host = Sampler(temperature=1.0, repetition_penalty=1.3, top_k=0)
    for t in recent:
        host.observe(t)
    h = host.transform(logits)
    d = _device_transform(logits, recent[-REP_WINDOW:], 1.3, 1.0, 0)
    np.testing.assert_allclose(d, h, rtol=1e-5, atol=1e-5)
    # every 9 slid out of the 64-token window: no residual penalty remains
    assert h[9] == pytest.approx(logits[9], rel=1e-6)


def test_sequence_agreement():
    """6-step sequence: argmax trajectories through the transforms agree
    even as the windows fill differently shaped state."""
    rng = np.random.default_rng(11)
    table = (rng.standard_normal((6, V)) * 3).astype(np.float32)
    host = Sampler(temperature=0.7, repetition_penalty=1.1, top_k=40)
    recent = []
    for step in range(6):
        h = host.transform(table[step])
        d = _device_transform(table[step], recent, 1.1, 0.7, 40)
        assert int(np.argmax(h)) == int(np.argmax(d))
        tok = int(np.argmax(h))
        host.observe(tok)
        recent.append(tok)


def test_host_draw_reproducible_per_seed():
    rng = np.random.default_rng(0)
    logits = (rng.standard_normal(V) * 3).astype(np.float32)
    for seed in (0, 1, 1234):
        a = Sampler(seed=seed).sample(logits)
        b = Sampler(seed=seed).sample(logits)
        assert a == b
    assert Sampler(seed=0).sample(logits) != Sampler(seed=99).sample(logits) \
        or True  # different seeds MAY collide; reproducibility is the pin


def test_sampler_clamps_cumsum_shortfall():
    """f32 cumsum can total < 1.0; a draw above it must clamp to the last
    token id (the reference's fall-through, qwen_asr.c:2304-2312), not
    return vocab_size."""
    from smolvision_tpu.runtime.sampling import Sampler

    s = Sampler(temperature=1.0, top_k=0, seed=0)

    class _AlwaysTop:
        def random(self):
            return 1.0 - 1e-16

    s.rng = _AlwaysTop()
    logits = np.zeros(1024, np.float32)  # uniform: cum[-1] rounds near 1.0
    tok = s.sample(logits.copy())
    assert 0 <= tok <= 1023
