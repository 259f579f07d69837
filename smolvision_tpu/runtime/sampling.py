"""Token sampling for thinker mode (host side).

Matches sample_token (qwen_asr.c:2250-2313): repetition penalty over a
64-token window (divide positive / multiply negative logits), temperature,
top-k partial selection, softmax, multinomial draw.  Unlike the reference
(which seeds from wall clock, qwen_asr.c:2510) the RNG is seeded
deterministically by default so runs are reproducible.
"""

from __future__ import annotations

import numpy as np

REP_WINDOW = 64


class Sampler:
    def __init__(self, temperature: float = 0.7, repetition_penalty: float = 1.1,
                 top_k: int = 40, seed: int = 0):
        self.temperature = float(temperature)
        self.repetition_penalty = float(repetition_penalty)
        self.top_k = int(top_k)
        self.rng = np.random.default_rng(seed)
        self.recent: list = []

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0

    def observe(self, token: int) -> None:
        self.recent.append(token)
        if len(self.recent) > REP_WINDOW:
            self.recent = self.recent[-REP_WINDOW:]

    def transform(self, logits: np.ndarray) -> np.ndarray:
        """Repetition penalty + temperature + top-k (softmax-ready logits).
        Must agree with transform_logits_jnp below — pinned by
        tests/test_sampling_pin.py."""
        logits = np.asarray(logits, dtype=np.float32).copy()
        vocab = logits.shape[0]

        if self.repetition_penalty != 1.0 and self.recent:
            ids = np.asarray([t for t in self.recent if 0 <= t < vocab], dtype=np.int64)
            if ids.size:
                # PER OCCURRENCE, like the reference's loop (qwen_asr.c:2255-2263):
                # a token seen n times is penalized penalty^n (sign never flips,
                # so the exponent form is exact) — matching the device-side
                # _sample_chunk counts formulation.
                uniq, counts = np.unique(ids, return_counts=True)
                factor = self.repetition_penalty ** counts.astype(np.float32)
                vals = logits[uniq]
                logits[uniq] = np.where(vals > 0.0, vals / factor, vals * factor)

        if self.temperature > 0.0 and self.temperature != 1.0:
            logits /= self.temperature

        if 0 < self.top_k < vocab:
            kth = np.partition(logits, -self.top_k)[-self.top_k]
            logits[logits < kth] = -1e30
        return logits

    def sample(self, logits: np.ndarray) -> int:
        logits = self.transform(logits)
        logits -= logits.max()
        probs = np.exp(logits)
        probs /= probs.sum()
        r = self.rng.random()
        cum = np.cumsum(probs)
        # f32 cum[-1] can round below r (~1e-7/draw): clamp to the last id,
        # as the reference's fall-through does (qwen_asr.c:2304-2312)
        return min(int(np.searchsorted(cum, r, side="left")), len(probs) - 1)


def transform_logits_jnp(logits, recent, n_recent, penalty, temp, top_k: int):
    """Device-side twin of Sampler.sample's logits transform (repetition
    penalty over the recent ring buffer, temperature, top-k mask) — the ONE
    implementation both the host offload path (Sampler) and the jitted
    thinker chunk (engine._sample_chunk) must agree with; pinned against the
    numpy math in tests/test_sampling_pin.py.  Reference math:
    sample_token, qwen_asr.c:2250-2313.

    logits [V] f32; recent [REP] int32 ring buffer; n_recent traced count;
    top_k static.  Returns transformed logits (softmax-ready)."""
    import jax
    import jax.numpy as jnp

    V = logits.shape[0]
    REP = recent.shape[0]
    valid = (jnp.arange(REP) < n_recent)
    counts = jnp.zeros((V,), jnp.float32).at[
        jnp.where(valid, recent, V)].add(1.0, mode="drop")
    factor = jnp.power(penalty, counts)
    logits = jnp.where(logits > 0, logits / factor, logits * factor)
    logits = logits / jnp.maximum(temp, 1e-6)
    if 0 < top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][-1]
        logits = jnp.where(logits < kth, -1e30, logits)
    return logits
