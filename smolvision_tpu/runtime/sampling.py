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


class Drand48:
    """Exact twin of POSIX drand48(): the 48-bit LCG
    X_{n+1} = (0x5DEECE66D * X_n + 0xB) mod 2^48, seeded like srand48(s)
    (high 32 bits of X <- low 32 bits of s, low 16 bits <- 0x330E) and
    returning the NEW X / 2^48 as a double — both steps exact in Python
    integer/f64 arithmetic (48 mantissa bits fit in f64's 53).  Pinned
    bit-for-bit against libc's own drand48 via ctypes in
    tests/test_sampling_c_exact.py.  Used by CRefSampler to replay the
    reference engine's sampling stream (qwen_asr.c:2306,2510) when the
    parity build's srand48 is pinned via the QWEN_SEED source patch
    (tools/cross_parity_c.py:_seed_patch)."""

    _A = 0x5DEECE66D
    _C = 0xB
    _MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.x = ((int(seed) & 0xFFFFFFFF) << 16) | 0x330E

    def random(self) -> float:
        self.x = (self._A * self.x + self._C) & self._MASK
        return self.x / 281474976710656.0  # / 2^48, exact


class CRefSampler:
    """Arithmetic-family twin of the reference sample_token
    (qwen_asr.c:2250-2313) for cross-engine SAMPLED-mode parity: every
    float op replays the C engine's f32/f64 sequence —

      * repetition penalty applied PER OCCURRENCE in window order with a
        fresh sign test each time (scalar f32 divide/multiply chain, not
        the power form Sampler uses — (x/p)/p != x/(p*p) in f32),
      * temperature as an elementwise f32 divide,
      * top-k via the k-th-largest value, strict `< kth` mask to -1e30f,
      * qwen_softmax's f32 family (qwen_asr_kernels.c:1012-1029): f32 max,
        the SAME libc expf the binary calls (via _libc_expf — glibc's expf
        is ~1 ULP off the f64-exp detour on ~0.05% of inputs), SEQUENTIAL
        f32 sum (np.cumsum's running accumulator), multiply by 1/sum,
      * the multinomial draw: double cumsum over the f32 probs vs one
        drand48 double, first index with cum >= r, fall through to V-1.

    Same host interface as Sampler.  Exactness vs the actual COMPILED
    reference sampler (built -O2 -march=native -ffast-math, where e.g.
    reassociation could reorder the softmax sum) is established
    empirically by tools/fuzz_sampler_c.py against a shim that exports
    sample_token from the parity source build."""

    def __init__(self, temperature: float = 0.7, repetition_penalty: float = 1.1,
                 top_k: int = 40, seed: int = 0):
        self.temperature = float(temperature)
        self.repetition_penalty = float(repetition_penalty)
        self.top_k = int(top_k)
        self.rng = Drand48(seed)
        self.recent: list = []

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0

    def observe(self, token: int) -> None:
        self.recent.append(token)
        if len(self.recent) > REP_WINDOW:
            self.recent = self.recent[-REP_WINDOW:]

    def transform(self, logits: np.ndarray) -> np.ndarray:
        logits = np.asarray(logits, dtype=np.float32).copy()
        vocab = logits.shape[0]
        p = np.float32(self.repetition_penalty)
        if self.repetition_penalty != 1.0 and self.recent:
            # -freciprocal-math (in the reference's shipped -ffast-math
            # build) hoists 1/penalty out of the loop: v/p compiles to
            # v*(1/p).  Confirmed by tools/fuzz_sampler_c.py: the direct-
            # divide twin flipped a ULP tie under top_k=1.
            rp = np.float32(1.0) / p
            for tid in self.recent:  # per occurrence, in window order
                if 0 <= tid < vocab:
                    v = logits[tid]
                    logits[tid] = v * rp if v > np.float32(0.0) else v * p
        if self.temperature > 0.0 and self.temperature != 1.0:
            logits *= np.float32(1.0) / np.float32(self.temperature)
        if 0 < self.top_k < vocab:
            kth = np.partition(logits, vocab - self.top_k)[vocab - self.top_k]
            logits[logits < kth] = np.float32(-1e30)
        return logits

    def sample(self, logits: np.ndarray) -> int:
        logits = self.transform(logits)
        vocab = logits.shape[0]
        m = logits.max()
        e = _libc_expf(logits - m)
        s = np.cumsum(e, dtype=np.float32)[-1]  # sequential f32 accumulation
        probs = e * (np.float32(1.0) / s)
        r = self.rng.random()
        cum = np.cumsum(probs.astype(np.float64))
        return min(int(np.searchsorted(cum, r, side="left")), vocab - 1)


def _libc_expf(x: np.ndarray) -> np.ndarray:
    """Elementwise f32 exp through the SAME libc expf symbol the reference
    binary calls (qwen_softmax's per-element expf) — glibc's expf is ~1 ULP
    off the correctly-rounded f64-exp detour on ~0.05% of inputs, which is
    exactly the drift a knife-edge multinomial draw could turn into a token
    flip.  Native fast path (sv_expf_vec, built without -ffast-math so it
    stays scalar libc calls); ctypes-per-element fallback."""
    import ctypes

    from smolvision_tpu.utils import native as native_mod

    out = np.ascontiguousarray(x, dtype=np.float32).copy()
    lib = native_mod.load()
    if lib is not None and hasattr(lib, "sv_expf_vec"):
        lib.sv_expf_vec(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        out.shape[0])
        return out
    global _LIBM
    if _LIBM is None:
        import ctypes.util
        _LIBM = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
        _LIBM.expf.restype = ctypes.c_float
        _LIBM.expf.argtypes = [ctypes.c_float]
    for i in range(out.shape[0]):
        out[i] = _LIBM.expf(ctypes.c_float(float(out[i])))
    return out


_LIBM = None


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
