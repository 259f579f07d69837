"""CRefSampler (runtime/sampling.py) — the sampled-mode cross-engine parity
arm — pinned at three levels:

1. Drand48 vs libc's own drand48/srand48 via ctypes: bit-exact stream.
2. The arithmetic-family building blocks the twin relies on:
   np f64-exp rounded to f32 == libc expf (glibc's expf is correctly
   rounded, so the double-rounding detour is exact), and np.cumsum(f32)
   is a sequential running accumulator (qwen_softmax's sum order).
3. CRefSampler token-for-token vs the reference's COMPILED sample_token
   (qwen_asr.c:2250-2313, built -O2 -march=native -ffast-math and exported
   by cross_parity_c.ensure_sample_oracle) across the fuzz regimes that
   caught the -freciprocal-math divergence (tools/fuzz_sampler_c.py).

Levels 1-2 need only libc/numpy; level 3 builds from the reference source
copy and is skip-gated like the other C-parity tests.
"""

import ctypes
import ctypes.util
import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from smolvision_tpu.runtime.sampling import CRefSampler, Drand48  # noqa: E402

LIBC = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
LIBC.drand48.restype = ctypes.c_double
LIBC.srand48.argtypes = [ctypes.c_long]
LIBM = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
LIBM.expf.restype = ctypes.c_float
LIBM.expf.argtypes = [ctypes.c_float]


@pytest.mark.parametrize("seed", [0, 1, 12345, 2**31 - 1, -7])
def test_drand48_bit_exact_vs_libc(seed):
    LIBC.srand48(ctypes.c_long(seed))
    ours = Drand48(seed)
    for _ in range(1000):
        want = LIBC.drand48()
        got = ours.random()
        assert got == want  # exact f64 equality, no tolerance


def test_libc_expf_helper_bit_matches_libm():
    """_libc_expf (native sv_expf_vec fast path AND the ctypes fallback)
    must be bit-identical to scalar libc expf — the f64-exp detour is NOT
    (glibc expf is ~1 ULP off it on ~0.05% of inputs; that discovery is
    why this helper exists)."""
    from smolvision_tpu.runtime import sampling as sp
    from smolvision_tpu.utils import native as native_mod

    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(-100, 1, 20000).astype(np.float32),
        rng.uniform(-0.01, 0.01, 2000).astype(np.float32),
        np.float32([-1e30, -87.3365, -87.34, -103.97, -104.0, 0.0,
                    -0.0, 1.0, -1.0, 88.0]),  # under/overflow edges
    ])
    want = np.array([LIBM.expf(ctypes.c_float(float(x))) for x in xs],
                    dtype=np.float32)
    got = sp._libc_expf(xs)
    assert np.array_equal(got, want)
    # On glibc the f64-exp detour differs from expf on ~0.05% of inputs —
    # the discovery that motivated _libc_expf.  That is a property of the
    # HOST libm, not of repo code (a correctly-rounded expf, e.g. musl,
    # would make them equal), so it is informational, not an assert.
    detour = np.exp(xs.astype(np.float64)).astype(np.float32)
    if np.array_equal(detour, want):
        import warnings

        warnings.warn("host expf == f32(exp_f64) on all probed inputs — "
                      "_libc_expf is redundant on this libm (parity still "
                      "holds)", stacklevel=1)
    if native_mod.load() is not None and hasattr(native_mod.load(),
                                                 "sv_expf_vec"):
        # exercise the ctypes fallback too
        lib, native_mod._LIB = native_mod._LIB, None
        try:
            got_fb = sp._libc_expf(xs[:500])
            assert np.array_equal(got_fb, want[:500])
        finally:
            native_mod._LIB = lib


def test_cumsum_f32_is_sequential_accumulation():
    rng = np.random.default_rng(1)
    for n in (3, 100, 5000):
        x = rng.normal(0, 1, n).astype(np.float32) ** 3  # wide magnitudes
        cs = np.cumsum(x, dtype=np.float32)
        acc = np.float32(0.0)
        seq = np.empty(n, np.float32)
        for i in range(n):
            acc = np.float32(acc + x[i])
            seq[i] = acc
        assert np.array_equal(cs, seq)


# ---------------------------------------------------------------------------
# level 3: vs the compiled reference sampler

oracle_gate = pytest.mark.skipif(
    os.environ.get("SMOLVISION_SKIP_C_PARITY") == "1"
    or not os.path.isdir("/root/reference")
    or shutil.which("gcc") is None,
    reason="reference sources / toolchain unavailable",
)


@pytest.fixture(scope="module")
def oracle():
    from tools.fuzz_sampler_c import load_oracle

    return load_oracle()


@oracle_gate
@pytest.mark.parametrize("regime", ["normal", "quantized", "extreme", "zeros"])
def test_crefsampler_matches_compiled_sample_token(oracle, regime):
    from tools.fuzz_sampler_c import make_logits, oracle_sample

    rng = np.random.default_rng(hash(regime) % 2**31)
    for trial in range(24):
        vocab = int(rng.integers(8, 4096))
        temp = float(rng.choice([0.2, 0.7, 1.0, 1.3]))
        rep = float(rng.choice([0.9, 1.0, 1.1, 1.5]))
        top_k = int(rng.choice([0, 1, 5, 40, vocab]))
        n_recent = int(rng.integers(0, 65))
        recent = rng.integers(-3, vocab + 3, n_recent).astype(np.int32)
        seed48 = int(rng.integers(0, 2**31))
        oracle.oracle_srand48(ctypes.c_long(seed48))
        ours = CRefSampler(temp, rep, top_k, seed48)
        ours.recent = [int(t) for t in recent]
        for _ in range(4):  # chained draws: the drand48 stream stays lockstep
            logits = make_logits(rng, vocab, regime)
            got = ours.sample(logits)
            want = oracle_sample(oracle, logits, recent, temp, rep, top_k)
            assert got == want, (
                f"regime={regime} vocab={vocab} temp={temp} rep={rep} "
                f"top_k={top_k} n_recent={n_recent} seed48={seed48}: "
                f"{got} != {want}")
