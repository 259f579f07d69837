"""Native C host runtime vs the pure-Python fallbacks (exactness contracts)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    lib_path = os.path.join(REPO, "native", "libsmolvision_host.so")
    if not os.path.exists(lib_path):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build native lib: {r.stderr.decode()[:500]}")
    from smolvision_tpu.utils import native

    if not native.available():
        pytest.skip("native lib not loadable")
    return native


def test_native_resampler_matches_python(native_lib):
    from smolvision_tpu.io.wav import _bessel_i0  # python path pieces
    import smolvision_tpu.io.wav as wav

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(44100) * 0.3).astype(np.float32)

    got = native_lib.resample_sinc(x, 44100, 16000)

    os.environ["SMOLVISION_NATIVE"] = "0"
    try:
        # force python path by calling through resample_sinc with native off
        import importlib
        from smolvision_tpu.utils import native as nat
        nat._TRIED, nat._LIB = True, None
        ref = wav.resample_sinc(x, 44100, 16000)
    finally:
        os.environ.pop("SMOLVISION_NATIVE", None)
        nat._TRIED, nat._LIB = False, None

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_native_bpe_matches_python(native_lib, tiny_model_dir):
    from smolvision_tpu.text.tokenizer import load_tokenizer

    tok = load_tokenizer(tiny_model_dir)
    assert tok._native_table is not None

    texts = ["the theme and the thing", "language English", "héllo wörld 音声",
             "a" * 500, "th" * 200]
    for text in texts:
        native_ids = tok.encode(text)  # native path (lib available)
        # force python merge
        raw = text.encode("utf-8")
        from smolvision_tpu.text.tokenizer import _BYTE_ENCODER

        mapped = [_BYTE_ENCODER[b] for b in raw]
        symbols = tok._merge(mapped)
        python_ids = [tok.vocab[s] for s in symbols]
        assert native_ids == python_ids, text
        assert tok.decode(native_ids) == text


def test_native_silence_mask_sane(native_lib):
    sr = 16000
    rng = np.random.default_rng(1)
    speech = (rng.standard_normal(sr) * 0.3).astype(np.float32)
    silence = np.zeros(3 * sr, np.float32)
    x = np.concatenate([speech, silence, speech])
    keep = native_lib.silence_keep_mask(x)
    n_win = (len(x) + 159) // 160
    assert keep.shape == (n_win,)
    assert keep[:90].all()          # speech kept
    assert not keep[250:350].all()  # deep silence dropped after 600 ms
    assert keep[-90:].all()         # trailing speech kept


def test_native_silence_mask_matches_numpy_exactly(native_lib):
    """Both VAD implementations follow the reference's f32 sequential
    arithmetic (qwen_asr.c:437-565); their keep decisions must be
    IDENTICAL — compact_silence dispatches to whichever is available."""
    from smolvision_tpu.runtime.segment import _silence_keep_mask_numpy

    rng = np.random.default_rng(3)
    sr = 16000
    for trial in range(8):
        n = int(rng.integers(sr // 4, 4 * sr))
        x = (rng.standard_normal(n) * rng.uniform(0.002, 0.4)).astype(np.float32)
        # carve a few silent spans to move the noise floor around
        for _ in range(int(rng.integers(0, 4))):
            a = int(rng.integers(0, max(n - sr // 4, 1)))
            x[a : a + sr // 4] *= np.float32(rng.uniform(0, 0.02))
        native_keep = native_lib.silence_keep_mask(x).astype(bool)
        np_keep = _silence_keep_mask_numpy(x)
        assert np.array_equal(native_keep, np_keep), trial


def test_native_bpe_fuzz_matches_python(native_lib, tiny_model_dir):
    """Seeded fuzz: native heap-merge BPE must match the python merge on
    arbitrary unicode (CJK, emoji, combining marks, controls) and the
    decode must round-trip byte-exactly."""
    from smolvision_tpu.text.tokenizer import _BYTE_ENCODER, load_tokenizer

    tok = load_tokenizer(tiny_model_dir)
    assert tok._native_table is not None
    rng = np.random.default_rng(11)
    pools = [
        lambda: chr(int(rng.integers(32, 127))),            # ASCII
        lambda: chr(int(rng.integers(0x4E00, 0x9FFF))),     # CJK
        lambda: chr(int(rng.integers(0x1F300, 0x1F64F))),   # emoji
        lambda: chr(int(rng.integers(0x300, 0x370))),       # combining
        lambda: chr(int(rng.integers(1, 32))),              # controls
    ]
    for trial in range(60):
        text = "".join(
            pools[int(rng.integers(len(pools)))]()
            for _ in range(int(rng.integers(1, 120))))
        native_ids = tok.encode(text)
        symbols = tok._merge([_BYTE_ENCODER[b] for b in text.encode("utf-8")])
        python_ids = [tok.vocab[s] for s in symbols]
        assert native_ids == python_ids, (trial, text[:40])
        assert tok.decode(native_ids) == text, (trial, text[:40])
