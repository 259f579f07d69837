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
