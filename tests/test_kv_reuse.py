"""Streaming KV reuse: delta prefill must equal a from-scratch prefill."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reuse_engine(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    return Engine(tiny_model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)


def test_prefill_with_reuse_matches_full(reuse_engine):
    eng = reuse_engine
    base = [151644, 8948, 198, 151645, 198] + list(range(300, 340))
    ext = base + list(range(500, 520))

    # from scratch
    eng.reset_kv()
    ref_logits, _ = eng.prefill_ids(ext, None, -1, 0, greedy=False)
    ref = np.asarray(ref_logits)

    # prefix first, then delta with reuse
    eng.reset_kv()
    eng.prefill_ids(base, None, -1, 0)
    got_logits, total = eng.prefill_with_reuse(ext, None, -1, 0,
                                               reused=len(base), greedy=False)
    got = np.asarray(got_logits)
    assert total == len(ext)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert int(np.argmax(got)) == int(np.argmax(ref))


def test_prefill_reuse_then_decode_matches(reuse_engine):
    """Decode continuation after reused prefill == after full prefill."""
    eng = reuse_engine
    base = list(range(700, 760))
    ext = base + list(range(800, 812))

    eng.reset_kv()
    first, pos = eng.prefill_ids(ext, None, -1, 0)
    ref_tokens = []
    eng.decode_greedy(first, pos, 6, lambda t: (ref_tokens.append(t) or True))

    eng.reset_kv()
    eng.prefill_ids(base, None, -1, 0)
    first2, pos2 = eng.prefill_with_reuse(ext, None, -1, 0, reused=len(base))
    got_tokens = []
    eng.decode_greedy(first2, pos2, 6, lambda t: (got_tokens.append(t) or True))
    assert got_tokens == ref_tokens


def test_reuse_clamped_to_total_minus_one(reuse_engine):
    """reused >= len(ids) must clamp (at least the last row recomputes)."""
    eng = reuse_engine
    ids = list(range(900, 932))
    eng.reset_kv()
    eng.prefill_ids(ids, None, -1, 0)
    out, total = eng.prefill_with_reuse(ids, None, -1, 0, reused=len(ids))
    assert total == len(ids)  # no crash; clamp happened
