"""Model forward passes with Pallas kernels (interpret mode) vs the jnp path.

Exercises the exact integration points (encoder windowed attention, decoder
prefill flash) rather than the kernels in isolation.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def force_pallas():
    os.environ["SMOLVISION_PALLAS"] = "1"
    yield
    os.environ.pop("SMOLVISION_PALLAS", None)


def test_encoder_pallas_matches_jnp(tiny_model_dir, speech_like_audio, force_pallas):
    import jax
    import jax.numpy as jnp
    from smolvision_tpu.config import detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors
    from smolvision_tpu.models import params as pm
    from smolvision_tpu.models import qwen3_encoder as enc_mod
    from smolvision_tpu.ops.mel import log_mel

    reader = MultiSafetensors(tiny_model_dir)
    cfg = detect_config(tiny_model_dir, reader)
    params = pm.load_qwen3_encoder(reader, cfg, jnp.float32)
    mel = log_mel(speech_like_audio)

    # build conv tokens once (shared), then run the transformer both ways
    chunks = np.stack([mel[:, c * 100 : (c + 1) * 100] for c in range(2)]).astype(np.float32)
    tok = enc_mod.conv_stem(params, jnp.asarray(chunks), cfg)
    x = tok.reshape(-1, cfg.enc_d_model)
    wts = cfg.window_token_size()
    Tcap = wts  # 26 tokens -> single 104 window
    x = jnp.pad(x, ((0, Tcap - x.shape[0]), (0, 0)))

    os.environ["SMOLVISION_PALLAS"] = "1"
    with_pallas = enc_mod.encoder_transformer(params, x, jnp.int32(26), cfg, wts)
    os.environ["SMOLVISION_PALLAS"] = "0"
    with_jnp = enc_mod.encoder_transformer(params, x, jnp.int32(26), cfg, wts)
    reader.close()
    np.testing.assert_allclose(np.asarray(with_pallas)[:26],
                               np.asarray(with_jnp)[:26], rtol=2e-4, atol=2e-4)


def test_decoder_prefill_pallas_matches_jnp(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.config import detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors
    from smolvision_tpu.models import params as pm
    from smolvision_tpu.models import qwen3_decoder as dm

    reader = MultiSafetensors(tiny_model_dir)
    cfg = detect_config(tiny_model_dir, reader)
    params = pm.load_decoder(reader, cfg, jnp.float32)
    reader.close()

    rng = np.random.default_rng(0)
    Tcap, Kcap, valid = 128, 256, 100
    embeds = jnp.asarray(rng.standard_normal((Tcap, cfg.dec_hidden)).astype(np.float32))

    outs = {}
    for mode in ("1", "0"):
        os.environ["SMOLVISION_PALLAS"] = mode
        kv = dm.make_kv_cache(cfg, Kcap, jnp.float32)
        logits, kv2 = dm.prefill(params, cfg, embeds, jnp.int32(0),
                                 jnp.int32(valid), kv, greedy=False)
        outs[mode] = (np.asarray(logits), np.asarray(kv2))

    np.testing.assert_allclose(outs["1"][0], outs["0"][0], rtol=2e-4, atol=2e-4)
    # valid cache rows must agree too
    np.testing.assert_allclose(outs["1"][1][:, :, :valid], outs["0"][1][:, :, :valid],
                               rtol=2e-4, atol=2e-4)


def test_decoder_decode_step_pallas_matches_jnp(tiny_model_dir):
    import jax.numpy as jnp
    from smolvision_tpu.config import detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors
    from smolvision_tpu.models import params as pm
    from smolvision_tpu.models import qwen3_decoder as dm

    reader = MultiSafetensors(tiny_model_dir)
    cfg = detect_config(tiny_model_dir, reader)
    params = pm.load_decoder(reader, cfg, jnp.float32)

    rng = np.random.default_rng(4)
    Tcap, Kcap, valid = 128, 256, 100
    embeds = jnp.asarray(rng.standard_normal((Tcap, cfg.dec_hidden)).astype(np.float32))

    outs = {}
    for mode in ("1", "0"):
        os.environ["SMOLVISION_PALLAS"] = mode
        kv = dm.make_kv_cache(cfg, Kcap, jnp.float32)
        _, kv = dm.prefill(params, cfg, embeds, jnp.int32(0), jnp.int32(valid),
                           kv, greedy=False)
        logits, kv = dm.decode_step(params, cfg, jnp.int32(77), jnp.int32(valid),
                                    kv, greedy=False)
        outs[mode] = np.asarray(logits)
    os.environ.pop("SMOLVISION_PALLAS", None)
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=2e-4, atol=2e-4)


def test_batched_delta_prefill_pallas_matches_jnp(tiny_model_dir):
    """The batched delta-prefill flash kernel (block vs cache + itself,
    natural-layout masks) through batched_prefill_delta vs the two-part
    XLA path — the multistream round's model middle."""
    import jax.numpy as jnp
    from smolvision_tpu.config import detect_config
    from smolvision_tpu.io.safetensors import MultiSafetensors
    from smolvision_tpu.models import params as pm
    from smolvision_tpu.models import qwen3_decoder as dm
    from smolvision_tpu.parallel import batch as pbatch

    reader = MultiSafetensors(tiny_model_dir)
    cfg = detect_config(tiny_model_dir, reader)
    params = pm.load_decoder(reader, cfg, jnp.float32)
    reader.close()

    rng = np.random.default_rng(9)
    B, W, PCAP = 3, 256, 512
    KCAP, S = 576, 128
    embeds = jnp.asarray(
        rng.standard_normal((B, W, cfg.dec_hidden)).astype(np.float32))
    seed_blk = jnp.asarray(
        rng.standard_normal((B, S, cfg.dec_hidden)).astype(np.float32))
    rope = jnp.zeros((B,), jnp.int32)
    kvm = jnp.zeros((B,), jnp.int32)
    last = jnp.asarray([W - 1, W - 5, W // 2], jnp.int32)
    pmax = jnp.asarray([S + 60, S + 200, S + 17], jnp.int32)

    outs = {}
    for mode in ("1", "0"):
        os.environ["SMOLVISION_PALLAS"] = mode
        kv = pbatch.make_batched_kv(cfg, B, KCAP, jnp.float32)
        # seed the cache region [0, S) so the cache part is non-trivial
        _, kv = dm.batched_prefill_delta(
            params, cfg, seed_blk, jnp.int32(0), kv, rope, kvm, greedy=False,
            last_rows=jnp.full((B,), S - 1, jnp.int32),
            prompt_max=jnp.full((B,), KCAP, jnp.int32),
            region_start=jnp.int32(PCAP))
        logits, kv = dm.batched_prefill_delta(
            params, cfg, embeds, jnp.int32(S), kv, rope, kvm, greedy=False,
            last_rows=last, prompt_max=pmax, region_start=jnp.int32(PCAP))
        outs[mode] = (np.asarray(logits), np.asarray(kv))
    os.environ.pop("SMOLVISION_PALLAS", None)

    np.testing.assert_allclose(outs["1"][0], outs["0"][0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(outs["1"][1][:, :, :, :, : S + W],
                               outs["0"][1][:, :, :, :, : S + W],
                               rtol=2e-4, atol=2e-4)
