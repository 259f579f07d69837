"""Encoder sequence parallelism (SURVEY §2.3 SP).

Encoder windows are hard (no cross-window attention), so a dp mesh can
shard the batched group encode's CLIP axis and the conv stem's
chunk-block axis over "data" and partition the encoder collective-free —
without the constraint every device computes the full encoder replicated
(parallel/mesh.shard_engine sets engine._enc_sp_mesh; the jits in
runtime/engine._build_jits and runtime/batch_segments._pool_and_encode
read it at trace time).

Exactness contract: both shardings keep every per-clip / per-block
compute shape identical (the partition axis is a pure batch axis), so
outputs must be EXACTLY equal to the unsharded engine — pinned bitwise
here on the 8-virtual-device CPU mesh, including counts that do not
divide the data axis (GSPMD pads).  The solo flat-token transformer is
deliberately NOT sharded: partitioning its token axis changes GEMM
tiling = f32 summation order (measured ~1e-7 drift), which would break
the byte-equality DP contract (runtime/engine._build_jits note).
"""

import jax.numpy as jnp
import numpy as np

from smolvision_tpu.parallel import mesh as mesh_mod
from smolvision_tpu.runtime.engine import Engine


def _mk(tiny_model_dir):
    return Engine(tiny_model_dir, param_dtype=jnp.float32,
                  kv_dtype=jnp.float32)


def _segs(n=3, seed=11):
    rng = np.random.default_rng(seed)
    return [(rng.standard_normal(16000 * (1 + i)) * 0.2).astype(np.float32)
            for i in range(n)]


def test_group_encode_sp_host_mel_exact(tiny_model_dir):
    """The batched group encode (host-mel front end) under a dp=8 mesh ==
    unsharded, bitwise, at B=3 (uneven over dp=8)."""
    from smolvision_tpu.ops.mel import log_mel
    from smolvision_tpu.runtime.batch_segments import _encode_batch

    mels = [log_mel(s) for s in _segs()]
    ref_stack, ref_n = _encode_batch(_mk(tiny_model_dir), mels)
    eng = mesh_mod.shard_engine(_mk(tiny_model_dir),
                                mesh_mod.make_mesh(8, tp=1))
    assert eng._enc_sp_mesh is not None
    sp_stack, sp_n = _encode_batch(eng, mels)
    assert sp_n == ref_n
    np.testing.assert_array_equal(np.asarray(sp_stack), np.asarray(ref_stack))


def test_group_encode_sp_device_mel_exact(tiny_model_dir, monkeypatch):
    """Same contract on the device-mel front end (the TPU serving path,
    forced on CPU via SMOLVISION_DEVICE_MEL=1)."""
    from smolvision_tpu.runtime.batch_segments import _encode_batch_device_mel

    monkeypatch.setenv("SMOLVISION_DEVICE_MEL", "1")
    segs = _segs()
    ref_stack, ref_n = _encode_batch_device_mel(_mk(tiny_model_dir), segs)
    eng = mesh_mod.shard_engine(_mk(tiny_model_dir),
                                mesh_mod.make_mesh(8, tp=1))
    sp_stack, sp_n = _encode_batch_device_mel(eng, segs)
    assert sp_n == ref_n
    np.testing.assert_array_equal(np.asarray(sp_stack), np.asarray(ref_stack))


def test_solo_conv_stem_sp_exact(tiny_model_dir):
    """The conv stem's chunk-block sharding is bitwise-exact on the solo
    path too (each block's conv has a fixed shape regardless of which
    device holds it), and solo Engine.encode keeps working on a dp mesh
    with the transformer replicated."""
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(16000 * 9) * 0.2).astype(np.float32)

    a_ref, n_ref = _mk(tiny_model_dir).encode(wav)
    eng = mesh_mod.shard_engine(_mk(tiny_model_dir),
                                mesh_mod.make_mesh(8, tp=1))
    a_sp, n_sp = eng.encode(wav)
    assert n_sp == n_ref
    np.testing.assert_array_equal(np.asarray(a_sp), np.asarray(a_ref))
