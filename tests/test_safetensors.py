"""Safetensors reader: single-file, index.json multi-shard, bare shard scan."""

import json
import os
import shutil

import numpy as np
import pytest

from smolvision_tpu.io.safetensors import MultiSafetensors, write_safetensors


def _split_checkpoint(src_dir, dst_dir, n_shards=2, with_index=True):
    """Re-shard a single-file checkpoint."""
    shutil.copytree(src_dir, dst_dir)
    reader = MultiSafetensors(str(dst_dir))
    names = sorted(reader.names())
    tensors = {n: np.array(reader.get(n)) for n in names}
    reader.close()
    os.remove(os.path.join(dst_dir, "model.safetensors"))

    shards = [{} for _ in range(n_shards)]
    weight_map = {}
    for i, n in enumerate(names):
        shard = i % n_shards
        fname = f"model-{shard + 1:05d}-of-{n_shards:05d}.safetensors"
        shards[shard][n] = tensors[n]
        weight_map[n] = fname
    for s in range(n_shards):
        write_safetensors(
            os.path.join(dst_dir, f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"),
            shards[s])
    if with_index:
        with open(os.path.join(dst_dir, "model.safetensors.index.json"), "w") as f:
            json.dump({"weight_map": weight_map}, f)


@pytest.mark.parametrize("with_index", [True, False])
def test_multi_shard_reader(tiny_model_dir, tmp_path, with_index):
    dst = tmp_path / ("sharded-idx" if with_index else "sharded-scan")
    _split_checkpoint(tiny_model_dir, dst, n_shards=3, with_index=with_index)

    single = MultiSafetensors(tiny_model_dir)
    sharded = MultiSafetensors(str(dst))
    assert set(single.names()) == set(sharded.names())
    for name in list(single.names())[:20]:
        np.testing.assert_array_equal(np.asarray(single.get(name)),
                                      np.asarray(sharded.get(name)))
    assert sharded.has("thinker.model.embed_tokens.weight")
    assert not sharded.has("nonexistent.weight")
    single.close()
    sharded.close()


def test_engine_loads_sharded_checkpoint(tiny_model_dir, tmp_path, speech_like_audio):
    """End-to-end: greedy tokens from a sharded checkpoint == single-file."""
    import jax.numpy as jnp
    from smolvision_tpu.runtime.engine import Engine

    dst = tmp_path / "sharded-full"
    _split_checkpoint(tiny_model_dir, dst, n_shards=2, with_index=True)

    def tokens(model_dir):
        eng = Engine(model_dir, param_dtype=jnp.float32, kv_dtype=jnp.float32)
        ids = list(range(100, 140))
        eng.reset_kv()
        first, pos = eng.prefill_ids(ids, None, -1, 0)
        out = []
        eng.decode_greedy(first, pos, 8, lambda t: (out.append(t) or True))
        return out

    assert tokens(str(dst)) == tokens(tiny_model_dir)
