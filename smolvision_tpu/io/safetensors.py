"""Zero-copy safetensors reader (host side).

The reference mmaps each shard and hands out raw bf16 pointers
(qwen_asr_safetensors.c:194-394).  We do the same with numpy memory-mapped
views: the file is mapped once, tensors are zero-copy ``np.ndarray`` views
into the map, and ``jax.device_put`` uploads straight from the view (bf16
end-to-end — no host f32 conversion like the C encoder needed).

Supports:
  * single-file ``model.safetensors``,
  * ``model.safetensors.index.json`` weight maps,
  * bare ``model-XXXXX-of-YYYYY.safetensors`` shard scans (sorted),
as in multi_safetensors_open (qwen_asr_safetensors.c:309-394).
"""

from __future__ import annotations

import glob
import json
import mmap
import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

try:  # bfloat16 numpy dtype shipped with jax
    import ml_dtypes

    BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    BF16 = None

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": BF16,
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


class SafetensorsFile:
    """One mmap'd .safetensors shard."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8 : 8 + header_len].decode("utf-8"))
        header.pop("__metadata__", None)
        self._data_off = 8 + header_len
        self.tensors: Dict[str, Tuple[str, Tuple[int, ...], int, int]] = {}
        for name, info in header.items():
            begin, end = info["data_offsets"]
            self.tensors[name] = (info["dtype"], tuple(info["shape"]), begin, end)

    def names(self):
        return self.tensors.keys()

    def get(self, name: str) -> np.ndarray:
        """Zero-copy view of a tensor in its native dtype."""
        dtype_str, shape, begin, end = self.tensors[name]
        dt = _DTYPES.get(dtype_str)
        if dt is None:
            raise ValueError(f"unsupported safetensors dtype {dtype_str!r} for {name}")
        buf = memoryview(self._mm)[self._data_off + begin : self._data_off + end]
        arr = np.frombuffer(buf, dtype=dt)
        return arr.reshape(shape)

    def close(self):
        try:
            self._mm.close()
        except BufferError:
            # zero-copy views of this map are still alive (e.g. the CPU jax
            # backend aliases host buffers); leave the mapping open — the OS
            # reclaims it when the views die.
            return
        finally:
            self._f.close()


class MultiSafetensors:
    """All shards of one checkpoint directory, unified by tensor name."""

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        self.files: Dict[str, SafetensorsFile] = {}
        self._name_to_file: Dict[str, str] = {}

        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        single_path = os.path.join(model_dir, "model.safetensors")
        shard_paths = []
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            shard_paths = sorted(
                os.path.join(model_dir, s) for s in set(index["weight_map"].values())
            )
        elif os.path.exists(single_path):
            shard_paths = [single_path]
        else:
            shard_paths = sorted(glob.glob(os.path.join(model_dir, "model-*.safetensors")))
        if not shard_paths:
            raise FileNotFoundError(f"no safetensors files in {model_dir}")

        for path in shard_paths:
            sf = SafetensorsFile(path)
            self.files[path] = sf
            for name in sf.names():
                self._name_to_file[name] = path

    def has(self, name: str) -> bool:
        return name in self._name_to_file

    def names(self):
        return self._name_to_file.keys()

    def get(self, name: str) -> np.ndarray:
        path = self._name_to_file.get(name)
        if path is None:
            raise KeyError(f"weight not found: {name}")
        return self.files[path].get(name)

    def get_optional(self, name: str) -> Optional[np.ndarray]:
        if name not in self._name_to_file:
            return None
        return self.get(name)

    def close(self):
        for sf in self.files.values():
            sf.close()
        self.files.clear()
        self._name_to_file.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Minimal safetensors writer (used by tools/make_tiny_model.py and tests)."""
    rev = {v: k for k, v in _DTYPES.items() if v is not None}
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        dt = rev.get(arr.dtype)
        if dt is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        nbytes = arr.nbytes
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(arr.tobytes())
        offset += nbytes
    hjson = json.dumps(header).encode("utf-8")
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
