"""smolvision_tpu — a TPU-native (JAX/XLA/Pallas) speech-to-text framework.

A from-scratch re-design of the capabilities of the reference C engine
(`qwen_asr`, see /root/reference) for TPU hardware:

  WAV -> 16 kHz mono f32 -> log-mel (128 bins) -> Conv2D stem (8x downsample)
  -> windowed bidirectional transformer encoder -> proj1/proj2 -> audio
  embeddings spliced into a chat-template prompt -> Qwen3 decoder prefill
  -> greedy autoregressive decode over a static KV cache -> BPE detokenize.

Design stance (TPU-first, not a port):
  * static shapes everywhere (pow2 buckets + explicit length masks),
  * weights resident on device in bf16, matmuls accumulate in f32 on the MXU,
  * one jitted graph per phase (encoder / prefill / decode step),
  * decode step returns a single int32 per token — no other host traffic,
  * host Python owns text logic (prompting, streaming commit, segmentation).

Model families (auto-detected like the reference, main.c:205-215):
  * Qwen3-ASR 0.6B / 1.7B   (dense decoder, tied embeddings)
  * Qwen3-Omni 30B          (MoE decoder: 128 experts, top-8)
  * Qwen2.5-Omni 7B         (Conv1D stem, biased QKV, separate lm_head)
"""

__version__ = "0.1.0"

from smolvision_tpu.config import ModelConfig, detect_config  # noqa: F401
