"""Static-shape bucketing.

Recompile avoidance is the central constraint the C engine never had: mel
frames, encoder token counts, prefill lengths and KV sizes all vary per
input, so every device entry point gets padded pow2 buckets with explicit
length masks (SURVEY.md §7 design stance; mirrors the reference's own
next_pow2 KV headroom arithmetic, README.md:479-481).
"""

from __future__ import annotations


def next_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def bucket(n: int, minimum: int = 16) -> int:
    """Smallest pow2 >= max(n, minimum)."""
    return max(next_pow2(n), minimum)


def window_bucket(n_tokens: int, window_tokens: int, min_windows: int = 1) -> int:
    """Encoder token cap: pow2 number of attention windows."""
    n_windows = max((n_tokens + window_tokens - 1) // window_tokens, min_windows)
    return next_pow2(n_windows) * window_tokens


def bucket64(n: int, minimum: int = 64) -> int:
    """Round up to a multiple of 64.  Used for the batched serving KV cap,
    where capacity scales every decode step's KV read and the attention is
    the XLA two-part path (shape-free): at the jfk serving shape a 128-
    granular cap reads 384 rows/step where 64-granular reads 320."""
    return max((n + 63) // 64 * 64, minimum)


def bucket128(n: int, minimum: int = 128) -> int:
    """Round up to a multiple of 128 (finer than pow2; used where capacity
    directly scales per-step cost, e.g. the batched KV cache — a pow2 jump
    from 320 to 512 is a 60% KV-read tax on every decode step)."""
    return max((n + 127) // 128 * 128, minimum)
