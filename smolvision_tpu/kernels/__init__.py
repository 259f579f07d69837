"""Compute kernels: jnp reference implementations + Pallas TPU kernels.

`use_pallas()` controls dispatch: on TPU the Pallas flash kernels are used
for the hot attention paths; everywhere else (CPU tests, debugging) the jnp
reference implementations run.  Every Pallas kernel is unit-tested against
its jnp reference (tests/test_kernels.py).
"""

from __future__ import annotations

import os

import jax

def use_pallas() -> bool:
    force = os.environ.get("SMOLVISION_PALLAS", "").strip()
    if force == "0":
        return False
    if force == "1":
        return True
    return jax.default_backend() == "tpu"


def pallas_forced() -> bool:
    """True only under explicit SMOLVISION_PALLAS=1 — used to override
    size-based kernel/XLA dispatch heuristics (tests force the kernel paths
    at sizes where the heuristic would pick the fused-XLA formulation)."""
    return os.environ.get("SMOLVISION_PALLAS", "").strip() == "1"
