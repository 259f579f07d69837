"""Shared synthetic workloads for the serving-path tests."""

import numpy as np


def serving_clips(n, seed=11):
    """Mixed-length clips (0.8-2.15 s) that force admission waves in the
    continuous scheduler.  One recipe so the kv8 equivalence test
    (tests/test_kv8.py) exercises the SAME schedule as the serving tests."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        dur = 0.8 + 0.45 * (i % 4)
        t = np.arange(int(16000 * dur)) / 16000
        sig = (0.3 * np.sin(2 * np.pi * (160 + 25 * i) * t)
               + 0.02 * rng.standard_normal(len(t)))
        out.append(sig.astype(np.float32))
    return out
