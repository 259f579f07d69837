"""Segmentation, silence compaction, and split-search logic."""

import numpy as np

from smolvision_tpu.config import SAMPLE_RATE
from smolvision_tpu.runtime.segment import (
    compact_silence,
    find_split_point,
    should_retry_unconditioned,
    split_points,
)


def test_find_split_point_prefers_silence():
    sr = SAMPLE_RATE
    x = np.random.default_rng(0).standard_normal(10 * sr).astype(np.float32) * 0.3
    x[5 * sr : int(5.5 * sr)] = 0.0  # silence at 5.0-5.5 s
    split = find_split_point(x, target=int(4.5 * sr), search_sec=1.5)
    assert 5 * sr <= split <= int(5.6 * sr)


def test_split_points_short_audio_no_split():
    x = np.zeros(5 * SAMPLE_RATE, np.float32)
    assert split_points(x, 20.0, 3.0) == [0, len(x)]
    assert split_points(x, 0.0, 3.0) == [0, len(x)]


def test_split_points_long_audio():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(65 * SAMPLE_RATE) * 0.3).astype(np.float32)
    for s in range(10, 65, 10):  # silences every 10 s
        x[s * SAMPLE_RATE : s * SAMPLE_RATE + 3200] = 0.0
    pts = split_points(x, 20.0, 3.0)
    assert pts[0] == 0 and pts[-1] == len(x)
    assert len(pts) >= 4
    durations = np.diff(pts) / SAMPLE_RATE
    assert all(3 <= d <= 30 for d in durations), durations


def test_compact_silence_drops_long_silence():
    sr = SAMPLE_RATE
    rng = np.random.default_rng(2)
    speech = (rng.standard_normal(2 * sr) * 0.2).astype(np.float32)
    silence = np.zeros(5 * sr, np.float32)
    x = np.concatenate([speech, silence, speech])
    out = compact_silence(x)
    # keeps both speech spans + <= ~600ms of each silence
    assert len(out) < len(x)
    assert len(out) >= 4 * sr
    assert len(out) <= int(5.5 * sr)


def test_compact_silence_all_quiet_keeps_half_second():
    x = np.zeros(3 * SAMPLE_RATE, np.float32)
    out = compact_silence(x)
    assert 0 < len(out) <= 3 * SAMPLE_RATE


def test_collapse_heuristics():
    # too few tokens for a long segment
    assert should_retry_unconditioned("", "short", 10 * SAMPLE_RATE, 3)
    # plenty of tokens: fine
    assert not should_retry_unconditioned("", "x" * 100, 10 * SAMPLE_RATE, 50)
    # duplicate long span already in the result
    dup = "d" * 60
    assert should_retry_unconditioned("prefix " + dup, dup, SAMPLE_RATE, 30)
    # empty segment always retries
    assert should_retry_unconditioned("r", "", SAMPLE_RATE, 0)


def test_collapse_retry_gate_counts_utf8_bytes():
    """The 48-length duplicate gate is BYTES (C strlen, qwen_asr.c:862):
    20 CJK chars = 60 UTF-8 bytes must trigger, 20 ASCII chars must not."""
    cjk = "好" * 20  # 60 bytes
    assert should_retry_unconditioned("x " + cjk + " y", cjk, SAMPLE_RATE, 30)
    assert not should_retry_unconditioned("x " + "d" * 20 + " y", "d" * 20,
                                          SAMPLE_RATE, 30)


def test_boundary_space_uses_c_locale_byte_semantics():
    """qwen_asr.c:869-876 tests BYTES with C-locale isspace/ispunct: UTF-8
    lead/continuation bytes (>=0x80) are neither, so Unicode whitespace and
    punctuation do NOT suppress the separator the way ASCII does."""
    from smolvision_tpu.runtime.segment import _should_insert_boundary_space

    assert _should_insert_boundary_space("a", "b")
    assert not _should_insert_boundary_space("a", " ")     # ASCII space next
    assert not _should_insert_boundary_space(" ", "b")     # ASCII space prev
    assert not _should_insert_boundary_space("a", ".")     # ASCII punct next
    # Unicode whitespace/punctuation: C sees a non-space non-punct byte
    assert _should_insert_boundary_space("　", "b")    # ideographic space
    assert _should_insert_boundary_space("a", "。")    # CJK full stop
    assert _should_insert_boundary_space("好", "你")  # CJK text


def test_split_energy_matches_sequential_f32_reference():
    """The vectorized column walk must reproduce the C engine's per-window
    sequential f32 accumulation exactly (qwen_asr.c:629-640)."""
    sr = SAMPLE_RATE
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(4 * sr) * 0.3).astype(np.float32)
    win = 1600
    lo, hi = sr, 3 * sr
    # scalar transcription of the C loop
    best_energy = np.float32(np.inf)
    best_center = 2 * sr
    pos = lo
    while pos + win <= hi:
        energy = np.float32(0.0)
        for j in range(pos, pos + win):
            energy = np.float32(energy + np.float32(x[j]) * np.float32(x[j]))
        energy = np.float32(energy / np.float32(win))
        if energy < best_energy:
            best_energy = energy
            best_center = pos + win // 2
        pos += win // 2
    assert find_split_point(x, target=2 * sr, search_sec=1.0) == best_center
