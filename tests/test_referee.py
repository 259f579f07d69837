"""Unit pins for the f64 streaming referee (tools/referee_stream.py).

The end-to-end referee ran on TPU in round 4 and adjudicated both
streaming divergences benign (docs/PARITY_C.md); these tests pin the
host-side divergence finder so trace-format drift can't silently break
the tool.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from referee_stream import first_divergence  # noqa: E402


def _tr(chunks):
    return {"chunks": [{"ids": ids, "chunk_tokens": toks}
                       for ids, toks in chunks]}


def test_identical_traces():
    t = _tr([([1, 2], [5, 6]), ([1, 2, 5], [7])])
    assert first_divergence(t, t) is None


def test_token_divergence_mid_chunk():
    a = _tr([([1, 2], [5, 6, 7]), ([9], [1])])
    b = _tr([([1, 2], [5, 6, 8]), ([9], [2])])
    assert first_divergence(a, b) == (0, 2)


def test_length_divergence():
    a = _tr([([1], [5, 6, 7])])
    b = _tr([([1], [5, 6])])
    assert first_divergence(a, b) == (0, 2)


def test_ids_divergence_flagged_structural():
    a = _tr([([1, 2], [5])])
    b = _tr([([1, 3], [5])])
    assert first_divergence(a, b) == (0, -1)


def test_chunk_count_divergence():
    a = _tr([([1], [5]), ([1, 5], [6])])
    b = _tr([([1], [5])])
    assert first_divergence(a, b) == (1, -1)


def test_judge_chunk_count_divergence_is_structural():
    """A chunk-count divergence indexes ci == len(shorter chunks); the
    judge must emit the structural verdict, not IndexError (ADVICE r4 —
    the structural return used to sit after the chunk lookups)."""
    from referee_stream import judge

    a = _tr([([1], [5]), ([1, 5], [6])])
    b = _tr([([1], [5])])
    # model_dir/wav are never touched on the structural path
    v = judge(a, b, "/nonexistent", "/nonexistent.wav")
    assert v["verdict"] == "structural"
    assert v["divergence"] == {"chunk": 1, "step": None}
