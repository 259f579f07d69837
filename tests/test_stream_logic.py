"""Streaming commit/rollback/recovery logic against a scripted fake engine.

The trickiest invariants of stream_impl (qwen_asr.c:1986-2146) are pure
token-sequence logic; here a FakeEngine feeds canned decode outputs so the
state machine's behavior is pinned exactly: cold-start suppression, LCP
commits, rollback, overlap dedup, repeat-run suppression, recovery resets.
"""

from types import SimpleNamespace
from typing import List

import numpy as np
import pytest

from smolvision_tpu.config import QWEN3_ASR_06B, TOKEN_ASR_TEXT
from smolvision_tpu.runtime import stream as stream_mod

ASR = TOKEN_ASR_TEXT
SR = 16000


class FakeTokenizer:
    def decode_piece(self, t: int) -> bytes:
        return f"[{t}]".encode()


class FakeEngine:
    """Implements exactly the surface _stream_impl uses."""

    def __init__(self, chunk_outputs: List[List[int]]):
        self.cfg = QWEN3_ASR_06B
        self.stream_chunk_sec = 2.0
        self.stream_rollback = 2
        self.stream_unfixed_chunks = 2
        self.stream_max_new_tokens = 8
        self.past_text_conditioning = True
        self.skip_silence = False
        self.verbose = 0
        self.monitor = False
        self.max_tokens = 2048
        self.token_cb = lambda b: None
        self.perf = SimpleNamespace(
            reset=lambda: None, encode_ms=0.0, decode_ms=0.0, total_ms=0.0,
            text_tokens=0, audio_ms=0.0, stream_chunk_ms=[],
            stream_first_commit_ms=None, stream_latency=lambda: None)
        self._prompt_tokens: List[int] = []
        self._force_tokens: List[int] = []
        self._tokenizer = FakeTokenizer()
        self.chunk_outputs = [list(c) for c in chunk_outputs]
        self.reuse_log: List[int] = []

    # --- surface used by _stream_impl ---------------------------------
    tokenizer = property(lambda self: self._tokenizer)

    def prepare_prompt(self):
        pass

    def encode_mel(self, mel):
        n = max(mel.shape[1] // 8, 1)
        return np.zeros((n, 8), dtype=np.float32), n

    def prefill_with_reuse(self, ids, audio, audio_start, n_audio, reused,
                           greedy=True):
        self.reuse_log.append(min(reused, len(ids) - 1))
        return 0, len(ids)  # "first token" placeholder; decode script ignores

    def decode_greedy(self, first, pos, max_new, on_token):
        toks = self.chunk_outputs.pop(0) if self.chunk_outputs else []
        n = 0
        for t in toks[:max_new]:
            n += 1
            if not on_token(t):
                break
        return n  # EOS never scripted; n == emitted count


def _audio(seconds: float) -> np.ndarray:
    # non-silent so log_mel never sees empty/degenerate input
    t = np.arange(int(SR * seconds))
    return (0.1 * np.sin(t / 10.0)).astype(np.float32)


def _run(chunks, seconds, **eng_kw):
    eng = FakeEngine(chunks)
    for k, v in eng_kw.items():
        setattr(eng, k, v)
    emitted: List[bytes] = []
    eng.token_cb = lambda piece: emitted.append(piece)
    text = stream_mod._stream_impl(eng, _audio(seconds), None)
    return eng, text, emitted


def test_cold_chunks_emit_nothing_then_final_emits_all():
    # 3 chunks over 6 s: chunks 0-1 are cold (unfixed=2, full re-decodes);
    # chunk 2 is conditioned (prefix = raw minus rollback 2) AND final, so its
    # scripted output is the CONTINUATION after the prefix [ASR,10,11]
    chunks = [
        [ASR, 10, 11, 12],
        [ASR, 10, 11, 12, 13],
        [12, 13, 14],
    ]
    eng, text, emitted = _run(chunks, 6.0)
    # final chunk emits the full text region (after <asr_text>)
    assert text == "[10][11][12][13][14]"
    assert b"".join(emitted).decode() == text


def test_intermediate_commit_respects_rollback():
    # 4 chunks over 8 s: chunk 2 commits candidate minus rollback(2)
    chunks = [
        [ASR, 10, 11],
        [ASR, 10, 11, 12],
        [11, 12, 13, 14],   # continuation after prefix [ASR,10]; candidate commits 10,11,12
        [13, 14, 15],       # continuation after prefix [ASR,10,11,12]; final
    ]
    eng = FakeEngine(chunks)
    progress = []
    eng.token_cb = lambda piece: progress.append(piece.decode())
    text = stream_mod._stream_impl(eng, _audio(8.0), None)
    # the first three committed tokens must have been emitted before the
    # final chunk's remainder (prefix order preserved, no re-emission)
    assert progress == ["[10]", "[11]", "[12]", "[13]", "[14]", "[15]"]
    assert text == "".join(progress)


def test_divergent_candidate_does_not_reemit_lcp():
    # chunk 2 revises token 12 -> 99 after it was NOT yet committed
    chunks = [
        [ASR, 10, 11],
        [ASR, 10, 11, 12],
        [11, 12, 13, 14],      # commits 10,11,12
        [99, 13, 14, 15],      # revises inside the rollback window; final
    ]
    eng, text, emitted = _run(chunks, 8.0)
    # stable LCP keeps [10][11]; the revision appends (tokens are not
    # retracted once emitted — same policy as the reference)
    assert "".join(p.decode() for p in emitted) == "[10][11][12][99][13][14][15]"


def test_prefix_rollback_feeds_conditioning():
    chunks = [
        [ASR, 10, 11, 12],
        [ASR, 10, 11, 12, 13],
        [12, 13, 14],
        [13, 14, 15],
    ]
    eng, text, emitted = _run(chunks, 8.0)
    # chunks 0-1: reused prefill = template-only LCP; chunks 2+: the raw-token
    # prefix changes the prompt tail, so reuse grows with the shared prefix
    assert len(eng.reuse_log) == 4
    assert eng.reuse_log[0] == 0
    assert eng.reuse_log[1] > 0  # template + audio signature partially reused


def test_repeat_run_suppression_and_recovery_reset():
    # a chunk emitting >12 identical tokens triggers suppression; >=8 dropped
    # repeats triggers a recovery reset (re-anchor, caches cleared)
    chunks = [
        [ASR, 10, 11],
        [ASR, 10, 11, 12],
        [42] * 24,                # 24 x 42 -> 12 kept, 12 dropped -> recovery
        [ASR, 20, 21, 22, 23],    # fresh decode after re-anchor (no prefix)
    ]
    eng, text, emitted = _run(chunks, 8.0)
    # recovery reset must have cleared prefill signature: the chunk after the
    # reset starts with reuse 0 (enc cache cleared + prev signature dropped)
    assert eng.reuse_log[3] == 0
    # and the final chunk's text is emitted after the re-anchor
    assert text.endswith("[23]")


def test_degenerate_tail_blocks_trigger_reset():
    # periodic tail [5,6,5,6,5,6,5,6] (period 2, reps 4) => recovery
    chunks = [
        [ASR, 10, 11],
        [ASR, 10, 11, 12],
        [5, 6] * 6,                    # candidate tail repeats (period 2, reps>=4)
        [ASR, 30, 31, 32, 33],
    ]
    eng, text, emitted = _run(chunks, 8.0, stream_max_new_tokens=12)
    assert eng.reuse_log[3] == 0  # caches cleared by the reset
