"""Multi-stream serving: N concurrent streaming ASR sessions on one chip.

The reference engine is strictly one stream per process (qwen_ctx_t owns a
single KV cache and stream state).  Here the expensive state — device
weight pytrees and compiled programs — is shared across sessions, and each
session gets its own lightweight view of the engine (fresh KV cache, perf
counters, callback, streaming state).  Sessions run on host threads: the
streaming state machine is host Python and each session's device calls are
independent dispatches, so correctness does not depend on scheduling; JAX
serializes concurrent dispatch internally.  Per-session results are
IDENTICAL to running that session alone (tested) because no mutable engine
state is shared.

This is phase 1 of multi-stream serving (concurrency + shared weights).
Phase 2 — batching the per-chunk delta prefills and bounded decodes of
aligned sessions through the batch-native decoder (parallel/batch.py) —
is the planned next step; the session API here is already shaped for it
(sessions advance chunk-by-chunk on a shared clock when driven by
`run_streams`).
"""

from __future__ import annotations

import copy
import threading
from typing import Callable, List, Optional, Sequence

import numpy as np

from smolvision_tpu.runtime import stream as stream_mod
from smolvision_tpu.runtime.engine import PerfStats


def clone_session(engine):
    """A lightweight engine view for one session: shares the device weights,
    jitted programs, tokenizer, and generation settings; owns its KV cache,
    perf counters, and callback."""
    _ = engine.tokenizer          # load once; clones share it
    engine.prepare_prompt()
    s = copy.copy(engine)
    s.perf = PerfStats()
    s.token_cb = None
    s.reset_kv()
    return s


class StreamSession:
    """One live streaming transcription bound to a session engine view."""

    def __init__(self, engine, source, on_token: Optional[Callable[[bytes], None]] = None):
        """source: np.ndarray of samples (preloaded audio, streamed in 2 s
        chunks) or a LiveAudio-like object (io/live.py protocol)."""
        self.engine = clone_session(engine)
        # a session must stream chunk-by-chunk even for preloaded audio;
        # the silent-mode short-circuit (one full-context pass) is for the
        # single-stream CLI only, so always install a callback
        self.engine.token_cb = on_token if on_token is not None else (lambda piece: None)
        self.source = source
        self.text: Optional[str] = None
        self.error: Optional[BaseException] = None

    def run(self):
        try:
            if isinstance(self.source, np.ndarray):
                self.text = stream_mod.transcribe_stream(self.engine, self.source)
            else:
                self.text = stream_mod.transcribe_stream_live(self.engine, self.source)
        except BaseException as e:  # surfaced by run_streams
            self.error = e


def run_streams(engine, sources: Sequence, on_token=None) -> List[Optional[str]]:
    """Run one streaming session per source concurrently; returns final
    texts in source order.

    on_token: optional callable (session_index, piece_bytes) invoked from
    session threads as text commits.
    """
    sessions = []
    for i, src in enumerate(sources):
        cb = (lambda piece, _i=i: on_token(_i, piece)) if on_token else None
        sessions.append(StreamSession(engine, src, cb))
    threads = [threading.Thread(target=s.run, name=f"stream-{i}", daemon=True)
               for i, s in enumerate(sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for s in sessions:
        if s.error is not None:
            raise s.error
    return [s.text for s in sessions]
