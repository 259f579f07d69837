#!/usr/bin/env python3
"""Attribution probe for the multistream "audio-first prompt layout" lever
(VERDICT r3 Next #3).

docs/MULTISTREAM.md round-3 claimed: "any row that committed text last
round gets a new rollback prefix and its signature LCP collapses to the
9-token prompt header ... the lever that WOULD matter is a prompt layout
with audio before the rollback prefix".  But the signature construction
(stream.StreamState.begin_chunk) walks [9-token header][audio rows, uid-
tagged][suffix/force/prefix text]: the rollback prefix sits at the END, so
prefix churn can only break the LCP at the tail — reuse==9 requires the
FIRST AUDIO ROW to change, which only happens when
  (a) the encoder window cache was CLEARED (degeneration-recovery or
      periodic reset in finish_chunk -> _reanchor + enc_cache.clear), or
  (b) a window was EVICTED (>4 windows, rows shift down), or
  (c) the session has no completed window yet (chunks 1-3).

If reuse==9 rows are (a)-dominated, an audio-before-prefix layout changes
NOTHING for them (their audio identities churned, not their prefix), and
the lever is dead by construction — the measured answer VERDICT asks for.

This probe runs the N-session batched coordinator with spies on _reanchor
(recovery/periodic resets), eviction, and per-round per-row reuse, then
prints the attribution table: for every (round, row) with reuse < 64,
which cause fired since that row's previous round.

Run (TPU, serial): python tools/probe_audio_first.py [--n 16] [--runs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = "/root/reference/samples"
CLIP_45S = os.path.join(SAMPLES, "night_of_the_living_dead_1968",
                        "45s_dont_be_afraid_of_me.wav")
BENCH_DIR = os.path.join(REPO, ".bench_cache", "qwen3-asr-0.6b-eng")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--model", default=BENCH_DIR)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from smolvision_tpu.io.wav import load_wav
    from smolvision_tpu.runtime import multistream as ms_mod
    from smolvision_tpu.runtime import stream as stream_mod
    from smolvision_tpu.runtime.engine import Engine

    eng = Engine(args.model, verbose=0)
    eng.max_tokens = 48
    eng.past_text_conditioning = True

    # ---- spies -----------------------------------------------------------
    events = defaultdict(list)          # state-id -> [(chunk_idx, cause)]
    reuse_log = []                      # (chunk_idx, row, reused, n_windows)

    orig_reanchor = stream_mod.StreamState._reanchor
    orig_begin = stream_mod.StreamState.begin_chunk

    def spy_reanchor(self):
        events[id(self)].append((self.chunk_idx, "reset"))
        return orig_reanchor(self)

    def spy_begin(self):
        uids_before = [u for (_, _, _, u) in self.enc_cache.windows]
        w = orig_begin(self)
        if w is not None and w is not stream_mod.NOT_READY:
            uids_after = [u for (_, _, _, u) in self.enc_cache.windows]
            if uids_before and uids_after and uids_after[0] != uids_before[0]:
                events[id(self)].append((self.chunk_idx, "evict-shift"))
            reuse_log.append((self.chunk_idx, id(self), int(w.reused),
                              len(uids_after)))
        return w

    stream_mod.StreamState._reanchor = spy_reanchor
    stream_mod.StreamState.begin_chunk = spy_begin
    try:
        s45 = load_wav(CLIP_45S)
        rng = np.random.default_rng(7)
        sessions = [
            (s45 + rng.normal(0, 1e-4, len(s45))).astype(np.float32)
            for _ in range(args.n)]
        ms_mod.run_streams(eng, sessions)
    finally:
        stream_mod.StreamState._reanchor = orig_reanchor
        stream_mod.StreamState.begin_chunk = orig_begin

    # ---- attribution -----------------------------------------------------
    # reuse < 64 at chunk c is attributed to the cause event with the
    # largest chunk index <= c for that session (resets recorded in the
    # PREVIOUS chunk's finish affect THIS chunk's reuse)
    counts = defaultdict(int)
    per_reuse = defaultdict(list)
    for (c, sid, reused, nw) in reuse_log:
        per_reuse[c].append(reused)
        if c < 3:
            continue                    # warm-in chunks, reuse 0 expected
        if reused < 64:
            # a reset fires in finish_chunk of chunk ec (affects ec+1's
            # reuse, and keeps the row at reuse<=9 for up to 4 MORE chunks:
            # the cleared window cache has no completed window until
            # enc_window/chunk = 4 chunks later, so all audio is the
            # fresh-uid partial tail); an evict-shift fires in begin_chunk
            # of ec (affects ec)
            cause = "unattributed"
            for (ec, name) in events.get(sid, []):
                if (name == "reset" and c - 5 <= ec <= c - 1) or \
                        (name == "evict-shift" and ec == c):
                    cause = ("reset-tail" if name == "reset" and ec < c - 1
                             else name)
            counts[cause] += 1
        else:
            counts["reuse>=64"] += 1

    print("\nper-round reuse distributions (chunk -> sorted reuse):")
    for c in sorted(per_reuse)[:30]:
        print(f"  chunk {c:3d}: {sorted(per_reuse[c])}")
    total_resets = sum(1 for evs in events.values()
                       for (_, n) in evs if n == "reset")
    total_evicts = sum(1 for evs in events.values()
                       for (_, n) in evs if n == "evict-shift")
    print(f"\nreset events: {total_resets}, evict-shifts: {total_evicts}, "
          f"sessions: {args.n}")
    print("attribution of steady-state (chunk>=3) low-reuse rows "
          "(<64 tokens):")
    print(json.dumps(dict(counts), indent=1))
    low = {k: v for k, v in counts.items() if k != "reuse>=64"}
    attributed = (low.get("reset", 0) + low.get("reset-tail", 0)
                  + low.get("evict-shift", 0))
    n_low = sum(low.values())
    if n_low:
        print(f"\n=> {attributed}/{n_low} low-reuse rows attributed to "
              "cache-clearing events (reset/evict).")
        print("   If ~all: the audio-before-prefix layout CANNOT recover "
              "them (their audio row identities churned, not their prefix) "
              "— lever dead by construction.")
        print("   If many unattributed: prefix churn really does break the "
              "LCP somewhere — investigate the signature walk before "
              "building the layout mode.")


if __name__ == "__main__":
    main()
