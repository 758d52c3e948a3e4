"""Batched session broker: concurrent HTTP stream-sessions share ONE
MultiStreamServer.

The worker's legacy path runs one StreamSession per HTTP session — N live
dialogues cost N sequential perception programs per tick.  This broker
micro-batches instead: callers enqueue their newest frame and block; a
single tick thread collects every pending frame (waiting up to
``max_wait_ms`` for stragglers once the first frame of a tick arrives),
runs ONE batched perceive step — and, when several gates fire together,
ONE batched cognition turn (streaming/multistream.py) — then wakes the
callers with their results.

This is the serving-plane half of BASELINE config 5: the engine-side
batching exists in MultiStreamServer; the broker is what lets independent
HTTP clients actually land in the same batch.
"""
from __future__ import annotations

import threading
import time
from typing import Dict, Optional

from ..streaming.multistream import MultiStreamServer


class BatchedSessionBroker:
    def __init__(self, engine, capacity: int = 8, max_wait_ms: float = 15.0):
        self.server = MultiStreamServer(engine, capacity=capacity)
        self.capacity = capacity
        self.max_wait = max_wait_ms / 1000.0
        self._cv = threading.Condition()
        self._pending: Dict[str, object] = {}   # stream_id -> frame
        self._results: Dict[str, dict] = {}     # stream_id -> result
        self._stop = False
        self.ticks = 0          # observability: batched step invocations
        self.frames_seen = 0
        self._thread = threading.Thread(target=self._tick_loop, daemon=True)
        self._thread.start()

    def _slot(self, stream_id: str):
        return next((s for s in self.server.slots
                     if s is not None and s.stream_id == stream_id), None)

    # -- lifecycle (serialized with ticks via the same condition lock) ------
    def add(self, stream_id: str, tokenizer, prompt_ids=None,
            max_new_tokens: int = 128, gate_threshold: Optional[float] = None):
        with self._cv:
            self.server.add_stream(
                stream_id, tokenizer, prompt_ids=prompt_ids,
                max_new_tokens=max_new_tokens, gate_threshold=gate_threshold,
            )

    def remove(self, stream_id: str) -> dict:
        with self._cv:
            slot = self._slot(stream_id)
            if slot is None:
                raise KeyError(stream_id)
            out = {"turns": list(slot.turns), "intervals": list(slot.interval_ids)}
            self.server.remove_stream(stream_id)
            self._pending.pop(stream_id, None)
            self._results.pop(stream_id, None)
            return out

    def active(self) -> int:
        with self._cv:
            return len(self.server.active)

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    # -- per-frame submission ------------------------------------------------
    def submit(self, stream_id: str, frame, timeout: float = 120.0) -> dict:
        """Enqueue this stream's newest frame; block until its tick lands.
        Returns {"fire": bool, "text": str|None, "frame_idx": int}."""
        deadline = time.time() + timeout
        with self._cv:
            if self._slot(stream_id) is None:
                raise KeyError(stream_id)
            while stream_id in self._pending:
                # the caller's previous frame hasn't ticked yet (one frame
                # in flight per stream — matches the per-session lock of the
                # legacy path)
                if not self._cv.wait(timeout=max(deadline - time.time(), 0.01)):
                    raise TimeoutError(f"stream {stream_id}: previous frame stuck")
            self._pending[stream_id] = frame
            self._cv.notify_all()
            while stream_id not in self._results:
                if not self._cv.wait(timeout=max(deadline - time.time(), 0.01)):
                    raise TimeoutError(f"stream {stream_id}: tick timed out")
            return self._results.pop(stream_id)

    # -- the tick loop ---------------------------------------------------------
    def _tick_loop(self):
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait(timeout=0.25)
                if self._stop:
                    return
                # batching window: once the first frame of a tick arrives,
                # wait briefly for the other live streams' frames
                deadline = time.time() + self.max_wait
                while (len(self._pending) < len(self.server.active)
                       and time.time() < deadline and not self._stop):
                    self._cv.wait(timeout=max(deadline - time.time(), 0.001))
                frames = dict(self._pending)
                self._pending.clear()
                # step under the lock: add/remove also mutate server state
                out = self.server.step(frames)
                self.ticks += 1
                self.frames_seen += len(frames)
                for sid in frames:
                    slot = self._slot(sid)
                    text = out.get(sid)
                    self._results[sid] = {
                        "fire": text is not None,
                        "text": text,
                        "frame_idx": int(slot.frame_idx) if slot else -1,
                    }
                self._cv.notify_all()
