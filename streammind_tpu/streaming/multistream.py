"""Continuous-batched multi-stream serving (BASELINE config 5).

Many live video streams share ONE batched perception program (weight reads
amortized across streams — measured 233 frames/s aggregate at S=8 on one
v5e chip vs 134 fps single-stream).  Cognition is ALSO continuous-batched
(SURVEY §7 hard part: "continuous batching of heterogeneous work without
head-of-line blocking"): all slots whose gates fire on the same tick run ONE
batched prefill (plans padded to a shared bucket) and ONE lockstep decode
loop over their gathered KV caches — K simultaneous fires cost
max(len_k) decode steps instead of sum(len_k), with the 7B weight read per
step amortized across the K rows.  The batched state is compiled once per
(bucket, K-bucket); attach/detach never recompiles (inactive slots are
masked on the host).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.meta import bucket_length
from .engine import (
    StreamMindEngine,
    build_turn_plan,
    decode_tokens_to_text,
    ensure_turn_capacity,
    post_turn_pending,
    stack_stop_ids,
    rebuild_history_pending,
    run_cognition_turn,
    split_kv_cache,
    stack_kv_caches,
    stop_id_matrix,
    turn_bucket,
    turn_suffix_ids,
)
from .state import init_multistream_state


@dataclasses.dataclass
class _Slot:
    stream_id: str
    tokenizer: object
    pending_ids: list
    cache: object
    interval_ids: list
    turns: list
    max_new_tokens: int = 128
    gate_threshold: Optional[float] = None
    last_fire: int = 0
    frame_idx: int = 0
    stop_ids: Optional[object] = None  # (S, L) matrix (engine.stop_id_matrix)
    # per-stream sampling params (reference worker protocol: temperature +
    # top_p ride each request, model_worker.py:250,275); the batched decode
    # loops take them as per-row vectors so heterogeneous requests batch
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 0.0
    # memory-token subsampling before the splice (reference sample_per/
    # sample_type stream kwargs): 'all' | 'log' | 'similarity'
    sample_type: str = "all"
    sample_per: float = 0.5


class MultiStreamServer:
    """Fixed-capacity pool of live streams over one engine."""

    def __init__(self, engine: StreamMindEngine, capacity: int = 8,
                 batch_cognition: bool = True, kv_mode: str = "dense",
                 num_pages: Optional[int] = None, page_size: int = 64,
                 stop_strings: Optional[list] = None):
        """kv_mode="paged": all dialogues share ONE page pool
        (streaming/paged.py) instead of a ~kv_capacity dense ring each —
        resident KV memory tracks the SUM of live dialogue lengths, so more
        dialogues fit per chip (at 7B bf16 a dense ring is ~1 GB/dialogue).
        num_pages defaults to HALF the dense-equivalent page count; on pool
        pressure the guard resets dialogues with text re-carry (the dense
        path's ensure_turn_capacity semantics).  Note: batched paged
        cognition compiles once per (bucket, fired-K) — no power-of-two K
        padding, because padding rows would alias a live dialogue's pages
        (dense padding duplicates a cache COPY; the pool is shared).
        """
        self.engine = engine
        self.capacity = capacity
        self.batch_cognition = batch_cognition
        # server-wide stop strings (one conversation template per model):
        # decode halts in-loop at the separator (KeywordsStoppingCriteria
        # parity) and texts are trimmed host-side
        self.stop_strings = list(stop_strings) if stop_strings else []
        if kv_mode not in ("dense", "paged"):
            raise ValueError(f"kv_mode must be 'dense' or 'paged', got {kv_mode!r}")
        self.kv_mode = kv_mode
        self.paged = None
        if kv_mode == "paged":
            from .paged import PagedDialogues

            if num_pages is None:
                per_seq = -(-engine.kv_capacity // page_size)
                num_pages = max(capacity * per_seq // 2, per_seq)
            self.paged = PagedDialogues(engine, num_pages, page_size)
        # K-buckets for batched cognition: fired-slot count pads up to the
        # next power of two so prefill/decode compile once per (bucket, K)
        self._k_buckets = []
        k = 1
        while k < capacity:
            k *= 2
            self._k_buckets.append(min(k, capacity))
        self.state = init_multistream_state(engine.cfg, capacity)
        self.slots: List[Optional[_Slot]] = [None] * capacity
        self._rng = jax.random.PRNGKey(0)  # sampling stream for cognition
        size = engine.cfg.vision.image_size
        # match the engine's weight dtype: a float32 filler would promote the
        # whole concatenated batch and silently run the hot ViT in fp32
        from .engine import _float_dtype

        # _float_dtype skips non-float leaves — on an int8-quantized tree
        # the positionally-first leaf can be an int8 weight
        wt = _float_dtype(engine.params["vision"])
        self._pixel_dtype = wt if wt in (jnp.bfloat16, jnp.float32) else jnp.float32
        self._zero_frame = jnp.zeros((1, 3, size, size), self._pixel_dtype)

    # -- lifecycle ---------------------------------------------------------
    def add_stream(
        self, stream_id: str, tokenizer, prompt_ids: Optional[list] = None,
        max_new_tokens: int = 128, gate_threshold: Optional[float] = None,
        temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0,
        sample_type: str = "all", sample_per: float = 0.5,
    ) -> int:
        """Attach a live stream.  Batched cognition stacks each fired
        row's stop-id matrix into a PER-ROW matcher (engine.stack_stop_ids),
        so streams with heterogeneous tokenizers are safe: one stream's
        stop token ids can never halt another row's decode."""
        if any(s is not None and s.stream_id == stream_id for s in self.slots):
            raise ValueError(f"stream id {stream_id!r} is already attached")
        for i, s in enumerate(self.slots):
            if s is None:
                if self.paged is not None:
                    self.paged.open(stream_id)
                self.slots[i] = _Slot(
                    stream_id=stream_id,
                    tokenizer=tokenizer,
                    pending_ids=list(prompt_ids) if prompt_ids else [],
                    cache=(None if self.paged is not None
                           else self.engine.new_kv_cache()),
                    interval_ids=[],
                    turns=[],
                    max_new_tokens=max_new_tokens,
                    gate_threshold=gate_threshold,
                    stop_ids=(stop_id_matrix(tokenizer, self.stop_strings)
                              if self.stop_strings else None),
                    temperature=temperature,
                    top_k=top_k,
                    top_p=top_p,
                    sample_type=sample_type,
                    sample_per=sample_per,
                )
                self._reset_slot_state(i)
                return i
        raise RuntimeError("no free stream slots")

    def remove_stream(self, stream_id: str) -> None:
        for i, s in enumerate(self.slots):
            if s is not None and s.stream_id == stream_id:
                if self.paged is not None:
                    self.paged.close(stream_id)  # reclaim its pages
                self.slots[i] = None
                self._reset_slot_state(i)
                return
        raise KeyError(stream_id)

    def _reset_slot_state(self, i: int) -> None:
        """Zero slot i's carried state without touching other slots."""
        st = self.state
        self.state = st._replace(
            mamba=st.mamba._replace(
                conv=st.mamba.conv.at[:, i].set(0.0),
                ssm=st.mamba.ssm.at[:, i].set(0.0),
            ),
            memory=st.memory.at[i].set(0.0),
            frame_idx=st.frame_idx.at[i].set(0),
            last_fire=st.last_fire.at[i].set(0),
        )

    @property
    def active(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is not None]

    # -- the serve tick ----------------------------------------------------
    def step(self, frames: Dict[str, np.ndarray]) -> Dict[str, Optional[str]]:
        """One tick: feed each active stream's newest frame (streams without
        a frame this tick repeat a zero frame but keep their state frozen —
        they're masked out of the gate decision).  Returns
        {stream_id: utterance or None}.
        """
        if not self.active:
            return {}
        batch = []
        fed = []
        for i in range(self.capacity):
            slot = self.slots[i]
            if slot is not None and slot.stream_id in frames:
                batch.append(jnp.asarray(
                    frames[slot.stream_id], self._pixel_dtype
                ).reshape(1, *self._zero_frame.shape[1:]))
                fed.append(i)
            else:
                batch.append(self._zero_frame)
        pixels = jnp.concatenate(batch, axis=0)
        feed_mask = np.zeros((self.capacity,), bool)
        feed_mask[fed] = True

        gate_probs, self.state = self.engine.perceive_step_batch(
            pixels, self.state, jnp.asarray(feed_mask)
        )
        probs = np.asarray(gate_probs)

        out: Dict[str, Optional[str]] = {}
        fired: List[int] = []
        for i in fed:
            slot = self.slots[i]
            slot.frame_idx += 1
            p = probs[i]
            if slot.gate_threshold is None:
                fire = bool(p[1] > p[0])
            else:
                fire = bool(p[1] > slot.gate_threshold)
            if fire:
                fired.append(i)
            else:
                out[slot.stream_id] = None
        texts = self._cognify_slots(fired)
        for i, text in texts.items():
            out[self.slots[i].stream_id] = text
        return out

    # -- cognition ----------------------------------------------------------
    def _trim(self, text: str) -> str:
        if self.stop_strings:
            from ..mm_utils import trim_at_stop_strings

            return trim_at_stop_strings(text, self.stop_strings)
        return text

    def _slot_span(self, i: int) -> list:
        slot = self.slots[i]
        cfg = self.engine.cfg
        cur = min(slot.frame_idx, cfg.max_stream_frames)
        start = min(slot.last_fire, cur)
        span = list(range(start, cur)) or [max(cur - 1, 0)]
        if slot.sample_type not in (None, "all"):
            from .memory_subsample import subsample_span

            span = subsample_span(
                span, self.state.memory[i : i + 1], slot.sample_type,
                slot.sample_per,
            )
        return span

    # -- paged-pool capacity management -------------------------------------
    def _paged_slot_capacity(self) -> int:
        return min(self.engine.kv_capacity, self.paged.dialogue_capacity)

    def _reset_paged_slot(self, i: int, span_len: int, min_bucket: int = 0) -> None:
        """Reclaim slot i's pages and re-carry recent turns as text — the
        paged analogue of handing a dense session a fresh KV cache."""
        slot = self.slots[i]
        self.paged.reset(slot.stream_id)
        slot.pending_ids = rebuild_history_pending(
            self.engine, slot.tokenizer, slot.turns, slot.pending_ids,
            span_len, slot.max_new_tokens, min_bucket=min_bucket,
            capacity=self._paged_slot_capacity(),
        )

    def _paged_capacity_guard(self, i: int, span_len: int,
                              min_bucket: int = 0) -> bool:
        """Make room for one turn of slot i on the shared pool — and RESERVE
        it (ensure_capacity allocates the pages now, so a multi-fire tick's
        slots see each other's claims; an independent free_pages check per
        slot would overcommit the pool and blow up inside run_turns).

        Two pressures, each answered with reset + text re-carry (dense
        ensure_turn_capacity semantics): (1) the dialogue's own page budget
        can't take bucket + decode tokens → reset slot i; (2) the POOL is
        dry → reclaim from the biggest other dialogues first, then self.
        Returns True if any dialogue was reset (callers running a
        shared-bucket fixpoint must re-derive the bucket)."""
        from .paged import PagePoolExhausted

        slot = self.slots[i]
        pd = self.paged
        did = slot.stream_id
        cap = self._paged_slot_capacity()
        changed = False

        bucket = turn_bucket(self.engine, len(slot.pending_ids), span_len, min_bucket)
        if pd.lengths[did] + bucket + slot.max_new_tokens > cap:
            self._reset_paged_slot(i, span_len, min_bucket)
            changed = True
            bucket = turn_bucket(self.engine, len(slot.pending_ids), span_len, min_bucket)

        def reserve():
            try:
                pd.ensure_capacity(did, bucket + slot.max_new_tokens)
                return True
            except PagePoolExhausted:
                return False

        if not reserve():
            # pool dry: reclaim from the biggest other dialogues first
            victims = sorted(
                (j for j, s in enumerate(self.slots)
                 if s is not None and j != i and pd.tables[s.stream_id]),
                key=lambda j: -len(pd.tables[self.slots[j].stream_id]),
            )
            for j in victims:
                if reserve():
                    break
                # size the victim's rebuilt history for its REAL pending
                # span (frames since its last fire), not a 1-frame stub —
                # a stub-sized history forces another reset + re-prefill
                # the moment the victim's own next turn arrives
                vs = self.slots[j]
                v_span = max(
                    1,
                    min(vs.frame_idx, self.engine.cfg.max_stream_frames)
                    - vs.last_fire,
                )
                self._reset_paged_slot(j, v_span, 0)
                changed = True
            if not reserve() and pd.tables[did]:
                self._reset_paged_slot(i, span_len, min_bucket)
                changed = True
                bucket = turn_bucket(
                    self.engine, len(slot.pending_ids), span_len, min_bucket
                )
            if not reserve():
                raise PagePoolExhausted(
                    f"pool of {pd.pool.num_pages - 1} allocatable pages "
                    f"cannot hold one turn (bucket {bucket} + "
                    f"{slot.max_new_tokens} decode)"
                )
        return changed

    def _cognify_slots(self, fired: List[int]) -> Dict[int, str]:
        """Run one cognition turn for every fired slot.  Two or more fires on
        the same tick share one batched prefill + one lockstep decode loop."""
        if not fired:
            return {}
        if len(fired) == 1 or not self.batch_cognition:
            return {i: self._cognify_slot(i) for i in fired}
        if self.paged is not None:
            return self._cognify_slots_paged(fired)

        eng = self.engine
        cfg = eng.cfg
        spans = {i: self._slot_span(i) for i in fired}

        # Capacity guard with a SHARED bucket: every fired plan pads to one
        # bucket, so each slot must budget for max over slots, iterated to a
        # fixpoint (a history re-carry can grow a slot's own bucket).
        shared = 0
        for _ in range(4):
            for i in fired:
                slot = self.slots[i]
                suffix = turn_suffix_ids(slot.tokenizer, slot.pending_ids)
                n = len(suffix) - 1 + len(spans[i])
                shared = max(shared, bucket_length(
                    min(n, eng.buckets[-1]), eng.buckets))
            changed = False
            for i in fired:
                slot = self.slots[i]
                new_pending, new_cache = ensure_turn_capacity(
                    eng, slot.tokenizer, slot.pending_ids, slot.turns,
                    slot.cache, len(spans[i]), slot.max_new_tokens,
                    min_bucket=shared,
                )
                if new_cache is not slot.cache:
                    changed = True
                slot.pending_ids, slot.cache = new_pending, new_cache
            if not changed:
                break

        # Any slot the shared bucket still can't fit (KV budget, or a
        # history re-carry that outgrew `shared` after the bounded fixpoint)
        # degrades to its own sequential turn instead of crashing the tick.
        rows, odd = [], []
        for i in fired:
            slot = self.slots[i]
            suffix = turn_suffix_ids(slot.tokenizer, slot.pending_ids)
            n_spliced = len(suffix) - 1 + len(spans[i])
            budget = int(slot.cache.length[0]) + shared + slot.max_new_tokens
            ok = budget <= eng.kv_capacity and n_spliced <= shared
            (rows if ok else odd).append(i)
        texts: Dict[int, str] = {i: self._cognify_slot(i, spans[i]) for i in odd}
        if not rows:
            return texts
        if len(rows) == 1:
            texts[rows[0]] = self._cognify_slot(rows[0], spans[rows[0]])
            return texts

        K = len(rows)
        kb = next((b for b in self._k_buckets if b >= K), K)
        pad = kb - K
        plans = [
            build_turn_plan(eng, self.slots[i].tokenizer, spans[i],
                            self.slots[i].pending_ids, pad_to=shared)
            for i in rows
        ]
        plans += [plans[0]] * pad  # inactive padding rows reuse row 0's plan
        mem_rows = jnp.asarray(np.asarray(rows + [rows[0]] * pad))
        memory = jnp.take(self.state.memory, mem_rows, axis=0)
        cache = stack_kv_caches(
            [self.slots[i].cache for i in rows]
            + [self.slots[rows[0]].cache] * pad
        )
        limits = [self.slots[i].max_new_tokens for i in rows] + [0] * pad
        active = [True] * K + [False] * pad

        last, cache = eng.prefill_batch(plans, memory, cache)
        self._rng, turn_key = jax.random.split(self._rng)
        tok_lists, _steps, cache = eng.generate_from_prefill_batch(
            last, cache, limits, active=active,
            temperature=[self.slots[i].temperature for i in rows] + [0.0] * pad,
            top_k=[self.slots[i].top_k for i in rows] + [0] * pad,
            top_p=[self.slots[i].top_p for i in rows] + [0.0] * pad,
            rng_key=turn_key,
            # per-row matrices: a row only halts on its OWN tokenizer's stop
            # sequences (streams may use heterogeneous tokenizers)
            stop_ids=stack_stop_ids(
                [self.slots[i].stop_ids for i in rows] + [None] * pad
            ),
        )
        parts = split_kv_cache(cache, K)
        for j, i in enumerate(rows):
            slot = self.slots[i]
            slot.interval_ids.append(slot.frame_idx)
            text = self._trim(decode_tokens_to_text(slot.tokenizer, tok_lists[j]))
            slot.turns.append(text)
            slot.pending_ids = post_turn_pending(slot.tokenizer)
            slot.cache = parts[j]
            slot.last_fire = min(slot.frame_idx, cfg.max_stream_frames)
            texts[i] = text
        return texts

    def _cognify_slots_paged(self, fired: List[int]) -> Dict[int, str]:
        """Batched paged cognition: fired dialogues share one bucket, one
        prefill and one lockstep decode over the page pool
        (PagedDialogues.run_turns)."""
        eng = self.engine
        spans = {i: self._slot_span(i) for i in fired}

        # shared-bucket fixpoint (a reset's history re-carry can change a
        # slot's bucket; a pool-pressure reset can change ANY slot's)
        shared = 0
        for _ in range(4):
            for i in fired:
                slot = self.slots[i]
                suffix = turn_suffix_ids(slot.tokenizer, slot.pending_ids)
                n = len(suffix) - 1 + len(spans[i])
                shared = max(shared, bucket_length(
                    min(n, eng.buckets[-1]), eng.buckets))
            changed = False
            for i in fired:
                if self._paged_capacity_guard(i, len(spans[i]), min_bucket=shared):
                    changed = True
            if not changed:
                break

        # slots the shared bucket still can't fit degrade to their own
        # sequential turns instead of crashing the tick
        cap = self._paged_slot_capacity()
        rows, odd = [], []
        for i in fired:
            slot = self.slots[i]
            suffix = turn_suffix_ids(slot.tokenizer, slot.pending_ids)
            n_spliced = len(suffix) - 1 + len(spans[i])
            budget = (self.paged.lengths[slot.stream_id] + shared
                      + slot.max_new_tokens)
            ok = (budget <= cap and n_spliced <= shared
                  # fully reserved (the guard fixpoint is bounded; a row
                  # another row's pressure-reset un-reserved late degrades
                  # to its own sequential turn instead of crashing the tick)
                  and self.paged.pages_needed(
                      slot.stream_id, shared + slot.max_new_tokens) == 0)
            (rows if ok else odd).append(i)

        # Batched rows FIRST: an odd turn's capacity guard may pressure-
        # reset a batched row (reclaiming its reserved pages and re-carrying
        # its history into pending, which can outgrow the shared bucket) —
        # running the batch before any sequential guard keeps the
        # classification above valid when the plans are built.
        texts: Dict[int, str] = {}
        if len(rows) == 1:
            texts[rows[0]] = self._cognify_slot(rows[0], spans[rows[0]])
        elif rows:
            plans = [
                build_turn_plan(eng, self.slots[i].tokenizer, spans[i],
                                self.slots[i].pending_ids, pad_to=shared)
                for i in rows
            ]
            memories = [self.state.memory[i : i + 1] for i in rows]
            limits = [self.slots[i].max_new_tokens for i in rows]
            self._rng, turn_key = jax.random.split(self._rng)
            tok_lists = self.paged.run_turns(
                [self.slots[i].stream_id for i in rows], plans, memories,
                max_new_tokens=limits,
                temperature=[self.slots[i].temperature for i in rows],
                top_k=[self.slots[i].top_k for i in rows],
                top_p=[self.slots[i].top_p for i in rows],
                rng_key=turn_key,
                stop_ids=stack_stop_ids(
                    [self.slots[i].stop_ids for i in rows]
                ),
            )
            for j, i in enumerate(rows):
                slot = self.slots[i]
                slot.interval_ids.append(slot.frame_idx)
                text = self._trim(decode_tokens_to_text(slot.tokenizer, tok_lists[j]))
                slot.turns.append(text)
                slot.pending_ids = post_turn_pending(slot.tokenizer)
                slot.last_fire = min(slot.frame_idx, eng.cfg.max_stream_frames)
                texts[i] = text
        for i in odd:
            texts[i] = self._cognify_slot(i, spans[i])
        return texts

    def _cognify_slot(self, i: int, span: Optional[list] = None) -> str:
        slot = self.slots[i]
        cfg = self.engine.cfg
        cur = min(slot.frame_idx, cfg.max_stream_frames)
        if span is None:
            span = self._slot_span(i)
        slot.interval_ids.append(slot.frame_idx)
        memory_row = self.state.memory[i : i + 1]

        if self.paged is not None:
            self._paged_capacity_guard(i, len(span))
            plan = build_turn_plan(
                self.engine, slot.tokenizer, span, slot.pending_ids
            )
            self._rng, turn_key = jax.random.split(self._rng)
            toks = self.paged.run_turn(
                slot.stream_id, plan, memory_row,
                max_new_tokens=slot.max_new_tokens, stop_ids=slot.stop_ids,
                temperature=slot.temperature, top_k=slot.top_k,
                top_p=slot.top_p, rng_key=turn_key,
            )
            text = self._trim(decode_tokens_to_text(slot.tokenizer, toks))
            slot.pending_ids = post_turn_pending(slot.tokenizer)
            slot.turns.append(text)
            slot.last_fire = cur
            return text

        slot.pending_ids, slot.cache = ensure_turn_capacity(
            self.engine, slot.tokenizer, slot.pending_ids, slot.turns,
            slot.cache, len(span), slot.max_new_tokens,
        )
        self._rng, turn_key = jax.random.split(self._rng)
        text, tokens, slot.pending_ids, slot.cache = run_cognition_turn(
            self.engine, slot.tokenizer, memory_row, span, slot.pending_ids,
            slot.cache, slot.max_new_tokens, stop_ids=slot.stop_ids,
            temperature=slot.temperature, top_k=slot.top_k, top_p=slot.top_p,
            rng_key=turn_key,
        )
        text = self._trim(text)
        slot.turns.append(text)
        slot.last_fire = cur
        return text
