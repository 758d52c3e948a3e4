"""Paged KV cache: many dialogues share one page pool on a chip.

Replaces per-dialogue static rings (models/mistral.py KVCache — capacity
8192 ≈ 1.07 GB per dialogue at 7B bf16) with a SHARED pool of fixed-size
pages plus per-dialogue page tables, so resident memory tracks the SUM of
actual dialogue lengths instead of n_dialogues × max capacity.  This is the
vLLM PagedAttention memory model, TPU-native: static shapes everywhere
(pool, tables and token buffers never change shape, so every program
compiles once), page indirection via gathers/scatters, and the in-tree
Pallas paged-attention kernel (jax.experimental.pallas.ops.tpu.
paged_attention) on the decode hot path.

The reference has no paged cache (its demo holds ONE dialogue's
past_key_values, videollama2_mistral.py:385-439); this is the serving-
density requirement BASELINE.json config 5 implies — one chip, many
concurrent dialogues.

Layout (per layer, matching the in-tree kernel):
  pool.k/v: (L, Hkv, num_pages, page_size, D)
  table:    (B, max_pages_per_seq) int32 pool page ids
  length:   (B,) int32 valid tokens
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TextConfig
from ..models import mistral as lm
from ..models.meta import SplicePlan, splice_embeds
from ..ops.attention import flash_attention, mha_reference
from ..ops.pallas_utils import interpret_mode
from ..ops.norms import rms_norm
from ..ops.rotary import apply_rope, rope_cos_sin
from ..utils.params import linear
from .logit_filters import sample_token


class PagedKV(NamedTuple):
    """Shared page pool.  k/v: per-layer TUPLES of (Hkv, P, page_size, D).

    Per-layer buffers instead of one stacked (L, ...) array: the decode
    forward is an unrolled layer loop whose dynamic_update_slice writes are
    in-place on each layer's own (donated) buffer.  A stacked pool under
    lax.scan stacks the updated pool as ys — copying the entire multi-GB
    pool every decode step (measured at 7B, 512-page pool: 39.5 → 16.4
    ms/step from this layout change alone)."""

    k: tuple
    v: tuple

    @property
    def page_size(self) -> int:
        return self.k[0].shape[2]

    @property
    def num_pages(self) -> int:
        return self.k[0].shape[1]


def init_page_pool(
    cfg: TextConfig, num_pages: int, page_size: int = 64, dtype=jnp.bfloat16
) -> PagedKV:
    if page_size % _WRITE_TILE != 0:
        raise ValueError(
            f"page_size must be a multiple of {_WRITE_TILE} (HBM sublane "
            f"tiling — the decode write kernel RMWs {_WRITE_TILE}-row "
            f"tiles), got {page_size}"
        )
    shape = (cfg.num_kv_heads, num_pages, page_size, cfg.head_dim)
    return PagedKV(
        k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
    )


# ---------------------------------------------------------------------------
# forward over the paged cache
# ---------------------------------------------------------------------------
_WRITE_TILE = 8  # HBM sublane tiling: slices must be 8-row aligned


def _token_write_kernel(pos_ref, knew_ref, vnew_ref, _pk_in, _pv_in,
                        pk_ref, pv_ref, scr_k, scr_v, sem_k, sem_v):
    """Grid (K,): write row i's (Hkv, D) k/v token into its pool slot as an
    in-place aligned read-modify-write.

    HBM arrays are (8, 128)-tiled, so a single token row can't be DMA'd
    directly; instead the enclosing 8-row tile round-trips through VMEM
    with the new token selected in.  Pages are per-dialogue disjoint and
    the grid is sequential, so RMWs never race.  This replaces XLA
    scatter/dus chains for the batched decode write: a scatter copied the
    pool per layer, and K serialized dynamic_update_slices cost ~0.2 ms
    each (26 ms/step at K=4, 7B); these tile DMAs cost microseconds.
    """
    i = pl.program_id(0)
    page = pos_ref[i, 0]
    off = pos_ref[i, 1]
    off_al = (off // _WRITE_TILE) * _WRITE_TILE
    row = off - off_al

    rk = pltpu.make_async_copy(
        pk_ref.at[:, page, pl.ds(off_al, _WRITE_TILE), :], scr_k, sem_k
    )
    rv = pltpu.make_async_copy(
        pv_ref.at[:, page, pl.ds(off_al, _WRITE_TILE), :], scr_v, sem_v
    )
    rk.start()
    rv.start()
    rk.wait()
    rv.wait()

    sel = (
        jax.lax.broadcasted_iota(jnp.int32, scr_k.shape, 1) == row
    )
    scr_k[:, :, :] = jnp.where(sel, knew_ref[i][:, None, :], scr_k[:, :, :])
    scr_v[:, :, :] = jnp.where(sel, vnew_ref[i][:, None, :], scr_v[:, :, :])

    wk = pltpu.make_async_copy(
        scr_k, pk_ref.at[:, page, pl.ds(off_al, _WRITE_TILE), :], sem_k
    )
    wv = pltpu.make_async_copy(
        scr_v, pv_ref.at[:, page, pl.ds(off_al, _WRITE_TILE), :], sem_v
    )
    wk.start()
    wv.start()
    wk.wait()
    wv.wait()


def _write_tokens_dma(pool_k, pool_v, k_tok, v_tok, page_idx, offset):
    """In-place batched single-token pool write via the DMA kernel.
    k_tok/v_tok: (K, Hkv, D); page_idx/offset: (K,)."""
    k = k_tok.shape[0]
    pos = jnp.stack([page_idx, offset], axis=1).astype(jnp.int32)
    return pl.pallas_call(
        _token_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ),
            scratch_shapes=[
                pltpu.VMEM((pool_k.shape[0], _WRITE_TILE, pool_k.shape[3]),
                           pool_k.dtype),
                pltpu.VMEM((pool_v.shape[0], _WRITE_TILE, pool_v.shape[3]),
                           pool_v.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},  # pool operands update in place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret_mode(),
    )(pos, k_tok.astype(pool_k.dtype), v_tok.astype(pool_v.dtype),
      pool_k, pool_v)


def _write_block(pool_k, pool_v, k_new, v_new, table, length, page_size):
    """Write a (B, S, Hkv, D) block into the pool at positions
    length..length+S-1 of each row (pages via the table).

    S == 1 (the decode hot path) uses per-row dynamic_update_slice — XLA
    updates the pool in place.  A general scatter here lowered to a full
    pool copy PER LAYER on TPU (measured: 53 → 14.6 ms per 7B decode step
    after this change).  Prefill (S > 1, once per turn) keeps the scatter.
    """
    b, s, hkv, d = k_new.shape
    if s == 1:
        # Finished rows in a batched decode keep writing at their FROZEN
        # length each remaining step; when that position sits exactly at
        # the row's allocated-capacity boundary, the naive lookup reads
        # table padding (or clamps into the row's own last page) and the
        # junk write lands in LIVE KV.  Route any out-of-table position to
        # the reserved write-sink page 0 (never allocated to a dialogue).
        pos_page = length // page_size
        idx = jnp.minimum(pos_page, table.shape[1] - 1)
        page_idx = jnp.take_along_axis(table, idx[:, None], axis=1)[:, 0]
        page_idx = jnp.where(pos_page < table.shape[1], page_idx, 0)  # (B,)
        offset = length % page_size
        if pool_k.shape[3] % 128 == 0 or jax.default_backend() != "tpu":
            # the DMA kernel's HBM tile slices need a lane-aligned (128)
            # head_dim on real TPUs; CPU runs it interpreted regardless
            return _write_tokens_dma(
                pool_k, pool_v, k_new[:, 0], v_new[:, 0], page_idx, offset
            )
        # tiny-dims TPU fallback (demos / small models): K serialized
        # in-place dynamic_update_slices — slow at scale (~0.2 ms each at
        # 7B, which is why the kernel exists) but correct anywhere
        for i in range(b):
            for pool, tok in ((0, k_new), (1, v_new)):
                upd = tok[i, 0].astype(pool_k.dtype)[:, None, None, :]
                if pool == 0:
                    pool_k = jax.lax.dynamic_update_slice(
                        pool_k, upd, (0, page_idx[i], offset[i], 0))
                else:
                    pool_v = jax.lax.dynamic_update_slice(
                        pool_v, upd, (0, page_idx[i], offset[i], 0))
        return pool_k, pool_v

    pos = length[:, None] + jnp.arange(s)[None, :]           # (B, S)
    page_slot = jnp.take_along_axis(table, pos // page_size, axis=1)  # (B, S)
    offset = pos % page_size
    # pool (Hkv, P, page, D); indices broadcast over the head axis
    k_t = jnp.moveaxis(k_new, 2, 0).astype(pool_k.dtype)     # (Hkv, B, S, D)
    v_t = jnp.moveaxis(v_new, 2, 0).astype(pool_v.dtype)
    pool_k = pool_k.at[:, page_slot, offset, :].set(k_t)
    pool_v = pool_v.at[:, page_slot, offset, :].set(v_t)
    return pool_k, pool_v


def _gather_seq(pool_side, table):
    """(Hkv, P, page, D) + (B, maxp) → (B, maxp*page, Hkv, D) contiguous view
    of each row's logical cache (prefill path; bandwidth ∝ allocated pages)."""
    g = pool_side[:, table]                                  # (Hkv, B, maxp, page, D)
    hkv, b, mp, pg, d = g.shape
    return g.transpose(1, 2, 3, 0, 4).reshape(b, mp * pg, hkv, d)


def _paged_decode_attention(q, pool_k, pool_v, table, length):
    """One-token decode attention over the paged cache.

    q: (B, 1, H, D).  On TPU this is the in-tree Pallas paged-attention
    kernel (reads only the valid pages — bandwidth ∝ actual length); on CPU
    (tests) a reference gather + masked attention.
    """
    # the in-tree kernel's Mosaic lowering needs MXU/VPU-tileable dims —
    # head_dim a lane multiple (128) in particular; tiny configs (demos,
    # small models) fall back to the reference gather path on TPU too
    kernel_ok = q.shape[-1] % 128 == 0
    if jax.default_backend() == "tpu" and kernel_ok:
        from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

        mp = table.shape[1]
        ppcb = next(d for d in (8, 4, 2, 1) if mp % d == 0)
        # the kernel applies NO softmax scale (qk = q·k raw) — pre-scale q
        scale = 1.0 / (q.shape[-1] ** 0.5)
        out = paged_attention(
            (q[:, 0] * scale).astype(q.dtype),  # (B, H, D)
            pool_k, pool_v, length, table,
            pages_per_compute_block=ppcb,
        )
        return out[:, None]
    k_seq = _gather_seq(pool_k, table)
    v_seq = _gather_seq(pool_v, table)
    kv_mask = jnp.arange(k_seq.shape[1])[None, :] < length[:, None]
    return mha_reference(q, k_seq.astype(q.dtype), v_seq.astype(q.dtype), kv_mask=kv_mask)


def paged_text_forward(
    params,
    cfg: TextConfig,
    pool: PagedKV,
    table: jax.Array,   # (B, max_pages)
    length: jax.Array,  # (B,)
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
):
    """text_forward's cache branch over the paged pool: append the block at
    `length`, attend to the whole valid prefix, return (logits, pool).
    Lengths are tracked host-side by the caller (PagedDialogues.lengths)."""
    x = inputs_embeds if inputs_embeds is not None else lm.embed_tokens(params, input_ids)
    b, s, d = x.shape
    page_size = pool.page_size
    positions = length[:, None] + jnp.arange(s)[None, :]

    # UNROLLED layer loop (not lax.scan): each layer's in-place page writes
    # land on its own buffer and the stacked-ys pool copy disappears — see
    # PagedKV.  Stacked weights are statically sliced per layer; XLA reads
    # matmul operands through the slice without materializing copies.
    new_k, new_v = [], []
    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[l], params["layers"])
        y = rms_norm(x, lp["input_norm"]["weight"], cfg.rms_norm_eps)
        q, k, v = lm.qkv_proj(y, lp, cfg)  # fused or separate layout
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        pk, pv = _write_block(
            pool.k[l], pool.v[l], k, v, table, length, page_size
        )
        new_k.append(pk)
        new_v.append(pv)

        if s == 1:
            o = _paged_decode_attention(q, pk, pv, table, length + 1)
        else:
            k_seq = _gather_seq(pk, table).astype(q.dtype)
            v_seq = _gather_seq(pv, table).astype(q.dtype)
            o = flash_attention(
                q, k_seq, v_seq, causal=True, kv_len=length + s, q_offset=length
            )
        x = x + linear(o.reshape(b, s, cfg.q_dim), lp["o"])
        y = rms_norm(x, lp["post_norm"]["weight"], cfg.rms_norm_eps)
        x = x + lm._mlp(y, lp, cfg)

    x = rms_norm(x, params["final_norm"]["weight"], cfg.rms_norm_eps)
    logits = lm.lm_head(params, cfg, x)
    return logits, PagedKV(k=tuple(new_k), v=tuple(new_v))


# ---------------------------------------------------------------------------
# host-side page allocator + per-dialogue state
# ---------------------------------------------------------------------------
class PagePoolExhausted(RuntimeError):
    pass


class PagedDialogues:
    """Host allocator + engine programs for N dialogues on one shared pool.

    Each dialogue owns a page table (host list) and a token length; prefill
    and decode run as compile-once programs over (pool, table, length).  When
    the pool runs dry, ensure_capacity raises PagePoolExhausted — the serving
    layer evicts (drop the oldest dialogue, reclaim its pages), mirroring the
    dense path's ensure_turn_capacity reset semantics.
    """

    def __init__(self, engine, num_pages: int, page_size: int = 64,
                 max_pages_per_seq: Optional[int] = None, dtype=None):
        self.engine = engine
        cfg = engine.cfg.text
        if dtype is None:
            from .engine import _float_dtype

            dtype = _float_dtype(engine.params["text"])
        self.page_size = page_size
        # page 0 is the WRITE SINK: never allocated to a dialogue, so both
        # zero-padded table entries and out-of-range decode writes (a
        # finished batched row writing at its frozen length) land in
        # garbage space instead of another dialogue's KV (_write_block).
        # The pool carries num_pages + 1 PHYSICAL pages so the advertised
        # num_pages are all usable — sizing math (max_pages,
        # dialogue_capacity, MultiStreamServer's default pool size) counts
        # allocatable pages, and a dialogue growing to its advertised
        # capacity must not hit PagePoolExhausted one page short.
        self.pool = init_page_pool(cfg, num_pages + 1, page_size, dtype)
        self.max_pages = max_pages_per_seq or min(
            num_pages, -(-engine.kv_capacity // page_size)
        )
        self._free: List[int] = list(range(1, num_pages + 1))
        self.tables: dict = {}   # dialogue id -> list of page ids
        self.lengths: dict = {}  # dialogue id -> int
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._decode = jax.jit(self._decode_impl, static_argnums=(5,),
                               donate_argnums=(1,))

    # -- allocator ---------------------------------------------------------
    def open(self, did: str) -> None:
        if did in self.tables:
            raise ValueError(f"dialogue {did!r} already open")
        self.tables[did] = []
        self.lengths[did] = 0

    def close(self, did: str) -> None:
        self._free.extend(self.tables.pop(did))
        del self.lengths[did]

    def free_pages(self) -> int:
        return len(self._free)

    @property
    def dialogue_capacity(self) -> int:
        """Max tokens one dialogue can hold (per-seq page budget)."""
        return self.max_pages * self.page_size

    def reset(self, did: str) -> None:
        """Reclaim a dialogue's pages but keep it open (the paged analogue
        of handing a dense session a fresh KV cache on capacity overflow —
        the caller re-carries recent turns as text)."""
        self._free.extend(self.tables[did])
        self.tables[did] = []
        self.lengths[did] = 0

    def pages_needed(self, did: str, n_tokens: int) -> int:
        """How many NEW pages ensure_capacity(did, n_tokens) would allocate."""
        need_total = -(-(self.lengths[did] + n_tokens) // self.page_size)
        return max(need_total - len(self.tables[did]), 0)

    def ensure_capacity(self, did: str, n_tokens: int) -> None:
        """Allocate pages so dialogue `did` can hold n_tokens more tokens."""
        need_total = -(-(self.lengths[did] + n_tokens) // self.page_size)
        grow = need_total - len(self.tables[did])
        if need_total > self.max_pages:
            raise PagePoolExhausted(
                f"dialogue {did!r} needs {need_total} pages > per-seq max "
                f"{self.max_pages}"
            )
        if grow > len(self._free):
            raise PagePoolExhausted(
                f"pool dry: need {grow} pages, {len(self._free)} free"
            )
        for _ in range(max(grow, 0)):
            self.tables[did].append(self._free.pop())

    def _table_arr(self, did: str) -> jax.Array:
        t = self.tables[did]
        pad = self.max_pages - len(t)
        return jnp.asarray(t + [0] * pad, jnp.int32)[None]

    # -- engine programs ----------------------------------------------------
    def _prefill_impl(self, params, pool, table, length,
                      token_ids, mem_index, use_mem, memory, real_len):
        embeds = splice_embeds(params["text"], token_ids, mem_index, use_mem, memory)
        logits, pool = paged_text_forward(
            params["text"], self.engine.cfg.text, pool, table, length,
            inputs_embeds=embeds,
        )
        idx = jnp.maximum(real_len - 1, 0).astype(jnp.int32)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0, :]
        return last, pool

    def _decode_impl(self, params, pool, table, length, first_token, max_new: int,
                     eos_id, temperature, top_k, top_p, rng_key, limits,
                     stop_ids):
        """Lockstep batched decode with per-row token limits (`limits` (K,)
        int32, the paged analogue of the dense _decode_batch_impl limits) —
        rows that hit their own limit stop advancing their length/pages
        while the rest continue.  stop_ids: stop sequences left-padded with
        -1 (in-loop KeywordsStoppingCriteria) — (S, L) shared across rows,
        or (K, S, L) per-row (stack_stop_ids; heterogeneous tokenizers);
        (0, 1) for none."""
        cfg = self.engine.cfg.text
        L = stop_ids.shape[-1]
        per_row = stop_ids if stop_ids.ndim == 3 else stop_ids[None]

        def stop_hit(tail):  # (K, L) → (K,)
            # all-(-1) padding rows of a ragged per-row stack never match
            concrete = jnp.any(per_row >= 0, axis=-1)
            hit = jnp.all(
                (per_row == tail[:, None, :]) | (per_row < 0), axis=-1
            )
            return jnp.any(jnp.logical_and(hit, concrete), axis=-1)

        def cond(carry):
            i, tok, pool, length, buf, done, key, tail = carry
            return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(done)))

        def body(carry):
            i, tok, pool, length, buf, done, key, tail = carry
            logits, pool = paged_text_forward(
                params["text"], cfg, pool, table, length, input_ids=tok[:, None]
            )
            length = length + jnp.where(done, 0, 1).astype(jnp.int32)
            key, sub = jax.random.split(key)
            # per-row (K,) sampling knobs (streaming/logit_filters.py — the
            # reference decode engine's top-k/top-p/temperature filters)
            nxt = sample_token(sub, logits[:, -1], temperature, top_k, top_p)
            limit_hit = i + 1 >= limits
            nxt = jnp.where(jnp.logical_or(done, limit_hit), eos_id, nxt)
            tail = jnp.concatenate([tail[:, 1:], nxt[:, None]], axis=1)
            # sampled tokens land in the buffer immediately (col 0 = first
            # token) so stop-terminating tokens reach host-side trimming
            idx = jnp.minimum(i + 1, max_new - 1)
            col = jnp.where(i + 1 < max_new, nxt, buf[:, idx])
            buf = buf.at[:, idx].set(col)
            done = jnp.logical_or(done, nxt == eos_id)
            done = jnp.logical_or(done, stop_hit(tail))
            done = jnp.logical_or(done, limit_hit)
            return (i + 1, nxt, pool, length, buf, done, key, tail)

        done0 = jnp.logical_or(first_token == eos_id, limits <= 0)
        buf = jnp.full((first_token.shape[0], max_new), eos_id, jnp.int32)
        buf = buf.at[:, 0].set(jnp.where(done0, eos_id, first_token))
        tail0 = jnp.full((first_token.shape[0], L), -2, jnp.int32)
        tail0 = tail0.at[:, L - 1].set(jnp.where(done0, -2, first_token))
        done0 = jnp.logical_or(done0, stop_hit(tail0))
        _, _, pool, length, buf, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), first_token, pool, length, buf, done0, rng_key, tail0),
        )
        return buf, length, pool

    # -- per-turn API --------------------------------------------------------
    def run_turns(self, dids: List[str], plans: List[SplicePlan], memories,
                  max_new_tokens=128, temperature=0.0, top_k=0, top_p=0.0,
                  rng_key=None, stop_ids=None) -> List[List[int]]:
        """One cognition turn for EACH dialogue, batched: one prefill and one
        lockstep decode loop over the shared pool (paged_text_forward takes
        batch-K tables/lengths, so this is the paged analogue of the dense
        continuous-batched cognition — K simultaneous turns cost max(len_k)
        decode steps with amortized weight reads AND the paged memory model).
        All plans must share one bucket; memories: list of (1, M, D) rows;
        max_new_tokens: one int, or a per-dialogue list of K ints.
        Returns K generated token lists."""
        eng = self.engine
        memories = list(memories)
        if not (len(dids) == len(plans) == len(memories)):
            raise ValueError(
                f"run_turns needs matching lists: {len(dids)} dialogues, "
                f"{len(plans)} plans, {len(memories)} memories"
            )
        if isinstance(max_new_tokens, int):
            limits = [max_new_tokens] * len(dids)
        else:
            limits = list(max_new_tokens)
            if len(limits) != len(dids):
                raise ValueError(
                    f"{len(limits)} limits for {len(dids)} dialogues"
                )
        buckets = {len(p.token_ids) for p in plans}
        if len(buckets) != 1:
            raise ValueError(f"plans must share one bucket, got {sorted(buckets)}")
        bucket = buckets.pop()
        for did, lim in zip(dids, limits):
            self.ensure_capacity(did, bucket + lim)
        table = jnp.concatenate([self._table_arr(d) for d in dids], axis=0)
        length = jnp.asarray([self.lengths[d] for d in dids], jnp.int32)

        last, self.pool = self._prefill(
            eng.params, self.pool, table, length,
            jnp.asarray(np.stack([p.token_ids for p in plans])),
            jnp.asarray(np.stack([p.mem_index for p in plans])),
            jnp.asarray(np.stack([p.use_mem for p in plans])),
            jnp.concatenate(list(memories), axis=0),
            jnp.asarray([p.length for p in plans], jnp.int32),
        )
        for d, p in zip(dids, plans):
            self.lengths[d] += p.length
        length = jnp.asarray([self.lengths[d] for d in dids], jnp.int32)

        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        from .engine import _EMPTY_STOP_IDS, _knob_rows
        from .logit_filters import sample_first_token

        K = len(dids)
        temp_arr = _knob_rows(temperature, K, jnp.float32)
        topk_arr = _knob_rows(top_k, K, jnp.int32)
        topp_arr = _knob_rows(top_p, K, jnp.float32)
        rng_key, k0 = jax.random.split(rng_key)
        first = sample_first_token(k0, last, temp_arr, topk_arr, topp_arr)

        buf, new_len, self.pool = self._decode(
            eng.params, self.pool, table, length, first, max(max(limits), 1),
            jnp.int32(eng.eos_token_id), temp_arr, topk_arr, topp_arr, rng_key,
            jnp.asarray(limits, jnp.int32),
            jnp.asarray(_EMPTY_STOP_IDS if stop_ids is None else stop_ids,
                        jnp.int32),
        )
        from .engine import tokens_until_eos

        rows = np.asarray(buf)
        for i, d in enumerate(dids):
            self.lengths[d] = int(new_len[i])
        return [tokens_until_eos(rows[i], eng.eos_token_id)
                for i in range(len(dids))]

    def run_turn(self, did: str, plan: SplicePlan, memory,
                 max_new_tokens: int = 128, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0,
                 rng_key=None, stop_ids=None) -> List[int]:
        """One cognition turn for dialogue `did` over the shared pool:
        bucketed prefill of the spliced suffix + greedy/sampled decode.
        Returns the generated token list."""
        return self.run_turns(
            [did], [plan], [memory], max_new_tokens=max_new_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            rng_key=rng_key, stop_ids=stop_ids,
        )[0]
