"""The two jitted programs of event-gated cognition.

Design (SURVEY.md §7 / BASELINE.json north star): ONE perception program
(ViT step + Mamba state update + gate) and ONE cognition program (bucketed
prefill + while-loop decode on a persistent KV cache), each compiled once
with static shapes.  Gating is host-side control flow on a 2-float gate
output, so it never recompiles either program.

Reference behavior being replaced:
  stream_generate_demo (videollama2_mistral.py:385-439) +
  prepare_..._inference_demo (videollama2_arch.py:911-993), which re-encode
  and re-scan every cached frame per frame.  Here each frame costs one ViT
  forward + one O(1) Mamba step + a 1-token gate forward.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamMindConfig
from ..models import mistral as lm
from ..models import projector as proj
from ..models.meta import SplicePlan, build_splice_plan, bucket_length, splice_embeds
from ..models.vit import vit_forward
from .logit_filters import sample_first_token, sample_token
from .state import StreamState

DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def _float_dtype(tree):
    """Working float dtype of a (possibly quantized) param tree.

    Prefers a sub-fp32 float if ANY leaf uses one: an int8/int4-quantized
    tree keeps embeddings/norms at the original compute dtype (bf16) but
    carries fp32 quantization SCALES — and tree order can put a scale
    first, which previously made KV caches and page pools silently
    allocate at fp32 (double memory + bandwidth) on quantized serving
    loads."""
    first = None
    for leaf in jax.tree.leaves(tree):
        # jnp.issubdtype (not np): bfloat16 is an ml_dtypes extension that
        # numpy's issubdtype does not class as floating
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if first is None:
                first = leaf.dtype
            if leaf.dtype != jnp.float32:
                return leaf.dtype
    return first if first is not None else jnp.bfloat16



class StreamMindEngine:
    """Holds params + compiled programs.  One instance per model replica;
    many StreamSession objects can share it (each owns its StreamState)."""

    def __init__(
        self,
        params,
        cfg: StreamMindConfig,
        eos_token_id: int = 2,
        prefill_buckets=DEFAULT_BUCKETS,
        kv_capacity: Optional[int] = None,
        attn_impl: str = "auto",
        quantize_gate: bool = False,
        fast_vision=False,  # False | True (bf16 softmax) | "int8" (int8-MXU ViT)
        mesh=None,
        split_perceive: bool = False,
    ):
        """mesh: optional jax.sharding.Mesh — tensor-parallel SERVING.  The
        params are placed by the partitioning rules and all engine-created
        state (KV caches, stream state) by parallel/serving.py's specs;
        GSPMD inserts the collectives inside the jitted programs.  This is
        the TPU-native form of the reference's tensor_parallel.py:111-241
        serving layer (bf16-7B = 14.5 GB serves on 16 GB v5e chips only
        split this way)."""
        if fast_vision and attn_impl == "auto":
            # bf16-softmax ViT blocks: ~20% faster perception on v5e with
            # ~2% feature error vs fp32 softmax (serve-path option, like
            # quantize_gate)
            attn_impl = "bf16"
        if fast_vision == "int8" and "vision" in params:
            # int8-MXU ViT tier: dynamic activation quant + int8 weights —
            # 4.46 → 3.10 ms/frame (B=1), 24.4 → 14.5 ms at B=8 on v5e;
            # features within 2.2% rms of bf16 (utils/quantize.py)
            from ..utils.quantize import quantize_vit_params

            params = dict(params)
            params["vision"] = quantize_vit_params(params["vision"])
        if quantize_gate not in (False, None, True, "int8", "int4"):
            raise ValueError(
                f"quantize_gate must be True/'int8' or 'int4', got "
                f"{quantize_gate!r}"
            )
        if quantize_gate and "cls_net" in params.get("projector", {}):
            # weight-only quantization of the per-frame gate LM — it is pure
            # weight bandwidth on the perception hot path (utils/quantize.py).
            # True/"int8": per-channel int8 (134 → 160 fps measured);
            # "int4": per-channel int4 through the fused Pallas matvec
            # (ops/int4_matvec.py) — half the gate bytes again.
            from ..utils.quantize import quantize_gate_params

            params = dict(params)
            params["projector"] = dict(params["projector"])
            params["projector"]["cls_net"] = quantize_gate_params(
                params["projector"]["cls_net"],
                bits=4 if quantize_gate == "int4" else 8,
            )
        self.mesh = mesh
        if mesh is None and "vision" in params:
            # serving-path QKV fusion: one GEMM (and, on the int8 tier, one
            # dynamic-quantize pass) instead of three per encoder layer.
            # Bit-identical (output-dim concat changes no sum order); the
            # mesh path keeps separate q/k/v so the tensor-parallel
            # partitioning rules apply unchanged.
            from ..models.vit import fuse_vit_qkv

            params = dict(params)
            params["vision"] = fuse_vit_qkv(params["vision"])
        if mesh is None and "text" in params:
            # decode-side fusion: q/k/v → qkv, mlp gate/up → gateup
            # (bit-identical row-concat; measured 680 → 732 GB/s on the
            # scanned int8 decode weight stream, ~0.7 ms/token at 7B —
            # tools/_probe_decode_fusion.py).  Quantized trees always
            # fuse; plain-float trees only at small dims — the concat
            # transient (old + new gate/up live at once) is ~3.8 GB at
            # 7B int8 but ~7.5 GB at bf16, which would push a 14.5 GB
            # resting tree past a 16 GB chip.  The mesh path keeps
            # separate leaves so the tensor-parallel partitioning rules
            # apply unchanged; the gate LM tree (projector.cls_net) is
            # never fused — its single-token shortcut reads only v.
            from ..models.mistral import fuse_text_linears
            from ..utils.params import param_bytes

            q_leaf = params["text"].get("layers", {}).get("q", {})
            quantized = isinstance(q_leaf, dict) and (
                {"w_int8", "w_int4", "w_int4pc"} & set(q_leaf)
            )
            if quantized or param_bytes(params["text"]) < 2 << 30:
                params = dict(params)
                params["text"] = fuse_text_linears(params["text"])
        if mesh is not None:
            from ..parallel import shard_params
            from ..parallel.serving import mesh_fits_inference

            if not mesh_fits_inference(mesh, cfg):
                raise ValueError(
                    f"mesh tp={dict(mesh.shape).get('tp', 1)} does not divide "
                    f"num_kv_heads={cfg.text.num_kv_heads} / Mamba "
                    f"d_inner={cfg.mamba.d_model * cfg.mamba.expand}"
                )
            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.eos_token_id = eos_token_id
        self.buckets = tuple(b for b in prefill_buckets if b <= cfg.text.max_position_embeddings)
        self.kv_capacity = kv_capacity or min(cfg.text.max_position_embeddings, 8192)
        self.attn_impl = attn_impl
        # decode layer-scan unroll: REMOVED after the r5 chip sweep
        # (_sweep_unroll.py) — rolled decode wins at 7B on v5e (int8:
        # 11.83 ms/tok rolled vs 12.65 full / 34 ms unroll-4; int4pc:
        # 12.09 rolled, everything else worse).  The weight-fetch
        # pipelining rationale that helps the 4-layer gate LM (which IS
        # fully unrolled in projector.gate_logits) inverts at 32 layers:
        # the unrolled decode program spills and stops overlapping.
        # MoE dispatch for the text forwards: the tensor-parallel serving
        # path shards params via NamedSharding with NO jax.set_mesh ambient
        # mesh, so _moe_mlp's auto-detection cannot see the sharding at
        # trace time (ADVICE r4) — resolve from the engine's own mesh and
        # pass explicitly (models/mistral.py _resolve_moe_dispatch applies
        # the divisibility/FLOPs guards).
        self.moe_dispatch = (
            mesh if mesh is not None and cfg.text.num_experts > 1 else None
        )

        # params are explicit jit ARGUMENTS, never closure captures: on the
        # remote-compile (tunneled) platform, arrays captured via `self`
        # are baked into the program payload — at full size that means
        # minutes of host serialization and a multi-GB compile request.
        # split_perceive: run the B=1 tick as the same two dispatched
        # programs as the batched tick (vision, then projector+gate+state)
        # instead of one fused program — knob for measuring the fused-
        # program scheduling pathology at B=1 (see the batched-tick note
        # below); default stays fused (B=1 measured no pathology in r4).
        self.split_perceive = split_perceive
        self._perceive = jax.jit(self._perceive_impl, donate_argnums=(2,))
        self._perceive_post = jax.jit(self._perceive_post_impl, donate_argnums=(2,))
        # the batched tick runs as TWO programs (vision, then
        # mamba+gate+state), dispatched back-to-back: measured on v5e at
        # S=8, the single fused program costs ~25.5 ms while its stages
        # compiled separately sum to ~18 — XLA's static schedule for the
        # combined graph stops software-pipelining the ViT's weight
        # fetches once the mamba step's fp32 VPU chain is appended
        # (full-unroll even turns harmful: 25.4 vs 23.8 rolled).  Async
        # dispatch makes the split free; B=1 shows no such pathology and
        # stays fused.
        self._perceive_batch_vision = jax.jit(self._perceive_batch_vision_impl)
        self._perceive_batch_post = jax.jit(
            self._perceive_batch_post_impl, donate_argnums=(2,)
        )
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(5,))
        self._decode = jax.jit(self._decode_impl, static_argnums=(4,), donate_argnums=(2,))
        self._decode_step = jax.jit(self._decode_step_impl, donate_argnums=(2,))

    # -- perception -------------------------------------------------------
    def _perceive_impl(self, params, pixels, state: StreamState):
        """pixels: (1, 3, H, W) one frame.  Returns (gate_probs, new_state)."""
        feats = vit_forward(params["vision"], self.cfg.vision, pixels,
                            attn_impl=self.attn_impl, unroll="full")
        return self._post_vision(params, feats, state)

    def _post_vision(self, params, feats, state: StreamState):
        """Shared program-2 body of the B=1 tick: projector step + gate +
        ring write.  Traced inside _perceive (fused) AND _perceive_post
        (split) — one definition keeps the two bit-identical by
        construction."""
        p, cfg = params, self.cfg
        mem_tok, mamba_state = proj.mamba_project_step(
            p["projector"], cfg, feats, state.mamba
        )
        logits = proj.gate_decision_step(p["projector"], cfg, mem_tok)
        gate_probs = jax.nn.softmax(logits[0].astype(jnp.float32))

        slot = jnp.minimum(state.frame_idx, cfg.max_stream_frames - 1)
        memory = jax.lax.dynamic_update_slice(
            state.memory, mem_tok[:, None, :].astype(state.memory.dtype), (0, slot, 0)
        )
        new_state = StreamState(
            mamba=mamba_state,
            memory=memory,
            frame_idx=state.frame_idx + 1,
            last_fire=state.last_fire,
        )
        return gate_probs, new_state

    def perceive_step(self, pixels, state: StreamState):
        if self.split_perceive:
            feats = self._perceive_batch_vision(self.params, pixels)
            return self._perceive_post(self.params, feats, state)
        return self._perceive(self.params, pixels, state)

    def _perceive_post_impl(self, params, feats, state: StreamState):
        """Program 2 of the SPLIT B=1 tick (split_perceive=True): the same
        two-program shape as the batched tick, for measuring whether the
        fused-program scheduling pathology (see __init__) also taxes B=1."""
        return self._post_vision(params, feats, state)

    def _perceive_batch_vision_impl(self, params, pixels):
        """Program 1 of the batched tick: the vision tower alone (see the
        split rationale at the jit sites in __init__)."""
        return vit_forward(params["vision"], self.cfg.vision, pixels,
                           attn_impl=self.attn_impl, unroll="full")

    def _perceive_batch_post_impl(self, params, feats, state, feed_mask):
        """Program 2 of the batched tick: projector step + gate + state
        update over S streams.  One gate forward amortizes the weight reads
        across all live streams — the continuous-batching half of BASELINE
        config 5.  feed_mask (S,) bool: slots with False (idle/empty this
        tick) keep their carried state untouched.  Returns
        (gate_probs (S, 2), new_state)."""
        p, cfg = params, self.cfg
        mem_tok, mamba_state = proj.mamba_project_step(
            p["projector"], cfg, feats, state.mamba
        )
        logits = proj.gate_decision_step(p["projector"], cfg, mem_tok)
        gate_probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        slots = jnp.minimum(state.frame_idx, cfg.max_stream_frames - 1)

        # unfed rows keep their ring untouched: select at the SLOT (one
        # (1, D) row per stream) rather than where-ing the whole ring —
        # a full-ring select read+wrote 3x the (S, capacity, D) buffer
        # every tick (~230 MB at S=8 full dims, ~0.3 ms) and broke the
        # donated in-place update
        def put(mem_row, tok_row, slot, feed):
            cur = jax.lax.dynamic_slice(mem_row, (slot, 0), (1, mem_row.shape[1]))
            new = jnp.where(feed, tok_row[None].astype(mem_row.dtype), cur)
            return jax.lax.dynamic_update_slice(mem_row, new, (slot, 0))

        memory = jax.vmap(put)(state.memory, mem_tok, slots, feed_mask)

        # unfed slots: freeze every per-slot state component
        mamba_state = state.mamba._replace(
            conv=jnp.where(feed_mask[None, :, None, None], mamba_state.conv, state.mamba.conv),
            ssm=jnp.where(feed_mask[None, :, None, None], mamba_state.ssm, state.mamba.ssm),
        )
        new_state = StreamState(
            mamba=mamba_state,
            memory=memory,
            frame_idx=state.frame_idx + feed_mask.astype(jnp.int32),
            last_fire=state.last_fire,
        )
        return gate_probs, new_state

    def perceive_step_batch(self, pixels, state: StreamState, feed_mask=None):
        """Batched perception over S streams (state built by
        init_multistream_state).  Two back-to-back program dispatches
        (vision, then projector+gate+state) — async dispatch pipelines
        them, and the split sidesteps a measured XLA scheduling pathology
        in the single fused program (~25.5 → ~18 ms at S=8 full dims)."""
        if feed_mask is None:
            feed_mask = jnp.ones((pixels.shape[0],), bool)
        feats = self._perceive_batch_vision(self.params, pixels)
        return self._perceive_batch_post(self.params, feats, state, feed_mask)

    def perceive_burst(self, pixels, state: StreamState):
        """Catch-up path: a burst of T frames for ONE stream in a single
        chunked scan (equals T perceive_steps; one ViT batch + one stateful
        Mamba forward).  pixels (T, 3, H, W); returns (gate_probs of the
        LAST frame, new_state).  Compiled per frame-count bucket."""
        feats = self._perceive_batch_vision(self.params, pixels)
        return self._perceive_burst_jit(self.params, feats, state)

    @functools.cached_property
    def _perceive_burst_jit(self):
        return jax.jit(self._perceive_burst_impl, donate_argnums=(2,))

    def _perceive_burst_impl(self, params, feats, state: StreamState):
        """Program 2 of the burst tick (vision runs separately — same
        fused-program scheduling pathology as the batched tick: ViT at
        T frames plus the mamba chunk in one program schedules worse
        than the two dispatched back-to-back)."""
        p, cfg = params, self.cfg
        t = feats.shape[0]
        mem_toks, mamba_state = proj.mamba_project_chunk(
            p["projector"], cfg, feats[None], state.mamba
        )  # (1, T, D)
        logits = proj.gate_decision_step(p["projector"], cfg, mem_toks[:, -1])
        gate_probs = jax.nn.softmax(logits[0].astype(jnp.float32))

        # per-frame clamped writes — identical slot semantics to T single
        # perceive_steps (a block write at min(idx, M-t) would clobber older
        # slots that the pending gate span still references)
        memory = state.memory
        for j in range(t):  # t is static (burst bucket size)
            slot = jnp.minimum(state.frame_idx + j, cfg.max_stream_frames - 1)
            memory = jax.lax.dynamic_update_slice(
                memory, mem_toks[:, j : j + 1].astype(memory.dtype), (0, slot, 0)
            )
        new_state = StreamState(
            mamba=mamba_state,
            memory=memory,
            frame_idx=state.frame_idx + t,
            last_fire=state.last_fire,
        )
        return gate_probs, new_state

    # -- cognition --------------------------------------------------------
    def _prefill_impl(self, params, token_ids, mem_index, use_mem, memory, cache, real_len):
        """Bucketed prefill of right-padded suffix blocks.

        token_ids/mem_index/use_mem: (B, P); memory: (B, M, D);
        real_len: (B,) int32 — true suffix length per row.  Returns
        (next_token_logits (B, V), cache) with each cache row advanced by its
        real_len.  B > 1 is the continuous-batching path: several streams'
        turns prefill in one program (SURVEY §7 hard part — heterogeneous
        work batched without head-of-line blocking).
        """
        p, cfg = params, self.cfg
        embeds = splice_embeds(p["text"], token_ids, mem_index, use_mem, memory)
        logits, cache = lm.text_forward(
            p["text"], cfg.text, inputs_embeds=embeds, cache=cache,
            cache_advance=real_len, moe_dispatch=self.moe_dispatch,
        )
        idx = jnp.maximum(real_len - 1, 0).astype(jnp.int32)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0, :]
        return last, cache

    def _decode_impl(self, params, first_token, cache, eos_id, max_new: int,
                     temperature, top_k, top_p, rng_key, stop_ids):
        """Decode loop with early EOS exit, fixed token buffer.

        temperature <= 0 → greedy; else top-k/top-p/temperature sampling
        (streaming/logit_filters.py — the reference decode engine's filter set,
        generation.py:37-119; its __init__.py infer uses do_sample with
        temperature 0.2).

        stop_ids: (S, L) int32, each row a stop token sequence left-padded
        with -1 — the in-loop KeywordsStoppingCriteria (reference
        mm_utils.py:616): decoding halts within one step of emitting a stop
        sequence instead of rambling to EOS/max (host-side text trimming
        stays as the correctness net for tokenization-boundary mismatches).
        Pass shape (0, 1) for no stops.
        """
        p, cfg = params, self.cfg
        L = stop_ids.shape[1]

        def stop_hit(tail):
            return jnp.any(jnp.all((stop_ids == tail[None, :]) | (stop_ids < 0), axis=1))

        def cond(carry):
            i, tok, cache, buf, done, key, tail = carry
            return jnp.logical_and(i < max_new, jnp.logical_not(done))

        def body(carry):
            i, tok, cache, buf, done, key, tail = carry
            logits, cache = lm.text_forward(
                p["text"], cfg.text, input_ids=tok[None, None], cache=cache,
                moe_dispatch=self.moe_dispatch,
            )
            key, sub = jax.random.split(key)
            nxt = sample_token(sub, logits[0, -1], temperature, top_k, top_p)
            # the sampled token is written IMMEDIATELY (at i+1; slot 0 holds
            # first_token) so a stop-terminating token is present in the
            # buffer for host-side trimming; it is fed to the cache only if
            # the loop survives to the next iteration (EOS was never fed
            # either — returned counts exclude terminal junk via `n` below)
            idx = jnp.minimum(i + 1, max_new - 1)
            buf = buf.at[idx].set(jnp.where(i + 1 < max_new, nxt, buf[idx]))
            tail = jnp.concatenate([tail[1:], nxt[None]])
            done = jnp.logical_or(nxt == eos_id, stop_hit(tail))
            return (i + 1, nxt, cache, buf, done, key, tail)

        buf = jnp.full((max_new,), eos_id, jnp.int32).at[0].set(first_token)
        tail0 = jnp.full((L,), -2, jnp.int32).at[L - 1].set(first_token)
        i, tok_last, cache, buf, done, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), first_token, cache, buf, stop_hit(tail0), rng_key,
             tail0),
        )
        # valid-token count: iterations fed = i; a stop-hit's final token is
        # buffered but unfed → one extra valid token (EOS stays excluded)
        n = i + jnp.logical_and(done, tok_last != eos_id).astype(jnp.int32)
        return buf, jnp.minimum(n, max_new), cache

    def _decode_batch_impl(self, params, first_tokens, cache, eos_id, max_new: int,
                           limits, temperature, top_k, top_p, rng_key, active,
                           stop_ids):
        """Lockstep batched decode over K rows with per-row EOS.

        Each device step decodes one token for EVERY still-live row — the
        continuous-batching half of cognition (SURVEY §7): two simultaneous
        gate fires cost max(len_a, len_b) decode steps, not len_a + len_b,
        and the 7B weight read per step is amortized across rows.

        first_tokens: (K,) already-sampled first tokens; limits: (K,) per-row
        max new tokens; active: (K,) bool — False rows are padding (bucketed
        K) and never advance their cache.  Rows that finish early stop
        advancing their cache (cache_advance 0) and emit eos into the buffer.
        stop_ids: stop sequences left-padded with -1 (the in-loop
        KeywordsStoppingCriteria) — (S, L) applies one shared matcher to
        every row; (K, S, L) gives each row its OWN matrix (heterogeneous
        tokenizers must not stop on another stream's token ids —
        stack_stop_ids builds this).  (0, 1) for none.
        """
        p, cfg = params, self.cfg
        K = first_tokens.shape[0]
        L = stop_ids.shape[-1]
        per_row = stop_ids if stop_ids.ndim == 3 else stop_ids[None]

        def stop_hit(tail):  # tail (K, L) → (K,)
            # a row is a real stop sequence only if it has a concrete id —
            # all-(-1) padding rows (ragged per-row stacks) must never match
            concrete = jnp.any(per_row >= 0, axis=-1)
            hit = jnp.all(
                (per_row == tail[:, None, :]) | (per_row < 0), axis=-1
            )
            return jnp.any(jnp.logical_and(hit, concrete), axis=-1)

        def cond(carry):
            i, toks, cache, buf, done, key, tail = carry
            return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(done)))

        def body(carry):
            i, toks, cache, buf, done, key, tail = carry
            logits, cache = lm.text_forward(
                p["text"], cfg.text, input_ids=toks[:, None], cache=cache,
                cache_advance=jnp.where(done, 0, 1).astype(jnp.int32),
                moe_dispatch=self.moe_dispatch,
            )
            key, sub = jax.random.split(key)
            # temperature/top_k/top_p are per-row (K,) vectors here — each
            # batched dialogue keeps its own request's sampling params
            nxt = sample_token(sub, logits[:, -1], temperature, top_k, top_p)
            limit_hit = i + 1 >= limits
            nxt = jnp.where(jnp.logical_or(done, limit_hit), eos_id, nxt)
            tail = jnp.concatenate([tail[:, 1:], nxt[:, None]], axis=1)
            # sampled tokens land in the buffer immediately (col 0 holds the
            # first tokens) so stop-terminating tokens are visible to
            # host-side trimming; eos writes just repeat the fill value
            idx = jnp.minimum(i + 1, max_new - 1)
            col = jnp.where(i + 1 < max_new, nxt, buf[:, idx])
            buf = buf.at[:, idx].set(col)
            done = jnp.logical_or(done, nxt == eos_id)
            done = jnp.logical_or(done, stop_hit(tail))
            done = jnp.logical_or(done, limit_hit)
            return (i + 1, nxt, cache, buf, done, key, tail)

        done0 = jnp.logical_or(jnp.logical_not(active), first_tokens == eos_id)
        done0 = jnp.logical_or(done0, limits <= 0)
        buf = jnp.full((K, max_new), eos_id, jnp.int32).at[:, 0].set(
            jnp.where(done0, eos_id, first_tokens)
        )
        tail0 = jnp.full((K, L), -2, jnp.int32).at[:, L - 1].set(
            jnp.where(done0, -2, first_tokens)
        )
        done0 = jnp.logical_or(done0, stop_hit(tail0))
        steps, _, cache, buf, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), first_tokens, cache, buf, done0, rng_key, tail0),
        )
        return buf, steps, cache

    def generate_from_prefill_batch(
        self,
        last_logits,          # (K, V) from prefill_batch
        cache,                # batch-K KVCache (consumed)
        max_new_tokens,       # int or per-row list of K ints
        active=None,          # (K,) bool — padding-row mask
        temperature=0.0,      # scalar or per-row list of K floats
        top_k=0,              # scalar or per-row list of K ints
        top_p=0.0,            # scalar or per-row list of K floats
        rng_key=None,
        stop_ids=None,        # (S, L) stop-sequence matrix (stop_id_matrix)
    ):
        """Batched continuation after prefill_batch.

        Returns (list of K token lists, device_steps, cache).  device_steps
        counts the lockstep decode iterations actually executed — for K
        concurrent turns it is max(len_k), which is what makes batched
        cognition ≫ sequential when several streams fire together.
        Sampling knobs may be per-row: each batched dialogue keeps its own
        request's temperature/top_k/top_p (reference worker protocol).
        """
        if not hasattr(self, "_decode_batch"):
            self._decode_batch = jax.jit(
                self._decode_batch_impl, static_argnums=(4,), donate_argnums=(2,)
            )
        stop = jnp.asarray(
            _EMPTY_STOP_IDS if stop_ids is None else stop_ids, jnp.int32
        )
        K = last_logits.shape[0]
        if isinstance(max_new_tokens, int):
            limits = [max_new_tokens] * K
        else:
            limits = list(max_new_tokens)
        max_new = max(max(limits), 1)
        if active is None:
            active_arr = jnp.ones((K,), bool)
        else:
            active_arr = jnp.asarray(active, bool)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        temp_arr = _knob_rows(temperature, K, jnp.float32)
        topk_arr = _knob_rows(top_k, K, jnp.int32)
        topp_arr = _knob_rows(top_p, K, jnp.float32)
        rng_key, k0 = jax.random.split(rng_key)
        first = sample_first_token(k0, last_logits, temp_arr, topk_arr, topp_arr)
        buf, steps, cache = self._decode_batch(
            self.params, first, cache, jnp.int32(self.eos_token_id), max_new,
            jnp.asarray(limits, jnp.int32), temp_arr, topk_arr, topp_arr,
            rng_key, active_arr, stop,
        )
        rows = np.asarray(buf)
        out = [tokens_until_eos(rows[r], self.eos_token_id) for r in range(K)]
        return out, int(steps), cache

    def _decode_step_impl(self, params, tok, cache, temperature, top_k, top_p,
                          rng_key):
        """One decode step (for token-streaming callers like the HTTP
        worker): feeds `tok`, returns the next token + updated cache."""
        p, cfg = params, self.cfg
        logits, cache = lm.text_forward(
            p["text"], cfg.text, input_ids=tok[None, None], cache=cache,
            moe_dispatch=self.moe_dispatch,
        )
        nxt = sample_token(rng_key, logits[0, -1], temperature, top_k, top_p)
        return nxt, cache

    def decode_stream(
        self, last_logits, cache, max_new_tokens: int = 256,
        temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0,
        rng_key=None,
    ):
        """Generator yielding token ids one at a time — the streaming-worker
        analogue of TextIteratorStreamer (reference model_worker.py:271-300).

        The cache is CONSUMED (each step donates it), so no cache is yielded
        back; callers that need the post-generation cache use
        generate_from_prefill instead.
        """
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        rng_key, k0 = jax.random.split(rng_key)
        temp = jnp.float32(temperature)
        tk = jnp.int32(top_k)
        tp = jnp.float32(top_p)
        tok = sample_first_token(k0, last_logits[0], temp, tk, tp)
        for _ in range(max_new_tokens):
            if int(tok) == self.eos_token_id:
                return
            yield int(tok)
            rng_key, sub = jax.random.split(rng_key)
            tok, cache = self._decode_step(
                self.params, tok, cache, temp, tk, tp, sub
            )

    def _decode_logits_batch(self, params, toks, cache):
        """(K,) tokens, batch-K cache → ((K, V) logits, cache)."""
        logits, cache = lm.text_forward(
            params["text"], self.cfg.text, input_ids=toks[:, None], cache=cache,
            moe_dispatch=self.moe_dispatch,
        )
        return logits[:, -1, :], cache

    def beam_generate(
        self,
        plan: SplicePlan,
        memory: jax.Array,
        num_beams: int = 5,
        max_new_tokens: int = 128,
        num_return_sequences: Optional[int] = None,
        length_penalty: float = 1.0,
        kv_dtype=None,  # None → follow the decoder weights
    ):
        """Beam-search decoding (HF generate(num_beams=K) parity — the
        reference's Ego4D-LTA eval path, inference_video_ego4d_lta_generate.py
        evaluation_kwargs).  Prefills once, tiles the KV cache across beams,
        steps all beams as one batch; beam bookkeeping is host-side numpy.

        Returns a list of (token_list, score) sorted best-first.
        """
        if not hasattr(self, "_beam_step"):
            self._beam_step = jax.jit(self._decode_logits_batch, donate_argnums=(2,))
        n_ret = num_return_sequences or num_beams

        if kv_dtype is None:
            kv_dtype = _float_dtype(self.params["text"])
        # beams are one-shot: right-size (K tiled rings at the 8192 session
        # default would read K x 1 GB per step; see cache_capacity_for)
        cap = self.cache_capacity_for(len(plan.token_ids), max_new_tokens)
        cache1 = lm.init_kv_cache(self.cfg.text, 1, cap, kv_dtype)
        last, cache1 = self.prefill(plan, memory, cache1)
        logp0 = jax.nn.log_softmax(last[0].astype(jnp.float32))
        logp0 = np.asarray(logp0)

        K = num_beams
        cache = lm.KVCache(
            k=jnp.repeat(cache1.k, K, axis=1),
            v=jnp.repeat(cache1.v, K, axis=1),
            length=jnp.repeat(cache1.length, K),
        )
        top = np.argsort(-logp0)[:K]
        scores = logp0[top]
        seqs = [[int(t)] for t in top]
        done = [int(t) == self.eos_token_id for t in top]
        eos = self.eos_token_id
        finished: list = [
            ([t for t in s if t != eos], sc) for s, sc, d in zip(seqs, scores, done) if d
        ]
        toks = jnp.asarray([s[-1] for s in seqs], jnp.int32)

        for _ in range(max_new_tokens - 1):
            if all(done):
                break
            logits, cache = self._beam_step(self.params, toks, cache)
            logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
            # finished beams only propose repeating eos at frozen score
            cand = scores[:, None] + logp
            for i, d in enumerate(done):
                if d:
                    cand[i, :] = -np.inf
                    cand[i, eos] = scores[i]
            flat = np.argsort(-cand.ravel())[: 2 * K]
            new_seqs, new_scores, new_done, reorder = [], [], [], []
            for f in flat:
                if len(new_seqs) == K:
                    break
                b, t = divmod(int(f), cand.shape[1])
                seq = seqs[b] + ([] if done[b] else [t])
                if t == eos and not done[b]:
                    norm = cand[b, t] / (max(len(seq) - 1, 1) ** length_penalty)
                    finished.append(([x for x in seq if x != eos], norm))
                    continue
                new_seqs.append(seq)
                new_scores.append(cand[b, t])
                new_done.append(done[b])
                reorder.append(b)
            if not new_seqs:
                break
            seqs, scores, done = new_seqs, np.asarray(new_scores), new_done
            idx = jnp.asarray(reorder)
            cache = lm.KVCache(
                k=jnp.take(cache.k, idx, axis=1),
                v=jnp.take(cache.v, idx, axis=1),
                length=jnp.take(cache.length, idx),
            )
            toks = jnp.asarray([s[-1] for s in seqs], jnp.int32)

        for s, sc, d in zip(seqs, scores, done):
            if d:
                continue  # already in `finished` from its eos step
            finished.append((
                [x for x in s if x != eos],
                float(sc) / (max(len(s), 1) ** length_penalty),
            ))
        finished.sort(key=lambda p: -p[1])
        return finished[:n_ret]

    CACHE_CAPACITY_LADDER = (256, 512, 1024, 2048, 4096, 8192)

    def cache_capacity_for(self, n_prompt_padded: int, max_new: int) -> int:
        """Smallest ladder capacity holding a one-shot turn (padded prefill
        bucket + decode budget).  Dense decode attention reads the WHOLE
        ring every step — measured at 7B int8: 12.0 ms/token at capacity
        1024 vs 30.0 at 8192 — so one-shot callers (api.infer, the eval
        CLIs, the worker's generate_stream) should NOT pay for the
        long-session default.  The ladder bounds compile variants."""
        need = n_prompt_padded + max_new
        for c in self.CACHE_CAPACITY_LADDER:
            if c >= need and c <= self.kv_capacity:
                return c
        return self.kv_capacity

    def new_kv_cache(self, dtype=None, capacity: Optional[int] = None):
        """dtype None → follow the decoder weights (a fp32 cache under bf16
        params breaks the decode scan's carry dtype and doubles KV traffic).
        capacity None → the engine's session capacity; one-shot callers
        pass cache_capacity_for(...) to avoid full-ring attention reads."""
        if dtype is None:
            dtype = _float_dtype(self.params["text"])
        cache = lm.init_kv_cache(
            self.cfg.text, batch=1,
            capacity=capacity or self.kv_capacity, dtype=dtype,
        )
        if self.mesh is not None:
            from ..parallel.serving import shard_kv_cache

            cache = shard_kv_cache(cache, self.mesh)
        return cache

    def new_stream_state(self, n_streams: Optional[int] = None):
        """Fresh perception state (single-stream, or batched when
        n_streams is given), placed on the engine's mesh when serving
        tensor-parallel (parallel/serving.py specs)."""
        from .state import init_multistream_state, init_stream_state

        if n_streams is None:
            state = init_stream_state(self.cfg)
        else:
            state = init_multistream_state(self.cfg, n_streams)
        if self.mesh is not None:
            from ..parallel.serving import shard_stream_state

            dp = dict(self.mesh.shape).get("dp", 1)
            axis = "dp" if (n_streams and n_streams % dp == 0 and dp > 1) else None
            state = shard_stream_state(state, self.mesh, stream_axis=axis)
        return state

    def prefill(self, plan: SplicePlan, memory: jax.Array, cache):
        """Host wrapper: run the bucketed prefill program."""
        last, cache = self._prefill(
            self.params,
            jnp.asarray(plan.token_ids)[None],
            jnp.asarray(plan.mem_index)[None],
            jnp.asarray(plan.use_mem)[None],
            memory,
            cache,
            jnp.full((1,), plan.length, jnp.int32),
        )
        return last, cache

    def prefill_batch(self, plans, memory: jax.Array, cache):
        """Batched prefill of K turns padded to ONE shared bucket.

        plans: list of K SplicePlans (all pad_to == shared bucket);
        memory: (K, M, D) per-row memory rings; cache: batch-K KVCache.
        Returns ((K, V) last logits, cache).
        """
        last, cache = self._prefill(
            self.params,
            jnp.asarray(np.stack([p.token_ids for p in plans])),
            jnp.asarray(np.stack([p.mem_index for p in plans])),
            jnp.asarray(np.stack([p.use_mem for p in plans])),
            memory,
            cache,
            jnp.asarray([p.length for p in plans], jnp.int32),
        )
        return last, cache

    def generate_from_prefill(
        self,
        last_logits,
        cache,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        rng_key=None,
        stop_ids=None,
    ):
        """Continuation after a prefill (greedy, or top-k/top-p/temperature
        sampled when temperature > 0).  stop_ids: optional (S, L)
        stop-sequence matrix (stop_id_matrix) — decoding halts inside the
        jitted loop within one step of emitting a stop sequence.  Returns
        (token_list, cache)."""
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        key0, rng_key = jax.random.split(rng_key)
        first = sample_first_token(
            key0, last_logits[0], temperature, top_k, top_p
        )
        if bool(first == self.eos_token_id):
            return [], cache
        stop = jnp.asarray(
            _EMPTY_STOP_IDS if stop_ids is None else stop_ids, jnp.int32
        )
        buf, n, cache = self._decode(
            self.params, first, cache, jnp.int32(self.eos_token_id),
            max_new_tokens, jnp.float32(temperature), jnp.int32(top_k),
            jnp.float32(top_p), rng_key, stop,
        )
        return [int(t) for t in np.asarray(buf[: int(n)])], cache


def _knob_rows(v, K: int, dtype):
    """Scalar-or-list sampling knob → (K,) device vector for the batched
    decode loops (per-row temperature/top_k/top_p)."""
    if isinstance(v, (int, float)):
        return jnp.full((K,), v, dtype)
    vals = list(v)
    if len(vals) != K:
        raise ValueError(f"{len(vals)} sampling-knob rows for K={K}")
    return jnp.asarray(vals, dtype)


def tokens_until_eos(row, eos_id: int) -> list:
    """Decode-buffer row → generated token list (rows are eos-filled past
    the generated prefix)."""
    toks = []
    for t in row:
        if int(t) == eos_id:
            break
        toks.append(int(t))
    return toks


def stack_kv_caches(caches) -> "lm.KVCache":
    """Concatenate per-stream batch-1 KVCaches into one batch-K cache (the
    gather half of continuous-batched cognition)."""
    return lm.KVCache(
        k=jnp.concatenate([c.k for c in caches], axis=1),
        v=jnp.concatenate([c.v for c in caches], axis=1),
        length=jnp.concatenate([c.length for c in caches]),
    )


def split_kv_cache(cache: "lm.KVCache", rows: int):
    """Scatter a batch-K cache back into K batch-1 caches."""
    return [
        lm.KVCache(
            k=cache.k[:, i : i + 1],
            v=cache.v[:, i : i + 1],
            length=cache.length[i : i + 1],
        )
        for i in range(rows)
    ]


_EMPTY_STOP_IDS = np.zeros((0, 1), np.int32)


def stop_id_matrix(tokenizer, stop_strings) -> Optional[np.ndarray]:
    """Encode stop strings into the (S, L) left-padded (-1) matrix the
    jitted decode loops match against — the in-loop analogue of the
    reference's KeywordsStoppingCriteria (mm_utils.py:616), which halted HF
    generate at the conversation separator instead of decoding to EOS/max.

    Each string is encoded both bare and with a leading space (SP
    tokenizers piece text differently after whitespace); host-side text
    trimming (mm_utils.trim_at_stop_strings) stays as the correctness net
    for tokenization-boundary cases the id match can miss."""
    seqs: list = []
    for s in stop_strings or []:
        for variant in (s, " " + s):
            ids = _encode_no_bos(tokenizer, variant)
            if ids and ids not in seqs:
                seqs.append(ids)
    if not seqs:
        return None
    width = max(len(x) for x in seqs)
    mat = np.full((len(seqs), width), -1, np.int32)
    for r, x in enumerate(seqs):
        mat[r, width - len(x):] = x
    return mat


def stack_stop_ids(mats):
    """Per-row stop matrices for the batched decode loop: list of K
    Optional (S_i, L_i) matrices → (K, S, L) stack, ragged slots padded with
    all-(-1) rows (which the matcher ignores).  Unlike merge_stop_ids, a row
    can only halt on its OWN stop sequences — required when batched streams
    use different tokenizers (another stream's ids must not terminate a
    row's decode).  Returns None if every input is None."""
    if all(m is None for m in mats):
        return None
    S = max(m.shape[0] for m in mats if m is not None) or 1
    L = max(m.shape[1] for m in mats if m is not None) or 1
    out = np.full((len(mats), S, L), -1, np.int32)
    for i, m in enumerate(mats):
        if m is not None:
            out[i, : m.shape[0], L - m.shape[1]:] = m
    return out


def merge_stop_ids(mats):
    """Union of per-row stop matrices (batched decode shares ONE matcher);
    pads to a common width, dedupes rows.  Returns None if all inputs are."""
    mats = [m for m in mats if m is not None]
    if not mats:
        return None
    width = max(m.shape[1] for m in mats)
    rows = []
    for m in mats:
        pad = np.full((m.shape[0], width - m.shape[1]), -1, np.int32)
        rows.append(np.concatenate([pad, m], axis=1))
    return np.unique(np.concatenate(rows, axis=0), axis=0)


def _encode_no_bos(tokenizer, text: str) -> list:
    ids = tokenizer(text).input_ids
    bos = getattr(tokenizer, "bos_token_id", None)
    if bos is not None and ids and ids[0] == bos:
        ids = ids[1:]
    return ids


def ensure_turn_capacity(
    engine: "StreamMindEngine",
    tokenizer,
    pending_ids: list,
    turns: list,
    cache,
    span_len: int,
    max_new_tokens: int,
    min_bucket: int = 0,
):
    """KV-capacity guard shared by StreamSession and MultiStreamServer.

    Prefill writes the FULL padded bucket into the cache (the pad rows are
    overwritten later, but dynamic_update_slice clamps its start when the
    block doesn't fit — silently corrupting earlier entries), so the budget
    must count the bucket that build_splice_plan will pick, plus the decode
    tokens.  On overflow: fresh cache, recent turns re-carried as text (the
    reference's past_review_caption mechanism) — pending is REPLACED, since
    the history already re-renders the last turn.

    min_bucket: lower bound on the prefill bucket that will actually be used
    (continuous-batched cognition pads every fired slot's plan to ONE shared
    bucket, so each slot must budget for the shared size, not its own).
    """
    bucket = turn_bucket(engine, len(pending_ids), span_len, min_bucket)
    if int(cache.length[0]) + bucket + max_new_tokens <= engine.kv_capacity:
        return pending_ids, cache
    new_pending = rebuild_history_pending(
        engine, tokenizer, turns, pending_ids, span_len, max_new_tokens,
        min_bucket=min_bucket,
    )
    return new_pending, engine.new_kv_cache()


_TURN_SCAFFOLD = 16  # "[INST] <video>\n [/INST]" worst case


def turn_bucket(engine, n_pending: int, span_len: int, min_bucket: int = 0) -> int:
    """The prefill bucket a turn with this pending/span size will pick."""
    n_spliced = n_pending + _TURN_SCAFFOLD + span_len
    return max(
        bucket_length(min(n_spliced, engine.buckets[-1]), engine.buckets), min_bucket
    )


def rebuild_history_pending(
    engine,
    tokenizer,
    turns: list,
    pending_ids: list,
    span_len: int,
    max_new_tokens: int,
    min_bucket: int = 0,
    capacity: Optional[int] = None,
) -> list:
    """The reset half of the KV-capacity guard: rebuild the pending suffix
    from recent turns re-carried as text (the reference's
    past_review_caption mechanism) for a FRESH cache of `capacity` tokens
    (defaults to engine.kv_capacity; the paged path passes its per-dialogue
    page budget)."""
    if capacity is None:
        capacity = engine.kv_capacity
    keep = min(
        capacity // 2,
        max(engine.buckets) - span_len - _TURN_SCAFFOLD - max_new_tokens,
    )
    history: list = []
    for turn in turns[::-1]:
        ids = _encode_no_bos(tokenizer, f" {turn} </s>")
        if len(history) + len(ids) > keep:
            break
        history = ids + history
    # the rebuilt suffix must ALSO fit the fresh cache: bucket + decode
    # budget vs capacity (a bucket-sized prefill into a too-small cache is
    # the exact clamped-write corruption this guard exists to prevent)
    def fits(hist):
        n = len(hist) + _TURN_SCAFFOLD + span_len
        b = max(bucket_length(min(n, engine.buckets[-1]), engine.buckets), min_bucket)
        return b + max_new_tokens <= capacity and n <= engine.buckets[-1]

    while history and not fits(history):
        # drop the oldest kept turn (history entries are whole turns only
        # when they fit; trimming from the front is safe)
        cut = history[: max(len(history) // 4, 1)]
        history = history[len(cut):]
    if not fits(history):
        history = []
    # history re-renders every kept turn incl. its </s>; the old pending
    # (at most the dangling </s> of the last turn) is superseded by it
    return history if turns else pending_ids


def run_cognition_turn(
    engine: StreamMindEngine,
    tokenizer,
    memory: jax.Array,          # (1, capacity, D) memory ring
    span: list,                 # absolute ring indices for this turn
    pending_ids: list,          # dialogue ids not yet in the KV cache
    cache,
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    rng_key=None,
    stop_ids=None,
):
    """One cognition turn: splice the span into the pending suffix, prefill,
    decode.  Returns (text, tokens, new_pending_ids, cache).

    Shared by StreamSession (single stream) and MultiStreamServer (slot-wise
    cognition after batched perception).
    """
    plan = build_turn_plan(engine, tokenizer, span, pending_ids)
    last, cache = engine.prefill(plan, memory, cache)
    tokens, cache = engine.generate_from_prefill(
        last, cache, max_new_tokens, temperature=temperature, top_k=top_k,
        top_p=top_p, rng_key=rng_key, stop_ids=stop_ids,
    )
    if hasattr(tokenizer, "decode"):
        try:
            text = tokenizer.decode(tokens, skip_special_tokens=True)
        except TypeError:
            text = tokenizer.decode(tokens)
    else:
        text = ""

    return text, tokens, post_turn_pending(tokenizer), cache


def turn_suffix_ids(tokenizer, pending_ids: list) -> list:
    """The token suffix a cognition turn prefills: pending dialogue ids plus
    the "[INST] <video>\\n [/INST]" scaffold if no modal slot is pending."""
    from ..constants import VIDEO_TOKEN_INDEX
    from ..mm_utils import tokenizer_multimodal_token

    if pending_ids and VIDEO_TOKEN_INDEX in pending_ids:
        return pending_ids
    turn_ids = tokenizer_multimodal_token(
        "[INST] <video>\n [/INST]", tokenizer, VIDEO_TOKEN_INDEX
    )
    bos = getattr(tokenizer, "bos_token_id", None)
    if bos is not None and turn_ids and turn_ids[0] == bos:
        turn_ids = turn_ids[1:]
    return pending_ids + turn_ids


def build_turn_plan(
    engine: "StreamMindEngine",
    tokenizer,
    span: list,
    pending_ids: list,
    pad_to: Optional[int] = None,
) -> SplicePlan:
    """Build the splice plan for one cognition turn.  pad_to overrides the
    bucket (continuous batching pads every fired slot to one shared bucket)."""
    from ..constants import VIDEO_TOKEN_INDEX

    suffix_ids = turn_suffix_ids(tokenizer, pending_ids)
    if pad_to is None:
        n_spliced = len(suffix_ids) - 1 + len(span)
        pad_to = bucket_length(n_spliced, engine.buckets)
    plan = build_splice_plan(suffix_ids, [len(span)], VIDEO_TOKEN_INDEX, pad_to)
    mem_index = plan.mem_index.copy()
    mem_index[plan.use_mem] = np.asarray(span, np.int32)
    return SplicePlan(
        token_ids=plan.token_ids, mem_index=mem_index, use_mem=plan.use_mem,
        attn_mask=plan.attn_mask, labels=plan.labels, length=plan.length,
    )


def post_turn_pending(tokenizer) -> list:
    """Ids carried into the next turn after a decode: the generated tokens
    were each fed through the decode loop, so they are ALREADY in the KV
    cache — only the closing </s> (never fed) goes into the next turn's
    pending suffix.  Re-appending the answer would make every later turn see
    it twice."""
    eos = getattr(tokenizer, "eos_token", "</s>")
    eos_ids = tokenizer(eos).input_ids
    bos = getattr(tokenizer, "bos_token_id", None)
    if bos is not None and eos_ids and eos_ids[0] == bos:
        eos_ids = eos_ids[1:]
    return list(eos_ids)


def decode_tokens_to_text(tokenizer, tokens: list) -> str:
    if hasattr(tokenizer, "decode"):
        try:
            return tokenizer.decode(tokens, skip_special_tokens=True)
        except TypeError:
            return tokenizer.decode(tokens)
    return ""


class StreamSession:
    """One live stream: host-side control flow around the two programs.

    Mirrors the demo loop (eval/video_score_stream_demo.py:283-302 +
    stream_generate_demo): per frame → perceive; on gate fire → splice the
    memory span since the previous fire into the rolling dialogue and decode
    a turn.  The KV cache persists across turns — each turn only prefills
    its own suffix.
    """

    def __init__(
        self,
        engine: StreamMindEngine,
        tokenizer,
        prompt_ids: Optional[list] = None,
        max_new_tokens: int = 128,
        gate_threshold: Optional[float] = None,
        stop_strings: Optional[list] = None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        seed: int = 0,
        sample_type: str = "all",
        sample_per: float = 0.5,
    ):
        from ..constants import VIDEO_TOKEN_INDEX

        self.engine = engine
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.gate_threshold = gate_threshold  # None → argmax (reference demo)
        # request sampling params (reference worker forwards temperature +
        # top_p into generate; model_worker.py:250,275)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self._rng = jax.random.PRNGKey(seed)
        # memory-token subsampling before the splice (reference
        # sample_per/sample_type stream kwargs, videollama2_mistral.py:166-167
        # → videollama2_arch.py:676-681): 'all' | 'log' | 'similarity'
        self.sample_type = sample_type
        self.sample_per = float(sample_per)
        self.last_span: list = []  # span actually spliced last turn
        self.stop_strings = list(stop_strings) if stop_strings else []
        self.stop_ids = stop_id_matrix(tokenizer, self.stop_strings)
        self.video_token = VIDEO_TOKEN_INDEX

        self.state = engine.new_stream_state()
        self.cache = engine.new_kv_cache()
        self.turns: list = []
        # ids not yet prefilled into the cache (starts with the system prompt)
        self.pending_ids: list = list(prompt_ids) if prompt_ids else []
        self.interval_ids: list = []

    # -- session checkpoint/restore (serving failover) ----------------------
    # A live session is long-lived state the reference loses on worker
    # restart (its demo holds past_key_values in process memory).  Export
    # captures everything a dialogue carries — Mamba state, memory ring,
    # KV cache, pending ids, turn history — as host arrays; resume()
    # reconstructs an identical session on any worker with the same weights.
    def export_state(self) -> dict:
        return {
            "mamba_conv": np.asarray(self.state.mamba.conv),
            "mamba_ssm": np.asarray(self.state.mamba.ssm),
            "memory": np.asarray(self.state.memory),
            "frame_idx": int(self.state.frame_idx),
            "last_fire": int(self.state.last_fire),
            "kv_k": np.asarray(self.cache.k),
            "kv_v": np.asarray(self.cache.v),
            "kv_length": np.asarray(self.cache.length),
            "pending_ids": list(self.pending_ids),
            "turns": list(self.turns),
            "interval_ids": list(self.interval_ids),
            "max_new_tokens": self.max_new_tokens,
            "gate_threshold": self.gate_threshold,
            "stop_strings": list(self.stop_strings),
            "temperature": self.temperature,
            "top_k": self.top_k,
            "top_p": self.top_p,
            "sample_type": self.sample_type,
            "sample_per": self.sample_per,
        }

    @classmethod
    def resume(cls, engine: "StreamMindEngine", tokenizer, blob: dict) -> "StreamSession":
        from ..models.mamba import MambaState

        s = cls(engine, tokenizer,
                max_new_tokens=int(blob["max_new_tokens"]),
                gate_threshold=blob["gate_threshold"],
                stop_strings=blob.get("stop_strings"),
                temperature=float(blob.get("temperature", 0.0)),
                top_k=int(blob.get("top_k", 0)),
                top_p=float(blob.get("top_p", 0.0)),
                sample_type=str(blob.get("sample_type", "all")),
                sample_per=float(blob.get("sample_per", 0.5)))
        kv_dtype = s.cache.k.dtype
        mem_dtype = s.state.memory.dtype
        s.state = StreamState(
            mamba=MambaState(
                conv=jnp.asarray(blob["mamba_conv"], s.state.mamba.conv.dtype),
                ssm=jnp.asarray(blob["mamba_ssm"], s.state.mamba.ssm.dtype),
            ),
            memory=jnp.asarray(blob["memory"], mem_dtype),
            frame_idx=jnp.int32(blob["frame_idx"]),
            last_fire=jnp.int32(blob["last_fire"]),
        )
        s.cache = lm.KVCache(
            k=jnp.asarray(blob["kv_k"], kv_dtype),
            v=jnp.asarray(blob["kv_v"], kv_dtype),
            length=jnp.asarray(blob["kv_length"], jnp.int32),
        )
        s.pending_ids = list(blob["pending_ids"])
        s.turns = list(blob["turns"])
        s.interval_ids = list(blob["interval_ids"])
        return s

    def process_frame(self, pixels, force_fire: bool = False) -> Optional[str]:
        """One video frame → None (silence) or the generated utterance.

        force_fire=True overrides the gate for this frame (demos / probing a
        specific timestamp); perception state still advances normally."""
        gate_probs, self.state = self.engine.perceive_step(pixels, self.state)
        if force_fire:
            fire = True
        elif self.gate_threshold is None:
            fire = bool(np.asarray(gate_probs)[1] > np.asarray(gate_probs)[0])
        else:
            fire = bool(np.asarray(gate_probs)[1] > self.gate_threshold)
        if not fire:
            return None
        return self._cognify()

    def _cognify(self) -> str:
        eng = self.engine
        cur = int(self.state.frame_idx)
        start = int(self.state.last_fire)
        cur_clamped = min(cur, eng.cfg.max_stream_frames)
        start = min(start, cur_clamped)
        span = list(range(start, cur_clamped))
        if not span:
            span = [max(cur_clamped - 1, 0)]
        if self.sample_type not in (None, "all"):
            from .memory_subsample import subsample_span

            span = subsample_span(
                span, self.state.memory, self.sample_type, self.sample_per
            )
        self.last_span = span
        self.interval_ids.append(cur)

        self.pending_ids, self.cache = ensure_turn_capacity(
            eng, self.tokenizer, self.pending_ids, self.turns, self.cache,
            len(span), self.max_new_tokens,
        )

        self._rng, turn_key = jax.random.split(self._rng)
        text, tokens, self.pending_ids, self.cache = run_cognition_turn(
            eng, self.tokenizer, self.state.memory, span, self.pending_ids,
            self.cache, self.max_new_tokens, stop_ids=self.stop_ids,
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p,
            rng_key=turn_key,
        )
        if self.stop_strings:
            from ..mm_utils import trim_at_stop_strings

            text = trim_at_stop_strings(text, self.stop_strings)
        self.turns.append(text)
        self.state = self.state._replace(
            last_fire=jnp.int32(min(cur, eng.cfg.max_stream_frames))
        )
        return text
