"""Decoder-only transformer family: Mistral / Llama / Mixtral (MoE).

Replaces the reference's HF backbones
(/root/reference/streammind/model/language_model/videollama2_mistral.py:146,
 videollama2_llama.py:41, videollama2_mixtral.py:42) and the gate LM
(4-layer Mistral with vocab_size=2, builder.py:376-378).

TPU-native design: one stacked-parameter lax.scan over layers (compiles one
layer body regardless of depth), static-capacity KV cache with length
masking (the XLA analogue of CUDA-graph decode capture, reference
mamba_ssm/utils/generation.py:340), GQA flash attention for prefill.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..ops.attention import attention, decode_attention
from ..ops.norms import rms_norm
from ..ops.rotary import apply_rope, rope_cos_sin
from ..utils.params import linear, normal_init, ones, stack_layers, zeros


class KVCache(NamedTuple):
    """Static-capacity per-layer KV cache.

    k, v: (n_layers, B, capacity, n_kv_heads, head_dim)
    length: (B,) int32 — valid prefix length (shared across layers).
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: TextConfig, batch: int, capacity: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def init_text_params(key, cfg: TextConfig, dtype=jnp.float32):
    """Stacked-layer leaves are generated directly at (L, ...) shape — a
    per-layer init + stack would transiently double the 7B footprint and
    OOM a single chip."""
    d = cfg.hidden_size
    L = cfg.num_layers
    keys = jax.random.split(key, 10)

    layers = {
        "input_norm": {"weight": ones((L, d), dtype)},
        "q": {"weight": normal_init(keys[2], (L, cfg.q_dim, d), dtype=dtype)},
        "k": {"weight": normal_init(keys[3], (L, cfg.kv_dim, d), dtype=dtype)},
        "v": {"weight": normal_init(keys[4], (L, cfg.kv_dim, d), dtype=dtype)},
        "o": {"weight": normal_init(keys[5], (L, d, cfg.q_dim), dtype=dtype)},
        "post_norm": {"weight": ones((L, d), dtype)},
    }
    if cfg.qkv_bias:  # Qwen2 puts biases on q/k/v only (not o)
        layers["q"]["bias"] = zeros((L, cfg.q_dim), dtype)
        layers["k"]["bias"] = zeros((L, cfg.kv_dim), dtype)
        layers["v"]["bias"] = zeros((L, cfg.kv_dim), dtype)
    if cfg.num_experts > 1:
        layers["router"] = {
            "weight": normal_init(keys[6], (L, cfg.num_experts, d), dtype=dtype)
        }
        layers["experts"] = {
            "gate": normal_init(keys[7], (L, cfg.num_experts, cfg.intermediate_size, d), dtype=dtype),
            "up": normal_init(keys[8], (L, cfg.num_experts, cfg.intermediate_size, d), dtype=dtype),
            "down": normal_init(keys[9], (L, cfg.num_experts, d, cfg.intermediate_size), dtype=dtype),
        }
    else:
        layers["mlp"] = {
            "gate": {"weight": normal_init(keys[7], (L, cfg.intermediate_size, d), dtype=dtype)},
            "up": {"weight": normal_init(keys[8], (L, cfg.intermediate_size, d), dtype=dtype)},
            "down": {"weight": normal_init(keys[9], (L, d, cfg.intermediate_size), dtype=dtype)},
        }

    params = {
        "embed_tokens": normal_init(keys[0], (cfg.vocab_size, d), dtype=dtype),
        "layers": layers,
        "final_norm": {"weight": ones((d,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": normal_init(keys[1], (cfg.vocab_size, d), dtype=dtype)}
    return params


def embed_tokens(params, input_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][input_ids]


# Concat axes for fusing linear leaves along the OUTPUT dim on stacked
# (L, out, in) trees.  Packed int4 leaves pack along the INPUT dim, so the
# out axis is still -2; per-channel scales and biases are (L, out).
_FUSE_AXES = {"weight": -2, "w_int8": -2, "w_int4": -2, "w_int4pc": -2,
              "scale": -1, "scale4": -2, "bias": -1}


def _fuse_leaves(leaves):
    """Row-concat same-scheme linear leaves, or None if not fusable."""
    keys = set(leaves[0])
    if any(set(l) != keys for l in leaves[1:]):
        return None  # mixed quant schemes
    if not keys <= set(_FUSE_AXES):
        return None  # LoRA deltas or unknown extras — keep separate
    cat = jax.jit(
        lambda *xs, axis: jnp.concatenate(xs, axis=axis),
        static_argnames=("axis",),
    )
    return {k: cat(*(l[k] for l in leaves), axis=_FUSE_AXES[k]) for k in keys}


def fuse_text_linears(text_params: dict) -> dict:
    """Serving-path decode fusion: q/k/v → one "qkv" leaf and mlp gate/up →
    one "gateup" leaf, rows concatenated along the output dim.

    1-token decode is pure weight bandwidth, and the v5e streams one fat
    GEMM's operands faster than three thin ones — measured on-chip
    (tools/_probe_decode_fusion.py): the scanned int8 decode-layer weight
    stream runs 680 GB/s separate vs 732 fused, ~0.7 ms/token at 7B.
    Row-concatenation changes no per-output-row dot (each output element
    sums the same products in the same reduction order), so the fused
    forward is BIT-IDENTICAL to the separate one — same contract as the
    ViT serving fusion (models/vit.py fuse_vit_qkv).

    Returns a new tree sharing every non-fused leaf; sources of fused
    leaves are dropped from it (no duplicate residency, ADVICE r4).
    Leaves with LoRA deltas or mixed quant schemes stay separate.  The
    gate LM's tree must NOT be fused: its single-token shortcut
    (_attn_block) reads only v, and a fused qkv would drag the dead q/k
    bytes back into that stream.
    """
    out = dict(text_params)
    layers = dict(out["layers"])
    if all(k in layers for k in ("q", "k", "v")):
        fused = _fuse_leaves([layers["q"], layers["k"], layers["v"]])
        if fused is not None:
            layers["qkv"] = fused
            del layers["q"], layers["k"], layers["v"]
    if "mlp" in layers and "gate" in layers["mlp"]:
        mlp = dict(layers["mlp"])
        fused = _fuse_leaves([mlp["gate"], mlp["up"]])
        if fused is not None:
            mlp["gateup"] = fused
            del mlp["gate"], mlp["up"]
            layers["mlp"] = mlp
    out["layers"] = layers
    return out


def qkv_proj(x, lp, cfg: TextConfig):
    """Project to (q, k, v) heads, on either the separate or the fused
    (fuse_text_linears) layout.  Output-dim slicing of the fused product
    reproduces the separate results bit-for-bit."""
    b, s, _ = x.shape
    if "qkv" in lp:
        qkv = linear(x, lp["qkv"])
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim]
        v = qkv[..., cfg.q_dim + cfg.kv_dim :]
    else:
        q = linear(x, lp["q"])
        k = linear(x, lp["k"])
        v = linear(x, lp["v"])
    return (
        q.reshape(b, s, cfg.num_heads, cfg.head_dim),
        k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
        v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
    )


def _mlp(x, p, cfg: TextConfig, moe_dispatch=None):
    if cfg.num_experts > 1:
        return _moe_mlp(x, p, cfg, moe_dispatch)
    if "gateup" in p["mlp"]:
        gu = linear(x, p["mlp"]["gateup"])
        g, u = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size :]
        return linear(jax.nn.silu(g) * u, p["mlp"]["down"])
    g = jax.nn.silu(linear(x, p["mlp"]["gate"]))
    u = linear(x, p["mlp"]["up"])
    return linear(g * u, p["mlp"]["down"])


_MOE_GATHER_MAX_TOKENS = 4


def _wrap_expert_leaf(leaf):
    """Expert banks are raw (E, F, D) arrays at init and {"w_int8"/"w_int4",
    scale} dicts after quantized loading — normalize to linear() leaves."""
    return leaf if isinstance(leaf, dict) else {"weight": leaf}


def _moe_mlp(x, p, cfg: TextConfig, dispatch=None):
    """Mixtral sparse MoE.  Router softmax over top-k experts, renormalized
    (HF MixtralSparseMoeBlock semantics).

    Dispatch by static token count T = B*S, bank kind, and sharding:
      - T <= _MOE_GATHER_MAX_TOKENS (the decode hot path): per-token GATHER
        of the top-k experts' weights — reads k/E of the expert bytes per
        token instead of all E banks (decode is weight-bandwidth bound; at
        Mixtral 8x7B top-2 this is 4x less expert traffic per step).
      - quantized/LoRA-wrapped banks: dense one-hot scan over all experts —
        correct everywhere, GSPMD-shardable over the expert axis, composes
        with int8/int4 and matmul-time LoRA through linear() (the grouped
        forms below cannot express per-leaf linear() composition inside
        ragged_dot — kept dense deliberately).
      - plain-float banks, expert axis SHARDED over the mesh's tp axis
        (E % tp == 0 and E/tp > k): shard_mapped grouped dispatch —
        each device ragged_dots its LOCAL experts against its rows and a
        psum over tp combines (_moe_apply_grouped_sharded).  When
        E/tp <= k the grouped form does more FLOPs than dense per device
        (each device pushes all T*k rows through one matrix vs T*E/tp
        dense) — dense wins, used instead.
      - plain-float banks on ONE device: sort-by-expert grouped dispatch
        via lax.ragged_dot — exact (no capacity-factor token dropping)
        while doing k/E of the dense FLOPs/weight reads
        (_moe_apply_grouped).

    `dispatch` selects explicitly (None = auto via the jax.set_mesh ambient
    mesh): "dense" | "grouped" | a jax.sharding.Mesh (sharded grouped over
    that mesh).  The serving engine passes this — its tensor-parallel path
    shards params via NamedSharding with NO ambient mesh, so auto-detection
    cannot see the sharding at trace time (ADVICE r4).
    """
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    router_logits = xt @ p["router"]["weight"].T.astype(xt.dtype)  # (T, E)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)

    banks = tuple(_wrap_expert_leaf(p["experts"][n]) for n in ("gate", "up", "down"))

    if b * s <= _MOE_GATHER_MAX_TOKENS:
        out = _moe_apply_gathered(xt, banks, cfg, topi, topw)
        return out.reshape(b, s, d)

    plain = all(not isinstance(p["experts"][n], dict)
                for n in ("gate", "up", "down"))
    mode = _resolve_moe_dispatch(dispatch, cfg) if plain else "dense"
    if mode == "grouped":
        out = _moe_apply_grouped(xt, p["experts"], cfg, topi, topw)
    elif isinstance(mode, tuple):  # ("sharded_grouped", mesh)
        out = _moe_apply_grouped_sharded(xt, p["experts"], cfg, topi, topw,
                                         mode[1])
    else:
        out = _moe_apply_dense(xt, banks, cfg, topi, topw)
    return out.reshape(b, s, d)


def _resolve_moe_dispatch(dispatch, cfg: TextConfig):
    """Normalize a requested/auto MoE dispatch to "dense" | "grouped" |
    ("sharded_grouped", mesh), applying the divisibility/FLOPs guards."""
    mesh = None
    if dispatch == "dense" or dispatch == "grouped":
        return dispatch
    if dispatch is not None:  # an explicit Mesh from the serving engine
        mesh = dispatch
    else:
        from ..ops.attention import _ambient_mesh

        mesh = _ambient_mesh()
    tp = 1 if mesh is None else dict(mesh.shape).get("tp", 1)
    if tp == 1:
        return "grouped"
    e_loc, rem = divmod(cfg.num_experts, tp)
    if rem == 0 and e_loc > cfg.num_experts_per_tok:
        return ("sharded_grouped", mesh)
    return "dense"


def _moe_apply_dense(xt, banks, cfg: TextConfig, topi, topw):
    """Dense one-hot scan: every expert processes every token, zero-weighted
    where unrouted.  E/k more FLOPs than needed, but static-shaped with no
    data movement, GSPMD-shardable over the expert axis, and composes with
    quantized/LoRA leaves through linear()."""
    combine = jnp.sum(
        jax.nn.one_hot(topi, cfg.num_experts, dtype=topw.dtype)
        * topw[..., None],
        axis=1,
    )  # (T, E)

    def expert_apply(carry, ep):
        gate_w, up_w, down_w, weight_col = ep
        g = jax.nn.silu(linear(xt, gate_w))
        u = linear(xt, up_w)
        y = linear(g * u, down_w)
        return carry + y * weight_col[:, None].astype(xt.dtype), None

    init = jnp.zeros_like(xt)
    out, _ = jax.lax.scan(
        expert_apply, init, (*banks, combine.T)  # leaves sliced on E per step
    )
    return out


def _moe_apply_grouped_sharded(xt, experts, cfg: TextConfig, topi, topw,
                               mesh, dp_axis: str = "dp", tp_axis: str = "tp"):
    """Expert-parallel grouped dispatch over a sharded expert bank
    (SURVEY §2.3 EP; reference bar is dense DeepSpeed MoE,
    train_new_stream.py:770-771 — this does k/E_local of its FLOPs).

    Expert banks live sharded (E on tp, in-dim on fsdp —
    parallel/partitioning.py RULES).  shard_map splits the expert axis over
    tp and gathers the fsdp in-dim shards at entry (ZeRO-3 gather-at-use);
    rows ride the dp axis.  Each device then runs the SAME sort-by-expert
    ragged_dot as the single-device grouped path, but only over its local
    E/tp experts: rows are sorted by global expert id, rolled so the local
    experts' contiguous block leads, and every non-local row is zeroed —
    zero rows contribute zero through the matmuls, and the concluding
    psum over tp sums each row's k expert outputs from their owner shards.
    No token all-to-all is needed because rows enter replicated over tp
    (batch shards on dp only, train/run.py); the tp communication is ONE
    psum of the (T_local, D) output — the same collective the dense scan
    pays, at k/E_local of its per-device FLOPs.

    Every op here is differentiable (ragged_dot, roll-by-traced-shift,
    scatter-add, psum), so the train step's backward flows through the
    same form; grad parity vs the dense scan is tested on the 8-device
    mesh (tests/test_moe.py).
    """
    from jax.sharding import PartitionSpec as P

    T, d = xt.shape
    k = cfg.num_experts_per_tok
    E = cfg.num_experts
    shape = dict(mesh.shape)
    tp = shape.get(tp_axis, 1)
    e_loc = E // tp
    # rows ride dp when the mesh has it and it divides them; else they stay
    # replicated (each dp shard repeats the row work, like the dense scan)
    dp = shape.get(dp_axis, 1)
    rows = P(dp_axis) if (dp > 1 and T % dp == 0) else P(None)
    row_spec = P(*rows, None)

    def local(xt, topi, topw, gate_e, up_e, down_e):
        m = xt.shape[0] * k
        flat_e = topi.reshape(-1)                    # (m,) global expert ids
        order = jnp.argsort(flat_e)                  # stable
        tok = order // k
        xs = jnp.take(xt, tok, axis=0)               # (m, D) expert-sorted
        sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
        start_e = jax.lax.axis_index(tp_axis) * e_loc
        csum = jnp.cumsum(sizes)
        offset = jnp.where(start_e == 0, 0, csum[jnp.maximum(start_e - 1, 0)])
        local_sizes = jax.lax.dynamic_slice(sizes, (start_e,), (e_loc,))
        n_local = jnp.sum(local_sizes)
        # local experts' rows lead; everything after them is another
        # shard's row — zero it so it rides the last local group as a no-op
        xs = jnp.roll(xs, -offset, axis=0)
        keep = (jnp.arange(m) < n_local)[:, None]
        xs = jnp.where(keep, xs, 0)
        sizes_p = local_sizes.at[e_loc - 1].add(m - n_local)
        gate_w = jnp.swapaxes(gate_e, 1, 2).astype(xt.dtype)   # (E_loc, D, F)
        up_w = jnp.swapaxes(up_e, 1, 2).astype(xt.dtype)
        down_w = jnp.swapaxes(down_e, 1, 2).astype(xt.dtype)   # (E_loc, F, D)
        g = jax.lax.ragged_dot(xs, gate_w, sizes_p)
        u = jax.lax.ragged_dot(xs, up_w, sizes_p)
        y = jax.lax.ragged_dot(jax.nn.silu(g) * u, down_w, sizes_p)
        y = jnp.roll(y, offset, axis=0)              # back to sorted order
        w = jnp.take(topw.reshape(-1), order).astype(xt.dtype)
        out = jnp.zeros_like(xt).at[tok].add(y * w[:, None])
        return jax.lax.psum(out, tp_axis)

    sm = jax.shard_map(
        local, mesh=mesh,
        in_specs=(row_spec, row_spec, row_spec,
                  P(tp_axis, None, None), P(tp_axis, None, None),
                  P(tp_axis, None, None)),
        out_specs=row_spec, check_vma=False,
    )
    return sm(xt, topi, topw, experts["gate"], experts["up"], experts["down"])


def _moe_apply_grouped(xt, experts, cfg: TextConfig, topi, topw):
    """Sort-by-expert grouped dispatch (the training-path hot form).

    Exact — no capacity-factor token dropping: every (token, expert)
    assignment becomes one row of a (T*k, D) matrix sorted by expert id
    (stable argsort keeps token order inside a group), and
    lax.ragged_dot runs each expert's contiguous row block through that
    expert's weights.  FLOPs and expert-weight reads are k/E of the dense
    one-hot scan (at Mixtral top-2-of-8: 4x less), and ragged_dot is
    differentiable, so the same form serves the train step's backward.
    Reference parity bar is DeepSpeed dense MoE (SURVEY §2.3) — this beats
    it on the unsharded path.
    """
    T, d = xt.shape
    k = cfg.num_experts_per_tok
    flat_e = topi.reshape(-1)                      # (T*k,)
    order = jnp.argsort(flat_e)                    # stable
    tok = order // k                               # source token per row
    xs = jnp.take(xt, tok, axis=0)                 # (T*k, D) expert-grouped
    group_sizes = jnp.bincount(
        flat_e, length=cfg.num_experts
    ).astype(jnp.int32)
    gate_w = jnp.swapaxes(experts["gate"], 1, 2).astype(xt.dtype)  # (E, D, F)
    up_w = jnp.swapaxes(experts["up"], 1, 2).astype(xt.dtype)
    down_w = jnp.swapaxes(experts["down"], 1, 2).astype(xt.dtype)  # (E, F, D)
    g = jax.lax.ragged_dot(xs, gate_w, group_sizes)
    u = jax.lax.ragged_dot(xs, up_w, group_sizes)
    y = jax.lax.ragged_dot(jax.nn.silu(g) * u, down_w, group_sizes)
    w = jnp.take(topw.reshape(-1), order).astype(xt.dtype)
    return jnp.zeros_like(xt).at[tok].add(y * w[:, None])


def _moe_apply_gathered(xt, banks, cfg: TextConfig, topi, topw):
    """Top-k gather dispatch for tiny T: each token dynamically indexes its
    k experts' weight banks (an (F, D)-sized gather each — XLA reads only
    those experts from HBM) and runs k small matmuls."""

    def per_token(x_row, idx, wts):
        y = jnp.zeros_like(x_row)
        for k in range(cfg.num_experts_per_tok):
            gw, uw, dw = (
                jax.tree.map(lambda a: a[idx[k]], bank) for bank in banks
            )
            g = jax.nn.silu(linear(x_row[None], gw))[0]
            u = linear(x_row[None], uw)[0]
            y = y + linear((g * u)[None], dw)[0] * wts[k].astype(x_row.dtype)
        return y

    return jax.vmap(per_token)(xt, topi, topw)


def _attn_block(
    x, lp, cfg: TextConfig, positions, kv_mask, cache_k, cache_v, cache_len, attn_impl
):
    """One attention sub-block.  If cache_k/v given (capacity C), new K/V are
    written at cache_len and attention runs over the cache; else pure
    self-attention over the current block."""
    b, s, d = x.shape
    if cache_k is None and s == 1 and kv_mask is None and "v" in lp:
        # Single-token self-attention — the streaming gate LM's exact shape
        # (projector.gate_decision_step feeds ONE memory token, no cache;
        # reference builder.py:547-562 feeds x[0][-1] alone through
        # cls_net).  The token's only causally-visible key is itself, and
        # softmax over one logit is exactly 1.0 in every dtype
        # (exp(x-x)/sum == 1), so the attention output is exactly v (each
        # q-head reading its GQA group's v) — the q/k projections and
        # rope cancel out of the math entirely.  Skipping them drops
        # ~168 MB of dead weight reads per gate call at 7B-gate dims
        # (q_dim^2 + q_dim*kv_dim per layer), and XLA DCEs the unused
        # q/k leaves out of the compiled program.  Bit-identical by
        # construction to the full path (single-term einsum: 1.0*v == v).
        from ..ops.attention import _repeat_kv

        v = linear(x, lp["v"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        o = _repeat_kv(v, cfg.num_heads // cfg.num_kv_heads)
        return linear(o.reshape(b, s, cfg.q_dim), lp["o"]), None, None
    q, k, v = qkv_proj(x, lp, cfg)

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None:
        # Scatter the new block into the cache at cache_len (per batch row).
        def put(cache, new):
            def one(row_cache, row_new, start):
                return jax.lax.dynamic_update_slice(
                    row_cache, row_new.astype(row_cache.dtype), (start, 0, 0)
                )
            return jax.vmap(one)(cache, new, cache_len)

        cache_k = put(cache_k, k)
        cache_v = put(cache_v, v)
        total_len = cache_len + s
        if s == 1:
            o = decode_attention(q, cache_k, cache_v, total_len)
        else:
            # Prefill: causal within the new block, full visibility of the
            # prefix, nothing beyond total_len.  The flash kernel's dynamic
            # q_offset + kv_len masking bounds the work to the valid prefix
            # instead of materializing (B, H, S, capacity) fp32 logits.
            from ..ops.attention import flash_attention

            o = flash_attention(
                q, cache_k.astype(q.dtype), cache_v.astype(q.dtype),
                causal=True, kv_len=total_len, q_offset=cache_len,
            )
        o = o.reshape(b, s, cfg.q_dim)
        return linear(o, lp["o"]), cache_k, cache_v
    else:
        o = attention(q, k, v, causal=True, kv_mask=kv_mask, impl=attn_impl)
        o = o.reshape(b, s, cfg.q_dim)
        return linear(o, lp["o"]), None, None


def text_forward(
    params,
    cfg: TextConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,  # (B, S) bool — padding mask
    positions: Optional[jax.Array] = None,  # (B, S) int32
    cache: Optional[KVCache] = None,
    cache_advance: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    return_hidden: bool = False,
    remat: bool = False,
    sequence_axis: Optional[str] = None,
    unroll=1,
    moe_dispatch=None,
):
    """Full forward over a token block.

    moe_dispatch: MoE dispatch override — "dense" | "grouped" | a
    jax.sharding.Mesh (expert-parallel sharded grouped over that mesh).
    None = auto from the jax.set_mesh ambient mesh (see _moe_mlp).  The
    serving engine passes this explicitly because its tensor-parallel path
    has no ambient mesh at trace time.

    unroll: layer-scan unroll factor ("full" = every layer).  Single-token
    forwards (decode, the gate LM) are pure weight bandwidth; the rolled
    scan serializes each layer's HBM weight fetch behind the previous
    layer's compute, and unrolling lets XLA software-pipeline the
    fetches (same measured effect as the ViT tower's unroll).  Keep the
    default for training — unrolling multiplies compile time and remat
    granularity.

    Without cache: causal self-attention over the block (training).
    With cache: block is appended at cache.length (prefill or 1-token decode)
    and attends to the whole valid prefix; returns the updated cache.

    cache_advance: optional (B,) — how far to advance cache.length (defaults
    to the block size).  Right-padded prefill blocks pass their *real* length
    so the pad K/V (causally invisible, trailing) are overwritten by the next
    block.  This keeps every turn shape-stable: one compiled prefill program
    per bucket size, the XLA analogue of CUDA-graph capture.
    """
    x = inputs_embeds if inputs_embeds is not None else embed_tokens(params, input_ids)
    b, s, d = x.shape

    if positions is None:
        if cache is not None:
            positions = cache.length[:, None] + jnp.arange(s)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))

    if cache is not None:
        def body(h, layer):
            lp, ck, cv = layer
            y = rms_norm(h, lp["input_norm"]["weight"], cfg.rms_norm_eps)
            a, ck, cv = _attn_block(
                y, lp, cfg, positions, attn_mask, ck, cv, cache.length, attn_impl
            )
            h = h + a
            y = rms_norm(h, lp["post_norm"]["weight"], cfg.rms_norm_eps)
            h = h + _mlp(y, lp, cfg, moe_dispatch)
            return h, (ck, cv)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v),
            unroll=cfg.num_layers if unroll == "full" else unroll,
        )
        advance = cache_advance if cache_advance is not None else s
        new_cache = KVCache(k=new_k, v=new_v, length=cache.length + advance)
    else:
        def body(h, lp):
            y = rms_norm(h, lp["input_norm"]["weight"], cfg.rms_norm_eps)
            a, _, _ = _attn_block(
                y, lp, cfg, positions, attn_mask, None, None, None, attn_impl
            )
            h = h + a
            y = rms_norm(h, lp["post_norm"]["weight"], cfg.rms_norm_eps)
            h = h + _mlp(y, lp, cfg, moe_dispatch)
            return h, None

        if sequence_axis is not None:
            # Megatron-style sequence parallelism as a sharding annotation:
            # activations between blocks live sequence-sharded on the given
            # mesh axis (the reference's ParallelLinearFunc all-gather /
            # reduce-scatter pair, tensor_parallel.py:38-41, becomes GSPMD
            # collectives inserted around these constraints).
            from jax.sharding import PartitionSpec as P

            inner_body = body

            def body(h, lp):  # noqa: F811
                h = jax.lax.with_sharding_constraint(
                    h, P(None, sequence_axis, None)
                )
                return inner_body(h, lp)

        if remat:
            # per-layer rematerialization: activations of each block are
            # recomputed in backward (the reference's gradient_checkpointing
            # flag, finetune_stage1.sh) — O(1) layer activations live at once
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(
            body, x, params["layers"],
            unroll=cfg.num_layers if unroll == "full" else unroll,
        )
        new_cache = None

    x = rms_norm(x, params["final_norm"]["weight"], cfg.rms_norm_eps)
    if return_hidden:
        return x, new_cache
    logits = lm_head(params, cfg, x)
    return logits, new_cache


def lm_head(params, cfg: TextConfig, hidden: jax.Array) -> jax.Array:
    w = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]["weight"]
    return (hidden @ w.T.astype(hidden.dtype)).astype(jnp.float32)
