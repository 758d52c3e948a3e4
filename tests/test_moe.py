"""MoE/Mixtral as a product configuration (VERDICT r2 item 5).

Covers: gather-vs-dense dispatch equivalence (the decode hot path reads
only the top-k experts' weights), quantized expert loading (int8/int4
banks through utils.params.linear), and an end-to-end tiny-Mixtral
train-and-resume run.  Reference bearing: videollama2_mixtral.py:42 +
bnb quantized loading in model/builder.py:43-52 applying to whatever
backbone is loaded, including Mixtral.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config, tiny_text_config
from streammind_tpu.models import mistral as lm
from streammind_tpu.utils.quantize import quantize_text_params


def _moe_cfg(num_experts=4, top_k=2):
    return dataclasses.replace(
        tiny_text_config(), num_experts=num_experts, num_experts_per_tok=top_k
    )


@pytest.fixture(scope="module")
def moe_setup():
    cfg = _moe_cfg()
    params = lm.init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def test_gather_dispatch_matches_dense(moe_setup):
    """T <= _MOE_GATHER_MAX_TOKENS routes through the per-token expert
    gather; it must agree with the dense one-hot scan token-for-token."""
    cfg, params = moe_setup
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size), jnp.float32)
    dense = lm._mlp(x, lp, cfg)  # T=32: dense path
    for t in (1, 2, 4):
        small = lm._mlp(x[:1, :t], lp, cfg)  # gather path
        np.testing.assert_allclose(
            np.asarray(small), np.asarray(dense[:1, :t]), rtol=2e-5, atol=2e-5
        )


def test_grouped_dispatch_matches_dense(moe_setup):
    """The training-path grouped dispatch (sort-by-expert + ragged_dot,
    VERDICT r3 item 9) must match the dense one-hot scan — forward AND
    gradients (it serves the train step's backward)."""
    cfg, params = moe_setup
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, cfg.hidden_size), jnp.float32)

    xt = x.reshape(-1, cfg.hidden_size)
    logits = xt @ lp["router"]["weight"].T
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    banks = tuple({"weight": lp["experts"][n]} for n in ("gate", "up", "down"))

    dense = lm._moe_apply_dense(xt, banks, cfg, topi, topw)
    grouped = lm._moe_apply_grouped(xt, lp["experts"], cfg, topi, topw)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    # _mlp at T=64 routes through the grouped path (plain banks, no mesh)
    via_mlp = lm._mlp(x, lp, cfg)
    np.testing.assert_allclose(
        np.asarray(via_mlp.reshape(-1, cfg.hidden_size)), np.asarray(dense),
        rtol=2e-5, atol=2e-5,
    )

    # gradients wrt inputs and expert banks agree between dispatches
    def loss_dense(xt, experts):
        b = tuple({"weight": experts[n]} for n in ("gate", "up", "down"))
        return jnp.sum(lm._moe_apply_dense(xt, b, cfg, topi, topw) ** 2)

    def loss_grouped(xt, experts):
        return jnp.sum(lm._moe_apply_grouped(xt, experts, cfg, topi, topw) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1))(xt, lp["experts"])
    gg = jax.grad(loss_grouped, argnums=(0, 1))(xt, lp["experts"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        ),
        gd, gg,
    )


def test_grouped_dispatch_skewed_routing(moe_setup):
    """All tokens routed to ONE expert (the capacity-factor killer): the
    grouped dispatch stays exact — group_sizes [T*k on one expert, 0...]."""
    cfg, params = moe_setup
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    T = 16
    xt = jax.random.normal(jax.random.PRNGKey(3), (T, cfg.hidden_size), jnp.float32)
    topi = jnp.full((T, cfg.num_experts_per_tok), 1, jnp.int32)
    topi = topi.at[:, 1].set(2)  # everyone picks experts {1, 2}
    topw = jnp.full((T, cfg.num_experts_per_tok), 0.5, jnp.float32)
    banks = tuple({"weight": lp["experts"][n]} for n in ("gate", "up", "down"))
    dense = lm._moe_apply_dense(xt, banks, cfg, topi, topw)
    grouped = lm._moe_apply_grouped(xt, lp["experts"], cfg, topi, topw)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_quantized_expert_loading(moe_setup):
    """quantize_text_params covers the expert banks: int8 leaves flow
    through linear() in BOTH dispatches; int4 packs at rest."""
    cfg, params = moe_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size), jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    dense = lm._mlp(x, lp, cfg)

    q8 = quantize_text_params(params, bits=8)
    assert q8["layers"]["experts"]["gate"]["w_int8"].dtype == jnp.int8
    l8 = jax.tree.map(lambda a: a[0], q8["layers"])
    y8 = lm._mlp(x, l8, cfg)
    rel = float(jnp.linalg.norm(y8 - dense) / jnp.linalg.norm(dense))
    assert rel < 0.05, rel
    # gather path consumes the same quantized leaves
    y8_small = lm._mlp(x[:1, :1], l8, cfg)
    np.testing.assert_allclose(
        np.asarray(y8_small), np.asarray(y8[:1, :1]), rtol=2e-5, atol=2e-5
    )

    q4 = quantize_text_params(params, bits=4)
    assert "w_int4" in q4["layers"]["experts"]["down"]
    l4 = jax.tree.map(lambda a: a[0], q4["layers"])
    y4 = lm._mlp(x, l4, cfg)
    rel4 = float(jnp.linalg.norm(y4 - dense) / jnp.linalg.norm(dense))
    assert rel4 < 0.5, rel4  # int4 is a memory-at-rest tier, looser


def test_full_forward_quantized_moe_decode(moe_setup):
    """End-to-end text_forward with a KV cache on an int8 Mixtral:
    single-token decode (gather dispatch) stays close to full precision."""
    cfg, params = moe_setup
    q8 = quantize_text_params(params, bits=8)
    ids = jnp.asarray([[1, 7, 23, 5]], jnp.int32)

    logits, _ = lm.text_forward(params, cfg, input_ids=ids)
    logits8, _ = lm.text_forward(q8, cfg, input_ids=ids)
    # rank agreement on the next-token argmax is what serving needs
    assert int(jnp.argmax(logits[0, -1])) == int(jnp.argmax(logits8[0, -1]))

    cache = lm.init_kv_cache(cfg, 1, 32, jnp.float32)
    _, cache = lm.text_forward(q8, cfg, input_ids=ids, cache=cache)
    step_logits, cache = lm.text_forward(
        q8, cfg, input_ids=ids[:, -1:] * 0 + 9, cache=cache
    )
    assert np.isfinite(np.asarray(step_logits)).all()


def test_train_mixtral_stage1_and_resume(tmp_path):
    """Tiny-Mixtral end-to-end through the REAL train() loop with
    checkpoint + resume (the reference trains Mixtral via
    set_z3_leaf_modules, train_new_stream.py:770-771; here it is just a
    config)."""
    from test_train_run import FakeScoreDataset, _args
    from streammind_tpu.utils.checkpoint import sorted_checkpoints
    from streammind_tpu.train.run import train

    base = tiny_streammind_config()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(
            base.text, num_experts=4, num_experts_per_tok=2
        )
    )
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma, da, ta = _args(tmp_path, "llm")
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    import json as _json

    log = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert losses and all(np.isfinite(losses)), losses
    assert sorted_checkpoints(str(tmp_path)) == [2, 4]

    # resume no-op at max_steps
    state2 = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state2.step) == 4


def test_train_derives_moe_config_from_checkpoint_dir(tmp_path):
    """A model dir with a Mixtral config.json trains as MoE (the
    reference's cfg_pretrained backbone dispatch, builder.py:124-129)."""
    import json

    from streammind_tpu.train.args import ModelArguments
    from streammind_tpu.api import _load_config

    raw = {
        "model_type": "mixtral",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 256,
        "num_local_experts": 4,
        "num_experts_per_tok": 2,
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(raw, f)
    cfg = _load_config(str(tmp_path))
    assert cfg.text.num_experts == 4
    assert cfg.text.num_experts_per_tok == 2
    assert cfg.text.hidden_size == 64


def test_quantize_free_source_frees_expert_banks(moe_setup):
    """free_source must pop the raw (L, E, F, D) expert banks out of the
    INPUT tree as it quantizes — experts are ~90% of a Mixtral's weights,
    so leaving them referenced defeats the peak-HBM contract."""
    cfg, _ = moe_setup
    params = lm.init_text_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    q = quantize_text_params(params, bits=8, free_source=True)
    assert "gate" not in params["layers"]["experts"]
    assert "down" not in params["layers"]["experts"]
    assert "w_int8" in q["layers"]["experts"]["gate"]


def test_streaming_session_with_mixtral_decoder(rng):
    """The full event-gated product on a MoE backbone: perceive → gate →
    Mixtral cognition (decode runs the top-k expert GATHER dispatch), on
    both the dense session and the paged multistream server."""
    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.streaming import StreamMindEngine
    from streammind_tpu.streaming.engine import StreamSession
    from streammind_tpu.streaming.multistream import MultiStreamServer

    base = tiny_streammind_config()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_experts=4,
                                       num_experts_per_tok=2)
    )
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    engine = StreamMindEngine(params, cfg, eos_token_id=2,
                              prefill_buckets=(32, 64))
    tok = SPLikeTokenizer()
    size = cfg.vision.image_size
    frame = lambda: jnp.asarray(
        rng.standard_normal((1, 3, size, size)), jnp.float32)

    s = StreamSession(engine, tok, max_new_tokens=4)
    outs = [s.process_frame(frame(), force_fire=(i == 2)) for i in range(3)]
    assert outs[2], outs  # the forced fire decoded a Mixtral turn

    srv = MultiStreamServer(engine, capacity=2, kv_mode="paged",
                            num_pages=32, page_size=8)
    srv.add_stream("a", tok, gate_threshold=-1.0, max_new_tokens=3)
    srv.add_stream("b", tok, gate_threshold=-1.0, max_new_tokens=3)
    out = srv.step({"a": np.asarray(frame()), "b": np.asarray(frame())})
    assert out["a"] and out["b"], out  # batched paged Mixtral turns


def test_sharded_grouped_dispatch_matches_dense(moe_setup):
    """Expert-parallel sharded grouped dispatch (VERDICT r4 item 4): on the
    8-device mesh, with expert banks SHARDED over tp and rows over dp, the
    shard_mapped ragged_dot form must match the dense one-hot scan —
    forward AND gradients (it serves the train step's backward)."""
    from streammind_tpu.parallel import make_mesh, shard_params

    cfg = _moe_cfg(num_experts=8, top_k=2)  # E/tp=4 > k=2: grouped eligible
    params = lm.init_text_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    T = 32
    xt = jax.random.normal(jax.random.PRNGKey(6), (T, cfg.hidden_size), jnp.float32)
    logits = xt @ lp["router"]["weight"].T
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    banks = tuple({"weight": lp["experts"][n]} for n in ("gate", "up", "down"))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    dense = lm._moe_apply_dense(xt, banks, cfg, topi, topw)
    sharded = lm._moe_apply_grouped_sharded(xt, lp["experts"], cfg, topi, topw, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    # the resolver picks it for a tp>1 mesh with E/tp > k, dense otherwise
    assert lm._resolve_moe_dispatch(mesh, cfg) == ("sharded_grouped", mesh)
    tight = _moe_cfg(num_experts=4, top_k=2)  # E/tp=2 == k: dense wins
    assert lm._resolve_moe_dispatch(mesh, tight) == "dense"
    assert lm._resolve_moe_dispatch(None, cfg) == "grouped"

    # gradients (inputs + expert banks) agree between dispatches
    def loss_dense(xt, experts):
        b = tuple({"weight": experts[n]} for n in ("gate", "up", "down"))
        return jnp.sum(lm._moe_apply_dense(xt, b, cfg, topi, topw) ** 2)

    def loss_sharded(xt, experts):
        return jnp.sum(
            lm._moe_apply_grouped_sharded(xt, experts, cfg, topi, topw, mesh) ** 2
        )

    gd = jax.grad(loss_dense, argnums=(0, 1))(xt, lp["experts"])
    gs = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(xt, lp["experts"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        ),
        gd, gs,
    )

    # skewed routing: every token on ONE device's experts — the roll/mask
    # bookkeeping must stay exact when other shards carry zero rows
    topi_skew = jnp.full((T, 2), 5, jnp.int32).at[:, 1].set(6)  # shard 1 only
    topw_skew = jnp.full((T, 2), 0.5, jnp.float32)
    d2 = lm._moe_apply_dense(xt, banks, cfg, topi_skew, topw_skew)
    s2 = lm._moe_apply_grouped_sharded(xt, lp["experts"], cfg, topi_skew,
                                       topw_skew, mesh)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(d2),
                               rtol=2e-5, atol=2e-5)

    # under jit with tp-SHARDED banks + dp-sharded rows (the train-step
    # placement) the result still matches
    from jax.sharding import NamedSharding, PartitionSpec as P

    tree = {"text": {"layers": {"experts": lp["experts"]}}}
    sharded_tree = shard_params(tree, mesh)
    ex = sharded_tree["text"]["layers"]["experts"]
    xt_s = jax.device_put(xt, NamedSharding(mesh, P("dp", None)))
    out = jax.jit(
        lambda xt, e: lm._moe_apply_grouped_sharded(xt, e, cfg, topi, topw, mesh)
    )(xt_s, ex)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_sharded_grouped_under_remat_trains(moe_setup):
    """The train step's exact composition around the sharded grouped
    dispatch: text_forward (layer scan + remat) under jax.set_mesh with
    tp-sharded expert banks — value_and_grad must compile, run, and stay
    finite with the sharded_grouped form selected."""
    from streammind_tpu.parallel import make_mesh, shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _moe_cfg(num_experts=8, top_k=2)
    params = lm.init_text_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with jax.set_mesh(mesh):
        assert lm._resolve_moe_dispatch(None, cfg)[0] == "sharded_grouped"
        sharded = shard_params({"text": params}, mesh)["text"]
        ids = jax.device_put(
            jnp.tile(jnp.arange(16)[None], (2, 1)) % cfg.vocab_size,
            NamedSharding(mesh, P("dp")),
        )

        def loss(p, ids):
            logits, _ = lm.text_forward(p, cfg, input_ids=ids, remat=True)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(sharded, ids)
        assert np.isfinite(float(val))
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree.leaves(grads)))
        )
        assert np.isfinite(gnorm) and gnorm > 0


def test_sharded_grouped_tp_only_mesh(moe_setup):
    """A mesh with ONLY a tp axis (no dp): rows must stay replicated in the
    shard_map specs instead of referencing a nonexistent dp axis."""
    from jax.sharding import Mesh

    cfg = _moe_cfg(num_experts=8, top_k=1)  # E/tp=2 > k=1: eligible
    params = lm.init_text_params(jax.random.PRNGKey(8), cfg, jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    T = 10  # deliberately not divisible by anything interesting
    xt = jax.random.normal(jax.random.PRNGKey(9), (T, cfg.hidden_size), jnp.float32)
    logits = xt @ lp["router"]["weight"].T
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    banks = tuple({"weight": lp["experts"][n]} for n in ("gate", "up", "down"))

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    dense = lm._moe_apply_dense(xt, banks, cfg, topi, topw)
    out = lm._moe_apply_grouped_sharded(xt, lp["experts"], cfg, topi, topw, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
