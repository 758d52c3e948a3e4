"""Training runtime tests: freeze masks actually freeze, both stage losses
step and decrease, and the sharded train step runs on the 8-device mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from streammind_tpu.models.meta import build_splice_plan, init_streammind_params
from streammind_tpu.parallel import make_mesh, shard_params
from streammind_tpu.train import (
    count_trainable,
    init_train_state,
    make_optimizer,
    make_train_step,
    stage1_llm_loss,
    stage2_gate_loss,
    trainable_mask,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _stage1_batch(cfg, rng):
    T = 5
    ids = [1, 7, 8, VIDEO_TOKEN_INDEX, 9, 10, 11, 2]
    labels = [IGNORE_INDEX] * 5 + [10, 11, 2]  # answer tokens supervised
    plan = build_splice_plan(ids, [T], VIDEO_TOKEN_INDEX, 32, labels=labels)
    frames = jnp.asarray(rng.standard_normal((1, T, 16, cfg.mm_hidden_size)), jnp.float32)
    return {
        "frames": frames,
        "token_ids": jnp.asarray(plan.token_ids)[None],
        "mem_index": jnp.asarray(plan.mem_index)[None],
        "use_mem": jnp.asarray(plan.use_mem)[None],
        "attn_mask": jnp.asarray(plan.attn_mask)[None],
        "labels": jnp.asarray(plan.labels)[None],
    }


def test_freeze_masks(setup):
    cfg, params = setup
    m_llm = trainable_mask(params, "llm")
    m_cls = trainable_mask(params, "cls")
    m_ad = trainable_mask(params, "adapter")
    # vision frozen everywhere
    assert not any(jax.tree.leaves(m_llm["vision"]))
    # stage2 trains only gate
    assert not any(jax.tree.leaves(m_cls["text"]))
    assert all(jax.tree.leaves(m_cls["projector"]["cls_net"]))
    assert not any(jax.tree.leaves(m_cls["projector"]["mamba"]))
    # stage1 trains text + projector-without-gate
    assert all(jax.tree.leaves(m_llm["text"]))
    assert not any(jax.tree.leaves(m_llm["projector"]["cls_net"]))
    # adapter mode: only projector minus gate
    assert not any(jax.tree.leaves(m_ad["text"]))
    assert all(jax.tree.leaves(m_ad["projector"]["mamba"]))
    assert count_trainable(params, m_cls) < count_trainable(params, m_llm)


def test_stage1_step_trains_and_respects_freeze(setup, rng):
    cfg, params = setup
    batch = _stage1_batch(cfg, rng)

    def loss_fn(p, b):
        return stage1_llm_loss(
            p, cfg, b["frames"], b["token_ids"], b["mem_index"],
            b["use_mem"], b["attn_mask"], b["labels"],
        )

    mask = trainable_mask(params, "llm")
    opt = make_optimizer(1e-3, mask)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(loss_fn, opt))

    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # frozen leaves unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params["vision"]["class_embedding"]),
        np.asarray(params["vision"]["class_embedding"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["projector"]["cls_net"]["embed_tokens"]),
        np.asarray(params["projector"]["cls_net"]["embed_tokens"]),
    )
    # trainable leaves changed
    assert not np.allclose(
        np.asarray(state.params["text"]["embed_tokens"]),
        np.asarray(params["text"]["embed_tokens"]),
    )


def test_stage2_gate_step(setup, rng):
    cfg, params = setup
    T = 6
    frames = jnp.asarray(rng.standard_normal((1, T, 16, cfg.mm_hidden_size)), jnp.float32)
    gate_labels = jnp.asarray([[0, 0, 1, 0, 0, 1]])
    mask_lab = jnp.ones((1, T), bool)

    def loss_fn(p, b):
        return stage2_gate_loss(p, cfg, b["frames"], b["labels"], b["mask"])

    batch = {"frames": frames, "labels": gate_labels, "mask": mask_lab}
    mask = trainable_mask(params, "cls")
    opt = make_optimizer(1e-3, mask)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(loss_fn, opt))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # only gate params moved (embed_tokens gets no grad — label embeds sit at
    # the causally-last position — so check the lm_head instead)
    assert not np.allclose(
        np.asarray(state.params["projector"]["cls_net"]["lm_head"]["weight"]),
        np.asarray(params["projector"]["cls_net"]["lm_head"]["weight"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["text"]["embed_tokens"]),
        np.asarray(params["text"]["embed_tokens"]),
    )


def test_sharded_train_step(setup, rng):
    """Full stage-1 step as one pjit program over dp×fsdp×tp mesh."""
    cfg, params = setup
    batch = _stage1_batch(cfg, rng)

    def loss_fn(p, b):
        return stage1_llm_loss(
            p, cfg, b["frames"], b["token_ids"], b["mem_index"],
            b["use_mem"], b["attn_mask"], b["labels"],
        )

    mask = trainable_mask(params, "llm")
    opt = make_optimizer(1e-3, mask)

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        state = init_train_state(sharded, opt)
        step = jax.jit(make_train_step(loss_fn, opt))
        state, metrics = step(state, batch)
        state, metrics2 = step(state, metrics and batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics2["loss"]) < float(metrics["loss"])


def test_split_step_equals_masked_step(setup, rng):
    """Frozen-subtree split training (adapter stage: grads only over the
    trainable projector leaves — the memory fix that fits single-chip 7B
    adapter training) must produce EXACTLY the params of the legacy
    full-tree masked step."""
    from streammind_tpu.train import (
        init_split_train_state,
        make_split_train_step,
        partition_params,
    )
    from streammind_tpu.train.trainer import combine_params

    cfg, params = setup
    batch = _stage1_batch(cfg, rng)

    def loss_fn(p, b):
        return stage1_llm_loss(
            p, cfg, b["frames"], b["token_ids"], b["mem_index"],
            b["use_mem"], b["attn_mask"], b["labels"],
        )

    mask = trainable_mask(params, "adapter")

    # partition/combine roundtrip
    t, f = partition_params(params, mask)
    rt = combine_params(t, f)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable tree has strictly fewer leaves (decoder dropped)
    assert len(jax.tree.leaves(t)) < len(jax.tree.leaves(params))

    # legacy: full-tree grads + masked optimizer
    opt_full = make_optimizer(1e-3, mask)
    s_full = init_train_state(params, opt_full)
    s_full, m_full = jax.jit(make_train_step(loss_fn, opt_full))(s_full, batch)

    # split: trainable-subtree grads + subtree optimizer
    opt_mask = partition_params(mask, mask)[0]
    opt_split = make_optimizer(1e-3, opt_mask)
    s_split = init_split_train_state(params, opt_split, mask)
    s_split, m_split = jax.jit(make_split_train_step(loss_fn, opt_split, mask))(
        s_split, batch
    )

    np.testing.assert_allclose(float(m_full["loss"]), float(m_split["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_split.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
