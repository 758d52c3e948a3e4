"""Sharding tests on the 8-device virtual CPU mesh: param placement and a
sharded forward that must match the single-device result."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.models import mistral as lm
from streammind_tpu.models.meta import init_streammind_params
from streammind_tpu.parallel import make_mesh, param_specs, shard_params, spec_for


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 2}


def test_spec_rules():
    assert spec_for("text.layers.q.weight", 3) == P(None, "tp", "fsdp")
    assert spec_for("text.layers.o.weight", 3) == P(None, "fsdp", "tp")
    assert spec_for("text.embed_tokens", 2) == P("tp", "fsdp")
    assert spec_for("projector.mamba.blocks.0.in_proj.weight", 2) == P("tp", "fsdp")
    assert spec_for("text.final_norm.weight", 1) == P(None)
    assert spec_for("unknown.thing", 2) == P()


def test_sharded_forward_matches_single_device(rng):
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (2, 8)))

    logits_single, _ = jax.jit(
        lambda p, i: lm.text_forward(p, cfg.text, input_ids=i)
    )(params["text"], ids)

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        data_sharding = NamedSharding(mesh, P("dp"))
        ids_sh = jax.device_put(ids, data_sharding)
        logits_sh, _ = jax.jit(
            lambda p, i: lm.text_forward(p, cfg.text, input_ids=i)
        )(sharded["text"], ids_sh)

    np.testing.assert_allclose(
        np.asarray(logits_sh), np.asarray(logits_single), rtol=2e-4, atol=2e-4
    )


def test_param_placement_is_actually_sharded():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    qw = sharded["text"]["layers"]["q"]["weight"]
    # (L, out, in) sharded on (None, tp, fsdp): each device holds 1/8
    shard_shape = qw.sharding.shard_shape(qw.shape)
    assert shard_shape[1] == qw.shape[1] // 4
    assert shard_shape[2] == qw.shape[2] // 2


def test_sequence_parallel_constraint(rng):
    """sequence_axis shards inter-block activations over the tp axis; the
    numerics must match the unsharded forward exactly."""
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (2, 16)))

    base, _ = jax.jit(lambda p, i: lm.text_forward(p, cfg.text, input_ids=i))(
        params["text"], ids
    )

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        out, _ = jax.jit(
            lambda p, i: lm.text_forward(
                p, cfg.text, input_ids=i, sequence_axis="tp"
            )
        )(sharded["text"], jax.device_put(ids, NamedSharding(mesh, P("dp"))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4)
