"""Checkpoint round-trips: tree save/load, rotation/resume, and the
mm_projector.bin torch-interop loop (export → convert back → identical)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.models.meta import init_streammind_params
from streammind_tpu.utils.checkpoint import (
    export_projector_torch_sd,
    latest_checkpoint,
    load_checkpoint,
    load_tree,
    save_checkpoint,
    save_tree,
    sorted_checkpoints,
)
from streammind_tpu.utils.convert import convert_projector


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "blocks": [{"w": jnp.ones((2,))}, {"w": jnp.zeros((2,))}],
        "n": {"scale": jnp.asarray(2.5)},
    }
    save_tree(str(tmp_path), tree)
    loaded = load_tree(str(tmp_path))
    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == 2
    _tree_equal(tree, loaded)


def test_checkpoint_rotation_and_resume(tmp_path):
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    root = str(tmp_path / "ckpts")
    for step in (10, 20, 30, 40):
        save_checkpoint(root, step, params, keep=2)
    assert sorted_checkpoints(root) == [30, 40]
    latest = latest_checkpoint(root)
    assert latest.endswith("checkpoint-40")
    loaded, opt, meta = load_checkpoint(latest)
    assert meta["step"] == 40
    _tree_equal(params["projector"]["pre_net"], loaded["projector"]["pre_net"])


def test_adapter_only_checkpoint(tmp_path):
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(1), cfg)
    path = save_checkpoint(str(tmp_path), 5, params, adapter_only=True)
    loaded, _, meta = load_checkpoint(path)
    assert meta["adapter_only"]
    assert set(loaded) == {"projector"}


def test_mm_projector_torch_interop(tmp_path):
    """export → reference key naming → convert back → byte-identical."""
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(2), cfg)
    sd = export_projector_torch_sd(params["projector"])
    assert "pre_net.fc3.weight" in sd
    assert "mamba_model.ssms.0.mixer.A_log" in sd
    assert "cls_net.cls_model.model.layers.0.self_attn.q_proj.weight" in sd
    back = convert_projector(sd, cfg)
    _tree_equal(params["projector"], back)


def test_bf16_roundtrip(tmp_path):
    """Regression: np.savez silently stores bfloat16 as void bytes; the
    store must upcast + restore the true dtype (bf16 is the train default)."""
    tree = {"w": jnp.ones((4, 4), jnp.bfloat16) * 1.5,
            "b": jnp.arange(3, dtype=jnp.float32)}
    save_tree(str(tmp_path), tree)
    loaded = load_tree(str(tmp_path))
    assert loaded["w"].dtype == jnp.bfloat16
    assert loaded["b"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(loaded["w"], np.float32),
                                  np.asarray(tree["w"], np.float32))


def test_opt_state_roundtrip_bf16(tmp_path):
    import optax

    params = {"a": jnp.ones((3,), jnp.bfloat16)}
    opt = optax.adam(1e-3)
    st = opt.init(params)
    from streammind_tpu.utils.checkpoint import load_opt_state, save_opt_state

    save_opt_state(str(tmp_path), st)
    restored = load_opt_state(str(tmp_path), opt.init(params))
    assert restored is not None
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
        assert np.asarray(a).dtype == np.asarray(b).dtype


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from streammind_tpu.utils.checkpoint import load_tree_orbax, save_tree_orbax

    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": {"c": jnp.ones((4,), jnp.bfloat16)}}
    save_tree_orbax(str(tmp_path), tree)
    loaded = load_tree_orbax(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    assert jnp.asarray(loaded["b"]["c"]).dtype == jnp.bfloat16


def test_orbax_sharded_restore(tmp_path):
    """Multi-host path: restore leaves DIRECTLY into target shardings so no
    host stages the full tree (conftest pins an 8-device CPU mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from streammind_tpu.utils.checkpoint import load_tree_orbax, save_tree_orbax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    tree = {
        "w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
        "b": jnp.ones((8,), jnp.float32),
    }
    save_tree_orbax(str(tmp_path), tree)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("fsdp", "tp"))
    shardings = {
        "w": NamedSharding(mesh, P("fsdp", "tp")),
        "b": NamedSharding(mesh, P("tp")),
    }
    out = load_tree_orbax(str(tmp_path), shardings=shardings)
    assert out["w"].sharding == shardings["w"]
    assert out["b"].sharding == shardings["b"]
    assert out["w"].addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
