"""Weight-conversion parity: our models must reproduce transformers' forward
bit-for-bit at fp32 from converted HF state dicts."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers

from streammind_tpu.config import (
    TextConfig,
    VisionConfig,
    tiny_streammind_config,
)
from streammind_tpu.models import mistral as lm
from streammind_tpu.models.vit import vit_forward
from streammind_tpu.utils.convert import (
    convert_clip_vision,
    convert_hf_text,
    merge_lora,
)


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_mistral():
    conf = transformers.MistralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(conf).eval()
    return conf, model


def test_mistral_parity_fp32(hf_mistral):
    conf, model = hf_mistral
    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16,
    )
    params = convert_hf_text(_sd_numpy(model), cfg)
    ids = np.array([[5, 17, 99, 3, 64, 2, 11, 42]])
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = lm.text_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_parity_fp32():
    """Qwen2 backbone (reference builder.py:128-129): q/k/v biases + tied
    embeddings must reproduce transformers' Qwen2 forward at fp32."""
    conf = transformers.Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(conf).eval()
    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=1_000_000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True, qkv_bias=True,
    )
    params = convert_hf_text(_sd_numpy(model), cfg)
    assert "bias" in params["layers"]["q"] and "lm_head" not in params
    ids = np.array([[5, 17, 99, 3, 64, 2, 11, 42]])
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = lm.text_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_init_and_cache_shapes():
    """Scratch init of a qkv_bias config produces bias leaves that the decode
    path consumes (cache prefill+step smoke)."""
    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, qkv_bias=True,
        tie_word_embeddings=True,
    )
    params = lm.init_text_params(jax.random.PRNGKey(0), cfg)
    assert params["layers"]["q"]["bias"].shape == (2, 32)
    cache = lm.init_kv_cache(cfg, batch=1, capacity=16, dtype=jnp.float32)
    ids = jnp.array([[1, 5, 9, 2]])
    logits, cache = lm.text_forward(params, cfg, input_ids=ids, cache=cache)
    logits2, cache = lm.text_forward(
        params, cfg, input_ids=jnp.array([[7]]), cache=cache
    )
    assert logits2.shape == (1, 1, 64)
    full, _ = lm.text_forward(
        params, cfg, input_ids=jnp.array([[1, 5, 9, 2, 7]])
    )
    np.testing.assert_allclose(
        np.asarray(logits2[0, -1]), np.asarray(full[0, -1]), rtol=1e-4, atol=1e-4
    )


def test_clip_vision_parity_fp32():
    conf = transformers.CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.CLIPVisionModel(conf).eval()

    cfg = VisionConfig(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=3, num_heads=4, select_layer=-2, select_feature="patch",
    )
    params = convert_clip_vision(_sd_numpy(model), cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True).hidden_states
    ref = hs[-2][:, 1:].numpy()  # reference feature_select: layer -2, drop CLS

    ours = vit_forward(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_lora_merge():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((8, 8)).astype(np.float32)
    A = rng.standard_normal((2, 8)).astype(np.float32)
    B = rng.standard_normal((8, 2)).astype(np.float32)
    sd = {"model.layers.0.self_attn.q_proj.weight": W}
    lora = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    merged = merge_lora(sd, lora, scaling=0.5)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"], W + 0.5 * (B @ A), rtol=1e-6
    )


def test_stc_connector_timm_weight_interop():
    """convert_stc_connector loads a timm-style STCConnector state dict
    (reference builder.py:574-700: RegStage(norm_layer=LayerNorm2d,
    act_layer=SiLU) + Conv3d sampler + MLP readout) and reproduces the torch
    forward at fp32.  timm isn't installed here, so the torch side is a
    minimal mirror of timm's Bottleneck with identical state-dict naming."""
    import torch.nn as nn
    import torch.nn.functional as F

    class LayerNorm2d(nn.LayerNorm):
        def __init__(self, c):
            super().__init__(c, eps=1e-6)

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    class ConvNormAct(nn.Module):
        def __init__(self, i, o, k, groups=1, act=True):
            super().__init__()
            self.conv = nn.Conv2d(i, o, k, padding=k // 2, groups=groups, bias=False)
            self.bn = LayerNorm2d(o)  # timm names the norm 'bn' regardless
            self.act = nn.SiLU() if act else nn.Identity()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class SE(nn.Module):
        def __init__(self, c, rd):
            super().__init__()
            self.fc1 = nn.Conv2d(c, rd, 1)
            self.fc2 = nn.Conv2d(rd, c, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            return x * torch.sigmoid(self.fc2(F.silu(self.fc1(s))))

    class Bottleneck(nn.Module):
        def __init__(self, i, o, groups):
            super().__init__()
            self.conv1 = ConvNormAct(i, o, 1)
            self.conv2 = ConvNormAct(o, o, 3, groups=groups)
            self.se = SE(o, max(int(i * 0.25), 1))
            self.conv3 = ConvNormAct(o, o, 1, act=False)
            self.downsample = ConvNormAct(i, o, 1, act=False) if i != o else None
            self.act3 = nn.SiLU()

        def forward(self, x):
            sc = self.downsample(x) if self.downsample is not None else x
            return self.act3(self.conv3(self.se(self.conv2(self.conv1(x)))) + sc)

    class Stage(nn.Module):
        def __init__(self, depth, i, o, groups):
            super().__init__()
            for n in range(depth):
                setattr(self, f"b{n + 1}", Bottleneck(i if n == 0 else o, o, groups))
            self.depth = depth

        def forward(self, x):
            for n in range(self.depth):
                x = getattr(self, f"b{n + 1}")(x)
            return x

    enc, hid, depth = 16, 32, 2
    class TorchSTC(nn.Module):
        def __init__(self):
            super().__init__()
            self.s1 = Stage(depth, enc, hid, groups=4)
            self.sampler = nn.Sequential(
                nn.Conv3d(hid, hid, 2, stride=2, padding=1), nn.SiLU()
            )
            self.s2 = Stage(depth, hid, hid, groups=4)
            self.readout = nn.Sequential(
                nn.Linear(hid, hid), nn.GELU(), nn.Linear(hid, hid)
            )

        def forward(self, x):  # (B, T, L, D)
            b, t, l, d = x.shape
            hw = int(l ** 0.5)
            x = x.reshape(b, t, hw, hw, d).permute(0, 4, 1, 2, 3)
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, d, hw, hw)
            x = self.s1(x)
            x = x.reshape(b, t, hid, hw, hw).permute(0, 2, 1, 3, 4)
            x = self.sampler(x)
            nt, nh, nw = x.shape[2:]
            x = x.permute(0, 2, 1, 3, 4).reshape(b * nt, hid, nh, nw)
            x = self.s2(x)
            x = x.reshape(b, nt, hid, nh, nw).permute(0, 1, 3, 4, 2)
            return self.readout(x.reshape(b, nt * nh * nw, hid))

    torch.manual_seed(3)
    model = TorchSTC().eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 16, enc)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).numpy()

    from streammind_tpu.models.connectors import stc_forward
    from streammind_tpu.utils.convert import convert_stc_connector

    params = convert_stc_connector(_sd_numpy(model), depth=depth, mlp_depth=2)
    ours = stc_forward(jnp.asarray(x), params, variant="stc")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ptype", ["spatial_conv", "spatial_pool"])
def test_spatial_connector_convert_parity(ptype):
    """spatial_conv / spatial_pool released-format checkpoints convert and
    reproduce the torch forward at fp32.  The reference classes are depth-0
    STC/STP connectors with downsample=(1,2,2) (builder.py:780-794):
    identity stages, Conv3d(k=(1,2,2), s=(1,2,2), padding=1) or
    AvgPool3d((1,2,2)), SiLU, 2-layer MLP readout.  As declared upstream
    those layers only run when mm_hidden == hidden, so the mirror uses
    equal dims."""
    import torch.nn as nn

    hid = 24  # = mm_hidden (the upstream modules require equal dims)

    class TorchSpatial(nn.Module):
        def __init__(self):
            super().__init__()
            if ptype == "spatial_conv":
                self.sampler = nn.Sequential(
                    nn.Conv3d(hid, hid, (1, 2, 2), stride=(1, 2, 2), padding=1),
                    nn.SiLU(),
                )
            else:
                self.sampler = nn.Sequential(nn.AvgPool3d((1, 2, 2)), nn.SiLU())
            self.readout = nn.Sequential(
                nn.Linear(hid, hid), nn.GELU(), nn.Linear(hid, hid)
            )

        def forward(self, x):  # (B, T, L, D) — STCConnector.forward, s1/s2=Identity
            b, t, l, d = x.shape
            hw = int(l ** 0.5)
            x = x.reshape(b, t, hw, hw, d).permute(0, 4, 1, 2, 3)
            x = self.sampler(x)
            nt, nh, nw = x.shape[2:]
            x = x.permute(0, 2, 1, 3, 4).permute(0, 1, 3, 4, 2)
            return self.readout(x.reshape(b, nt * nh * nw, hid))

    torch.manual_seed(5)
    model = TorchSpatial().eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 16, hid)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).numpy()

    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.models import projector as proj
    from streammind_tpu.utils.convert import convert_projector_dispatch

    cfg = tiny_streammind_config().replace(mm_projector_type=ptype)
    # forward parity via the converter + our shared stc_forward path
    params = convert_projector_dispatch(_sd_numpy(model), cfg)
    ours = proj.simple_project(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)

    # the dispatch also consumes the mm_projector.-prefixed layout with an
    # embedded gate, and routes the gate to projector["cls_net"]
    g = cfg.gate
    gate_conf = transformers.MistralConfig(
        vocab_size=g.vocab_size, hidden_size=g.hidden_size,
        intermediate_size=g.intermediate_size, num_hidden_layers=g.num_layers,
        num_attention_heads=g.num_heads, num_key_value_heads=g.num_kv_heads,
        head_dim=g.head_dim, attn_implementation="eager",
    )
    torch.manual_seed(6)
    gate_t = _sd_numpy(transformers.MistralForCausalLM(gate_conf).eval())
    sd = {f"mm_projector.{k}": v for k, v in _sd_numpy(model).items()}
    sd.update({f"mm_projector.cls_net.cls_model.{k}": v for k, v in gate_t.items()})
    params2 = convert_projector_dispatch(sd, cfg)
    assert "cls_net" in params2
    out2 = proj.simple_project(
        {k: v for k, v in params2.items() if k != "cls_net"}, cfg, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=2e-4, atol=2e-4)


def test_load_state_dict_skips_trainer_artifacts(tmp_path):
    """HF Trainer writes training_args.bin (a pickled object) next to the
    weight shards — it must be filtered out, not torch.load'ed as weights."""
    import torch

    torch.save({"w": torch.ones(2, 2)}, tmp_path / "pytorch_model.bin")
    # a non-tensor pickle exactly like the Trainer's artifact
    torch.save({"not": "weights"}, tmp_path / "training_args.bin")
    from streammind_tpu.utils.convert import load_state_dict

    sd = load_state_dict(str(tmp_path))
    assert set(sd) == {"w"}


def test_convert_lora_checkpoint_layout(tmp_path, rng):
    """The reference LoRA zoo entry (model/builder.py:60-109): base dir +
    adapter_model.bin (+config) + non_lora_trainables.bin.  The merged
    tree must equal base + scaling * B@A on the adapted weight, with the
    projector overlaid from non_lora_trainables."""
    import json as _json

    import torch

    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.utils.convert import convert_streammind_checkpoint
    from streammind_tpu.utils.manifest import mistral_lm_manifest, projector_manifest

    cfg = tiny_streammind_config()
    t = cfg.text
    base_dir = tmp_path / "base"
    lora_dir = tmp_path / "lora"
    base_dir.mkdir()
    lora_dir.mkdir()

    base_manifest = mistral_lm_manifest(
        hidden_size=t.hidden_size, intermediate_size=t.intermediate_size,
        num_layers=t.num_layers, num_heads=t.num_heads,
        num_kv_heads=t.num_kv_heads, vocab_size=t.vocab_size,
        head_dim=t.head_dim,
    )
    base_sd = {k: torch.from_numpy(
        rng.standard_normal(shape).astype(np.float32))
        for k, shape in base_manifest.items()}
    torch.save(base_sd, base_dir / "pytorch_model.bin")

    r, alpha = 4, 8
    qw = "model.layers.0.self_attn.q_proj"
    A = rng.standard_normal((r, t.hidden_size)).astype(np.float32)
    B = rng.standard_normal(
        (t.num_heads * t.head_dim, r)).astype(np.float32)
    torch.save(
        {f"base_model.model.{qw}.lora_A.weight": torch.from_numpy(A),
         f"base_model.model.{qw}.lora_B.weight": torch.from_numpy(B)},
        lora_dir / "adapter_model.bin")
    with open(lora_dir / "adapter_config.json", "w") as f:
        _json.dump({"r": r, "lora_alpha": alpha}, f)

    pm = projector_manifest(
        mm_hidden_size=cfg.mm_hidden_size, hidden_size=t.hidden_size,
        n_ssm=cfg.mamba.n_layers, d_state=cfg.mamba.d_state,
        d_conv=cfg.mamba.d_conv, expand=cfg.mamba.expand,
        gate_layers=cfg.gate.num_layers, gate_vocab=cfg.gate.vocab_size,
        gate_hidden=cfg.gate.hidden_size,
        gate_intermediate=cfg.gate.intermediate_size,
        gate_heads=cfg.gate.num_heads, gate_kv_heads=cfg.gate.num_kv_heads,
    )
    nlt = {f"base_model.model.model.mm_projector.{k}": torch.from_numpy(
        rng.standard_normal(shape).astype(np.float32))
        for k, shape in pm.items()}
    torch.save(nlt, lora_dir / "non_lora_trainables.bin")

    params = convert_streammind_checkpoint(
        str(lora_dir), cfg, base_path=str(base_dir))
    assert "text" in params and "projector" in params

    expect = (np.asarray(base_sd[qw + ".weight"])
              + (alpha / r) * (B @ A))
    got = np.asarray(params["text"]["layers"]["q"]["weight"][0])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
    # a non-adapted layer stays at base values
    np.testing.assert_allclose(
        np.asarray(params["text"]["layers"]["q"]["weight"][1]),
        np.asarray(base_sd["model.layers.1.self_attn.q_proj.weight"]),
        rtol=1e-6, atol=1e-6)
    # projector overlaid from non_lora_trainables
    np.testing.assert_allclose(
        np.asarray(params["projector"]["pre_net"]["weight"]),
        np.asarray(nlt["base_model.model.model.mm_projector.pre_net.fc3.weight"]),
        rtol=1e-6, atol=1e-6)


def test_convert_simple_and_stc_projector_dispatch(tmp_path, rng):
    """Non-mamba projector checkpoints route to the right converter
    instead of crashing in the mamba key lookups."""
    import dataclasses as _dc

    import torch

    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.utils.convert import convert_streammind_checkpoint

    base = tiny_streammind_config()
    for ptype, keys in (
        ("linear", {"weight": (base.text.hidden_size, base.mm_hidden_size),
                    "bias": (base.text.hidden_size,)}),
        ("mlp2x_gelu", {
            "0.weight": (base.text.hidden_size, base.mm_hidden_size),
            "0.bias": (base.text.hidden_size,),
            "2.weight": (base.text.hidden_size, base.text.hidden_size),
            "2.bias": (base.text.hidden_size,),
        }),
    ):
        cfg = _dc.replace(base, mm_projector_type=ptype)
        d = tmp_path / ptype
        d.mkdir()
        sd = {f"model.mm_projector.{k}": torch.from_numpy(
            rng.standard_normal(s).astype(np.float32)) for k, s in keys.items()}
        torch.save(sd, d / "mm_projector.bin")
        params = convert_streammind_checkpoint(str(d), cfg)
        proj = params["projector"]
        if ptype == "linear":
            assert proj["proj"]["weight"].shape == keys["weight"]
        else:
            assert len(proj["mlp"]) == 2
            assert proj["mlp"][1]["bias"].shape == keys["2.bias"]


def test_lora_checkpoint_without_base_raises(tmp_path):
    """An adapter dir without the base decoder must raise (the lora_A/B
    pairs would silently match an empty dict and the decoder would fall
    back to random init)."""
    import torch

    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.utils.convert import convert_streammind_checkpoint

    torch.save({"base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                torch.zeros(4, 64)}, tmp_path / "adapter_model.bin")
    with pytest.raises(ValueError, match="model-base|base_path|model_base"):
        convert_streammind_checkpoint(str(tmp_path), tiny_streammind_config())
