"""Full-pipeline fp32 parity vs an independent torch mirror of the
reference's demo path (VERDICT r1 item 6; closes the BASELINE fidelity claim
as far as possible without released weights).

The torch side mirrors, structurally and numerically, the reference's
streaming demo composition:
  CLIP layer -2 patch features (clip_encoder.py:7)
  → spatial mean-pool → PreNet linear+leaky-relu (builder.py:161-169)
  → VideoMamba prenorm block + residual + final LayerNorm (ssm.py:28-100)
  → PostNet leaky-relu+linear (builder.py:172-180)
  → gate = 4-layer vocab-2 LM on the LAST memory token, cls_demo branch
    (builder.py:556-569: x[0][-1] → cls_net → logits[0][-1] → softmax)
  → interval_id_list span splice (videollama2_arch.py:948-983:
    start_feature_idx = [0]+interval_id_list[:-1]; span =
    X_features[0][start:end] replaces the modal token)
  → decoder forward.

The torch modules are NAMED per the reference module tree so the repo's own
checkpoint converter (utils/convert.py::convert_projector) ingests their
state_dict — the same code path a real released checkpoint would take.
The JAX side drives the REAL product path: streaming perceive_step per frame
(carried O(1) state) + bucketed cached prefill across two turns; the torch
side recomputes everything from scratch each turn.  Agreement proves the
incremental engine == the reference's recompute semantics end-to-end.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as nn
import torch.nn.functional as F

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models.meta import SplicePlan, build_splice_plan
from streammind_tpu.streaming import StreamMindEngine, init_stream_state
from streammind_tpu.utils.convert import (
    convert_clip_vision,
    convert_hf_text,
    convert_projector,
)


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# torch mirror modules, named per the reference module tree
# ---------------------------------------------------------------------------
class _PreNet(nn.Module):
    def __init__(self, d_in, d_out):
        super().__init__()
        self.fc3 = nn.Linear(d_in, d_out)


class _PostNet(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc3 = nn.Linear(d, d)


class _Mixer(nn.Module):
    """mamba_ssm Mamba mixer parameters (mamba_simple.py:31-120 shapes)."""

    def __init__(self, d_model, d_inner, d_state, d_conv, dt_rank):
        super().__init__()
        self.d_state, self.d_conv, self.dt_rank = d_state, d_conv, dt_rank
        self.in_proj = nn.Linear(d_model, 2 * d_inner, bias=False)
        self.conv1d = nn.Conv1d(d_inner, d_inner, d_conv, groups=d_inner, bias=True)
        self.x_proj = nn.Linear(d_inner, dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(dt_rank, d_inner, bias=True)
        self.A_log = nn.Parameter(torch.log(
            torch.arange(1, d_state + 1, dtype=torch.float32).repeat(d_inner, 1)
        ))
        self.D = nn.Parameter(torch.ones(d_inner))
        self.out_proj = nn.Linear(d_inner, d_model, bias=False)

    def forward(self, x):  # (B, L, D) -> (B, L, D)
        b, l, _ = x.shape
        xz = self.in_proj(x)
        xs, z = xz.chunk(2, dim=-1)
        xs_t = xs.transpose(1, 2)  # (B, Din, L)
        xc = F.conv1d(
            xs_t, self.conv1d.weight, self.conv1d.bias,
            padding=self.d_conv - 1, groups=xs_t.shape[1],
        )[..., :l]
        xc = F.silu(xc)
        x_dbl = self.x_proj(xc.transpose(1, 2))
        dt, Bc, Cc = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1
        )
        dt = F.softplus(self.dt_proj(dt))  # (B, L, Din)
        A = -torch.exp(self.A_log)  # (Din, N)
        h = torch.zeros(b, A.shape[0], A.shape[1])
        ys = []
        for t in range(l):
            dA = torch.exp(dt[:, t][:, :, None] * A[None])
            dBx = dt[:, t][:, :, None] * Bc[:, t][:, None, :] * xc[:, :, t][:, :, None]
            h = dA * h + dBx
            ys.append((h * Cc[:, t][:, None, :]).sum(-1))
        y = torch.stack(ys, dim=2)  # (B, Din, L)
        y = y + self.D[None, :, None] * xc
        y = y * F.silu(z.transpose(1, 2))
        return self.out_proj(y.transpose(1, 2))


class _Block(nn.Module):
    """mamba_ssm prenorm Block (block.py:11): residual accumulates; the
    mixer sees the normed residual."""

    def __init__(self, d_model, mixer):
        super().__init__()
        self.norm = nn.LayerNorm(d_model)
        self.mixer = mixer


class _VideoMamba(nn.Module):
    def __init__(self, d_model, blocks):
        super().__init__()
        self.ssms = nn.ModuleList(blocks)
        self.norm_fn = nn.LayerNorm(d_model)

    def forward(self, x):
        hidden, residual = x, None
        for blk in self.ssms:
            residual = hidden if residual is None else hidden + residual
            hidden = blk.mixer(blk.norm(residual))
        residual = hidden + residual if residual is not None else hidden
        return self.norm_fn(residual)


class _ClsNet(nn.Module):
    def __init__(self, cls_model):
        super().__init__()
        self.cls_model = cls_model


class _Projector(nn.Module):
    """State-dict keys match builder.py:390-401's Video_Mamba_seq tree."""

    def __init__(self, cfg, gate_lm):
        super().__init__()
        m = cfg.mamba
        self.pre_net = _PreNet(cfg.mm_hidden_size, cfg.text.hidden_size)
        self.mamba_model = _VideoMamba(
            m.d_model,
            [_Block(m.d_model, _Mixer(m.d_model, m.d_inner, m.d_state,
                                      m.d_conv, m.dt_rank_))
             for _ in range(m.n_layers)],
        )
        self.post_net = _PostNet(cfg.text.hidden_size)
        self.cls_net = _ClsNet(gate_lm)

    def memory_tokens(self, feats):  # (1, T, N, mm) -> (1, T, D)
        x = feats.mean(dim=2)  # spatial mean-pool (builder.py:405)
        x = F.leaky_relu(self.pre_net.fc3(x))
        x = self.mamba_model(x)
        return self.post_net.fc3(F.leaky_relu(x))

    @torch.no_grad()
    def gate_probs(self, memory):  # cls_demo branch: LAST token only
        logits = self.cls_net.cls_model(
            inputs_embeds=memory[:, -1:, :]
        ).logits[0][-1]
        return torch.softmax(logits.float(), dim=-1)


@pytest.fixture(scope="module")
def mirror():
    cfg = tiny_streammind_config()
    torch.manual_seed(7)
    vision = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        attn_implementation="eager",
    )).eval()
    gate_lm = transformers.MistralForCausalLM(transformers.MistralConfig(
        vocab_size=2,
        hidden_size=cfg.gate.hidden_size,
        intermediate_size=cfg.gate.intermediate_size,
        num_hidden_layers=cfg.gate.num_layers,
        num_attention_heads=cfg.gate.num_heads,
        num_key_value_heads=cfg.gate.num_kv_heads,
        head_dim=cfg.gate.head_dim,
        rms_norm_eps=cfg.gate.rms_norm_eps,
        attn_implementation="eager",
    )).eval()
    decoder = transformers.MistralForCausalLM(transformers.MistralConfig(
        vocab_size=cfg.text.vocab_size,
        hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.intermediate_size,
        num_hidden_layers=cfg.text.num_layers,
        num_attention_heads=cfg.text.num_heads,
        num_key_value_heads=cfg.text.num_kv_heads,
        head_dim=cfg.text.head_dim,
        rms_norm_eps=cfg.text.rms_norm_eps,
        attn_implementation="eager",
    )).eval()
    proj = _Projector(cfg, gate_lm).eval()

    # the repo's own converter ingests the reference-named state dict
    params = {
        "vision": convert_clip_vision(_sd_numpy(vision), cfg.vision),
        "projector": convert_projector(_sd_numpy(proj), cfg),
        "text": convert_hf_text(_sd_numpy(decoder), cfg.text),
    }
    engine = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32, 64))
    return cfg, vision, proj, decoder, engine


@torch.no_grad()
def _torch_memory(vision, proj, pixels_np):
    hs = vision(torch.tensor(pixels_np), output_hidden_states=True).hidden_states
    feats = hs[-2][:, 1:]  # layer -2, drop CLS (clip_encoder.py feature_select)
    return proj.memory_tokens(feats[None])  # (1, T, D)


def _plan(ids, span, bucket):
    plan = build_splice_plan(ids, [len(span)], VIDEO_TOKEN_INDEX, bucket)
    mem_index = plan.mem_index.copy()
    mem_index[plan.use_mem] = np.asarray(span, np.int32)
    return SplicePlan(token_ids=plan.token_ids, mem_index=mem_index,
                      use_mem=plan.use_mem, attn_mask=plan.attn_mask,
                      labels=plan.labels, length=plan.length)


def _torch_splice(decoder, memory, segments):
    """segments: list of ('ids', [int...]) | ('span', (start, end)) — the
    reference's while-loop splice (videollama2_arch.py:955-983)."""
    embed = decoder.get_input_embeddings()
    parts = []
    for kind, val in segments:
        if kind == "ids":
            parts.append(embed(torch.tensor([val]))[0])
        else:
            s, e = val
            parts.append(memory[0][s:e])
    seq = torch.cat(parts, dim=0)[None]
    with torch.no_grad():
        return decoder(inputs_embeds=seq).logits


def test_full_pipeline_two_turn_parity(mirror, rng):
    cfg, vision, proj, decoder, engine = mirror
    T1, T2 = 3, 6  # gate fires after frame 3 and after frame 6
    pixels = rng.standard_normal(
        (T2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)

    # ---- JAX product path: streaming perception, carried state ----------
    state = init_stream_state(cfg)
    for t in range(T1):
        gate_jax, state = engine.perceive_step(jnp.asarray(pixels[t : t + 1]), state)

    # ---- torch mirror: full recompute over all frames so far -------------
    mem_t1 = _torch_memory(vision, proj, pixels[:T1])
    gate_torch = proj.gate_probs(mem_t1)
    np.testing.assert_allclose(
        np.asarray(gate_jax), gate_torch.numpy(), rtol=1e-4, atol=1e-4
    )
    # memory ring == recomputed memory tokens
    np.testing.assert_allclose(
        np.asarray(state.memory[0, :T1]), mem_t1[0].numpy(), rtol=1e-4, atol=1e-4
    )

    # ---- turn 1: interval_id_list=[3] → span = memory[0:3] ---------------
    ids1 = [1, 7, 9, VIDEO_TOKEN_INDEX, 5, 8]
    span1 = list(range(0, T1))
    cache = engine.new_kv_cache()
    last1, cache = engine.prefill(_plan(ids1, span1, 32), state.memory, cache)

    logits_t1 = _torch_splice(
        decoder, mem_t1, [("ids", ids1[:3]), ("span", (0, T1)), ("ids", ids1[4:])]
    )
    np.testing.assert_allclose(
        np.asarray(last1[0]), logits_t1[0, -1].numpy(), rtol=2e-4, atol=2e-4
    )

    # greedy-decode two tokens through the cached engine; torch recomputes
    toks, cache = engine.generate_from_prefill(last1, cache, max_new_tokens=2)
    assert toks and toks[0] == int(torch.argmax(logits_t1[0, -1]))

    # ---- frames 4..6, turn 2: start_feature_idx = interval_id_list[:-1] --
    for t in range(T1, T2):
        gate_jax2, state = engine.perceive_step(jnp.asarray(pixels[t : t + 1]), state)
    mem_t2 = _torch_memory(vision, proj, pixels[:T2])
    gate_torch2 = proj.gate_probs(mem_t2)
    np.testing.assert_allclose(
        np.asarray(gate_jax2), gate_torch2.numpy(), rtol=1e-4, atol=1e-4
    )

    span2 = list(range(T1, T2))  # [0]+interval_id_list[:-1] → start=3, end=6
    suffix2 = [2, 20, VIDEO_TOKEN_INDEX, 21]  # </s> + next scaffold
    last2, cache = engine.prefill(_plan(suffix2, span2, 32), state.memory, cache)

    # torch: the WHOLE dialogue from scratch (spliced turn 1 + generated
    # tokens + turn 2 suffix with the second span)
    logits_t2 = _torch_splice(
        decoder, mem_t2,
        [("ids", ids1[:3]), ("span", (0, T1)), ("ids", ids1[4:]),
         ("ids", toks), ("ids", suffix2[:2]), ("span", (T1, T2)),
         ("ids", suffix2[3:])],
    )
    np.testing.assert_allclose(
        np.asarray(last2[0]), logits_t2[0, -1].numpy(), rtol=3e-4, atol=3e-4
    )
