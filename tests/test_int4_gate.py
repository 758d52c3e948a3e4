"""int4 gate tier (VERDICT r2 item 7 / ROADMAP perf lever).

The gate is pure weight bandwidth; int4 halves its bytes vs int8 IF the
nibble unpack fuses into the matmul (ops/int4_matvec.py Pallas kernel —
XLA dequant-on-read measured 6.7x slower than int8).  Contract: the
kernel exactly matches the dequantize-then-matmul reference, and the gate
DECISION passes the same probability-tolerance test as the int8 tier.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.models.meta import init_streammind_params
from streammind_tpu.ops.int4_matvec import int4_matvec
from streammind_tpu.streaming import StreamMindEngine
from streammind_tpu.streaming.state import init_stream_state
from streammind_tpu.utils.quantize import (
    dequantize_linear_weight_int4_pc,
    quantize_gate_params,
    quantize_linear_weight_int4_pc,
)


def test_int4pc_pack_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    q = quantize_linear_weight_int4_pc(w)
    assert q["w_int4pc"].shape == (64, 128) and q["w_int4pc"].dtype == jnp.int8
    assert q["scale"].shape == (64,)
    deq = dequantize_linear_weight_int4_pc(q)
    # per-channel int4: error bounded by scale/2 per element
    err = np.max(np.abs(np.asarray(deq - w)))
    assert err <= float(jnp.max(q["scale"])) * 0.5 + 1e-6

    # stacked layers quantize layerwise
    ws = jnp.asarray(rng.standard_normal((3, 16, 64)), jnp.float32)
    qs = quantize_linear_weight_int4_pc(ws)
    assert qs["w_int4pc"].shape == (3, 16, 32) and qs["scale"].shape == (3, 16)
    per_layer = quantize_linear_weight_int4_pc(ws[1])
    np.testing.assert_array_equal(
        np.asarray(qs["w_int4pc"][1]), np.asarray(per_layer["w_int4pc"])
    )


def test_int4_matvec_kernel_matches_dequant(rng):
    """The fused kernel (interpret mode on CPU) == dequant-then-matmul."""
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    q = quantize_linear_weight_int4_pc(w)
    x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    ref = x @ dequantize_linear_weight_int4_pc(q).T
    out = int4_matvec(x, q["w_int4pc"], q["scale"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # odd output dims fall to a smaller tile
    w2 = jnp.asarray(rng.standard_normal((40, 128)), jnp.float32)
    q2 = quantize_linear_weight_int4_pc(w2)
    x2 = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    ref2 = x2 @ dequantize_linear_weight_int4_pc(q2).T
    out2 = int4_matvec(x2, q2["w_int4pc"], q2["scale"])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5, atol=1e-5)


def test_quantize_gate_params_int4_structure():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    q = quantize_gate_params(params["projector"]["cls_net"], bits=4)
    assert "w_int4pc" in q["layers"]["q"]
    assert "w_int4pc" in q["layers"]["mlp"]["down"]
    # embeddings / norms / lm_head stay full precision
    assert "weight" in q["embed_tokens"] or hasattr(q["embed_tokens"], "shape") \
        or isinstance(q["embed_tokens"], jnp.ndarray)


def test_int4_gate_decisions_close_to_fp(rng):
    """Same contract as the int8 tier (test_streaming.py): probabilities
    close, decisions agree on (nearly) all inputs.  int4 is coarser, so
    the probability tolerance is looser — the DECISION agreement is the
    product contract."""
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    eng_fp = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,))
    eng_q = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,),
                             quantize_gate="int4")
    agree = 0
    for i in range(8):
        frame = jnp.asarray(rng.standard_normal(
            (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
        p_fp, _ = eng_fp.perceive_step(frame, init_stream_state(cfg))
        p_q, _ = eng_q.perceive_step(frame, init_stream_state(cfg))
        np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_fp), atol=0.15)
        agree += int(np.argmax(np.asarray(p_q)) == np.argmax(np.asarray(p_fp)))
    assert agree >= 7, agree


def test_engine_rejects_unknown_gate_tier():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="quantize_gate"):
        StreamMindEngine(params, cfg, quantize_gate="int2")
