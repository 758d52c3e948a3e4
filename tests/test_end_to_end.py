"""The product loop, end to end: stage-2 gate training on a synthetic event
task, then streaming inference where the trained gate must fire on events
and stay silent otherwise.  This is the round-trip the whole framework
exists for: data → train (freeze masks) → carried-state streaming."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.models.meta import init_streammind_params
from streammind_tpu.streaming import StreamMindEngine, StreamSession, init_stream_state
from streammind_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
    stage2_gate_loss,
    trainable_mask,
)


def _make_frames(rng, cfg, t, bright_at):
    """Random frames; frames at `bright_at` indices get a strong offset —
    the 'event' the gate must learn to detect."""
    frames = rng.standard_normal(
        (t, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    for i in bright_at:
        frames[i] += 3.0
    return frames


@pytest.mark.slow
def test_gate_learns_and_streams():
    cfg = tiny_streammind_config()
    rng = np.random.default_rng(0)
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)

    from streammind_tpu.models.meta import encode_frames

    mask = trainable_mask(params, "cls")
    opt = make_optimizer(3e-4, mask)
    state = init_train_state(params, opt)

    def loss_fn(p, b):
        return stage2_gate_loss(p, cfg, b["frames"], b["labels"], b["mask"])

    step = jax.jit(make_train_step(loss_fn, opt))

    T = 8
    encode = jax.jit(lambda p, px: encode_frames(p, cfg, px))
    losses = []
    for it in range(60):
        bright = sorted(rng.choice(T, size=2, replace=False))
        frames = _make_frames(rng, cfg, T, bright)
        feats = encode(state.params, jnp.asarray(frames))
        labels = np.zeros((1, T), np.int64)
        labels[0, bright] = 1
        batch = {
            "frames": feats,
            "labels": jnp.asarray(labels),
            "mask": jnp.ones((1, T), bool),
        }
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    # -- stream with the trained gate --------------------------------------
    class Tok:
        bos_token_id = 1
        eos_token_id = 2
        eos_token = "</s>"

        class O:
            def __init__(s, i):
                s.input_ids = i

        def __call__(s, t):
            return s.O([1] + [3 + (ord(c) % 200) for c in t][:10])

        def decode(s, ids):
            return " ".join(map(str, ids))

    engine = StreamMindEngine(state.params, cfg, eos_token_id=2,
                              prefill_buckets=(32, 64))
    session = StreamSession(engine, Tok(), prompt_ids=[1, 10, -201, 12],
                            max_new_tokens=3)

    bright_at = {3, 9}
    fires, silences = [], []
    for t in range(12):
        frames = _make_frames(rng, cfg, 1, [0] if t in bright_at else [])
        out = session.process_frame(jnp.asarray(frames))
        (fires if t in bright_at else silences).append(out is not None)

    # the trained gate must fire on events far more than on silence frames
    fire_rate = np.mean(fires)
    false_rate = np.mean(silences)
    assert fire_rate >= 0.5, (fires, silences)
    assert false_rate <= 0.5, (fires, silences)
    assert fire_rate > false_rate, (fires, silences)
