"""SSD chunked scan + Mamba-2 tests (the reference ssd_minimal
test_correctness pattern: chunked algorithm vs naive recurrence)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.models.mamba2 import (
    Mamba2Config,
    init_mamba2_params,
    init_mamba2_state,
    mamba2_forward,
    mamba2_step,
)
from streammind_tpu.ops.ssd import ssd_chunked, ssd_reference, ssd_state_update

B, L, H, P, G, N = 2, 32, 4, 8, 2, 16


def make_inputs(rng):
    x = jnp.asarray(rng.standard_normal((B, L, H, P)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.standard_normal((B, L, H))) * 0.5 + 0.01, jnp.float32)
    A = -jnp.asarray(np.abs(rng.standard_normal((H,))) + 0.1, jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    return x, dt, A, Bm, C, D


def test_ssd_chunked_matches_reference(rng):
    x, dt, A, Bm, C, D = make_inputs(rng)
    y_ref, s_ref = ssd_reference(x, dt, A, Bm, C, D=D, return_last_state=True)
    for chunk in (8, 16, 32):
        y, s = ssd_chunked(x, dt, A, Bm, C, chunk=chunk, D=D, return_last_state=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_ssd_initial_state_continuation(rng):
    x, dt, A, Bm, C, D = make_inputs(rng)
    y_full, s_full = ssd_reference(x, dt, A, Bm, C, D=D, return_last_state=True)
    k = 16
    y1, s1 = ssd_chunked(x[:, :k], dt[:, :k], A, Bm[:, :k], C[:, :k],
                         chunk=8, D=D, return_last_state=True)
    y2, s2 = ssd_chunked(x[:, k:], dt[:, k:], A, Bm[:, k:], C[:, k:],
                         chunk=8, D=D, h0=s1, return_last_state=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, k:]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full), rtol=2e-4, atol=2e-4)


def test_ssd_step_streams_the_scan(rng):
    x, dt, A, Bm, C, D = make_inputs(rng)
    y_ref = ssd_reference(x, dt, A, Bm, C, D=D)
    s = jnp.zeros((B, H, P, N), jnp.float32)
    ys = []
    for t in range(L):
        y_t, s = ssd_state_update(s, x[:, t], dt[:, t], A, Bm[:, t], C[:, t], D=D)
        ys.append(y_t)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(ys, 1)), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )


def test_mamba2_step_equals_forward(rng):
    cfg = Mamba2Config(d_model=64, d_state=16, headdim=16, ngroups=2, chunk_size=8)
    params = init_mamba2_params(jax.random.PRNGKey(0), cfg)
    u = jnp.asarray(rng.standard_normal((2, 12, cfg.d_model)), jnp.float32)

    y_full, final = mamba2_forward(params, cfg, u, return_state=True)
    state = init_mamba2_state(cfg, batch=2)
    ys = []
    for t in range(12):
        y_t, state = mamba2_step(params, cfg, u[:, t], state)
        ys.append(y_t)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(ys, 1)), np.asarray(y_full), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.ssm), np.asarray(final.ssm), rtol=5e-4, atol=5e-4
    )


def test_mamba2_chunked_continuation(rng):
    cfg = Mamba2Config(d_model=64, d_state=16, headdim=16, chunk_size=8)
    params = init_mamba2_params(jax.random.PRNGKey(1), cfg)
    u = jnp.asarray(rng.standard_normal((1, 24, cfg.d_model)), jnp.float32)
    y_full, _ = mamba2_forward(params, cfg, u, return_state=True)
    y1, st = mamba2_forward(params, cfg, u[:, :8], return_state=True)
    y2, _ = mamba2_forward(params, cfg, u[:, 8:], state=st, return_state=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_full[:, :8]), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, 8:]), rtol=5e-4, atol=5e-4)
