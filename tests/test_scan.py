"""Selective-scan numerics: all implementations must agree with the
sequential reference, and the streaming single-step must reproduce the
full-scan prefix (the carried-state property the engine depends on)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.ops.scan import (
    causal_conv1d,
    causal_conv1d_update,
    selective_scan_assoc,
    selective_scan_pallas,
    selective_scan_ref,
    selective_state_update,
)

B, D, L, N = 2, 8, 12, 4


def make_inputs(rng, with_z=True):
    u = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((D, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
    Dm = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32) if with_z else None
    dt_bias = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    return u, delta, A, Bm, C, Dm, z, dt_bias


def test_ref_matches_manual_loop(rng):
    """Cross-check the lax.scan reference against a plain numpy loop
    implementing the published Mamba recurrence."""
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)
    out = np.asarray(
        selective_scan_ref(u, delta, A, Bm, C, Dm, z, dt_bias, delta_softplus=True)
    )

    un, dn = np.asarray(u), np.asarray(delta)
    An, Bn, Cn, Dn = map(np.asarray, (A, Bm, C, Dm))
    zn, dbn = np.asarray(z), np.asarray(dt_bias)
    dt = np.logaddexp(dn + dbn[None, :, None], 0)  # softplus
    y = np.zeros((B, D, L), np.float32)
    for b in range(B):
        h = np.zeros((D, N), np.float64)
        for t in range(L):
            dA = np.exp(dt[b, :, t, None] * An)
            h = h * dA + (dt[b, :, t] * un[b, :, t])[:, None] * Bn[b, None, :, t]
            y[b, :, t] = (h @ Cn[b, :, t]) + Dn * un[b, :, t]
    y = y * (zn / (1 + np.exp(-zn)))  # silu gate
    np.testing.assert_allclose(out, y, rtol=2e-5, atol=2e-5)


def test_assoc_matches_ref(rng):
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)
    kw = dict(D=Dm, z=z, delta_bias=dt_bias, delta_softplus=True, return_last_state=True)
    y_ref, h_ref = selective_scan_ref(u, delta, A, Bm, C, **kw)
    y_as, h_as = selective_scan_assoc(u, delta, A, Bm, C, **kw)
    np.testing.assert_allclose(np.asarray(y_as), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_as), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


def test_pallas_matches_ref(rng):
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)
    kw = dict(D=Dm, z=z, delta_bias=dt_bias, delta_softplus=True, return_last_state=True)
    y_ref, h_ref = selective_scan_ref(u, delta, A, Bm, C, **kw)
    y_pl, h_pl = selective_scan_pallas(u, delta, A, Bm, C, block_d=D, **kw)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


def test_initial_state_and_continuation(rng):
    """Scanning [0:k] then [k:L] with carried h equals one full scan."""
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)
    kw = dict(D=Dm, delta_bias=dt_bias, delta_softplus=True)
    k = 5
    y_full, h_full = selective_scan_ref(
        u, delta, A, Bm, C, z=z, return_last_state=True, **kw
    )
    y1, h1 = selective_scan_ref(
        u[..., :k], delta[..., :k], A, Bm[..., :k], C[..., :k],
        z=z[..., :k], return_last_state=True, **kw
    )
    y2, h2 = selective_scan_assoc(
        u[..., k:], delta[..., k:], A, Bm[..., k:], C[..., k:],
        z=z[..., k:], h0=h1, return_last_state=True, **kw
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_full[..., :k]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[..., k:]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full), rtol=1e-4, atol=1e-5)


def test_state_update_streams_the_scan(rng):
    """Applying the O(1) step L times == one full scan (the perception loop)."""
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)
    y_ref, h_ref = selective_scan_ref(
        u, delta, A, Bm, C, Dm, z, dt_bias, delta_softplus=True, return_last_state=True
    )
    h = jnp.zeros((B, D, N), jnp.float32)
    ys = []
    for t in range(L):
        y_t, h = selective_state_update(
            h, u[..., t], delta[..., t], A, Bm[..., t], C[..., t],
            D=Dm, z=z[..., t], dt_bias=dt_bias, dt_softplus=True,
        )
        ys.append(y_t)
    y_stream = jnp.stack(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=1e-4, atol=1e-5)


def test_causal_conv1d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.standard_normal((B, D, L)).astype(np.float32)
    w = rng.standard_normal((D, 4)).astype(np.float32)
    b = rng.standard_normal((D,)).astype(np.float32)

    out = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    xt = torch.tensor(x)
    wt = torch.tensor(w).unsqueeze(1)  # (D,1,W) depthwise
    conv = F.conv1d(xt, wt, torch.tensor(b), padding=3, groups=D)[..., :L]
    expected = F.silu(conv).numpy()
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_short_sequence(rng):
    """seqlen < conv width must still match the streaming taps (regression:
    pad-then-slice bug produced wrong lengths for L < W)."""
    x = jnp.asarray(rng.standard_normal((1, D, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, 4)), jnp.float32)
    full = causal_conv1d(x, w, None)
    state = jnp.zeros((1, D, 4), jnp.float32)
    ys = []
    for t in range(2):
        y, state = causal_conv1d_update(x[..., t], state, w, None)
        ys.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(ys, -1)), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_causal_conv1d_update_streams(rng):
    x = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    full = causal_conv1d(x, w, b)
    state = jnp.zeros((B, D, 4), jnp.float32)
    ys = []
    for t in range(L):
        y, state = causal_conv1d_update(x[..., t], state, w, b)
        ys.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(ys, -1)), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_assoc_scan_is_differentiable(rng):
    u, delta, A, Bm, C, Dm, z, dt_bias = make_inputs(rng)

    def loss(a):
        return jnp.sum(
            selective_scan_assoc(u, delta, a, Bm, C, D=Dm, z=z,
                                 delta_bias=dt_bias, delta_softplus=True) ** 2
        )

    g = jax.grad(loss)(A)
    assert np.isfinite(np.asarray(g)).all()
