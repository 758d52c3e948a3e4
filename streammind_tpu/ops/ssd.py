"""SSD (state-space duality) chunked scan — the Mamba-2 compute core.

Replaces the reference's Triton SSD kernel family
(/root/reference/streammind/model/mamba_ssm/ops/triton/ssd_{combined,
chunk_scan,chunk_state,state_passing,bmm}.py, ~4.4k LoC of kernels) with the
chunked einsum formulation (the mamba_ssm `ssd_minimal` reference algorithm,
modules/ssd_minimal.py:34-80): within-chunk attention-like matmuls ride the
MXU, inter-chunk state passing is a short scan over L/chunk steps.

Shapes follow Mamba-2: per-head scalar decay
  x:  (B, L, H, P)   dt: (B, L, H)    A: (H,)  [negative]
  B, C: (B, L, G, N) with G groups broadcast over H
Recurrence per head h, state (P, N):
  S_t = exp(dt_t A_h) S_{t-1} + dt_t x_t ⊗ B_t ;  y_t = S_t C_t + D_h x_t
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def segsum(x: jax.Array) -> jax.Array:
    """Stable segment-sum: out[..., i, j] = sum_{j < k <= i} x[..., k],
    -inf above the diagonal (ssd_minimal's decay-matrix builder)."""
    t = x.shape[-1]
    cs = jnp.cumsum(x, axis=-1)
    diff = cs[..., :, None] - cs[..., None, :]
    mask = jnp.tril(jnp.ones((t, t), bool), k=0)
    return jnp.where(mask, diff, -jnp.inf)


def ssd_chunked(
    x: jax.Array,    # (B, L, H, P)
    dt: jax.Array,   # (B, L, H)  — already softplus'd, positive
    A: jax.Array,    # (H,) negative
    B: jax.Array,    # (B, L, G, N)
    C: jax.Array,    # (B, L, G, N)
    chunk: int = 64,
    D: Optional[jax.Array] = None,   # (H,)
    h0: Optional[jax.Array] = None,  # (B, H, P, N)
    return_last_state: bool = False,
):
    """Chunked SSD scan.  L must be a multiple of `chunk` (pad upstream)."""
    b, l, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    assert l % chunk == 0, (l, chunk)
    nc = l // chunk
    rep = h // g

    x32 = x.astype(jnp.float32)
    dt32 = dt.astype(jnp.float32)
    A32 = A.astype(jnp.float32)
    # broadcast groups → heads
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=2)  # (B, L, H, N)
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=2)

    # chunked views: (B, NC, CH, H, ...)
    xc = x32.reshape(b, nc, chunk, h, p)
    dtc = dt32.reshape(b, nc, chunk, h)
    Bc = Bh.reshape(b, nc, chunk, h, n)
    Cc = Ch.reshape(b, nc, chunk, h, n)

    dA = dtc * A32[None, None, None, :]          # (B, NC, CH, H)
    dA_cum = jnp.cumsum(dA, axis=2)

    # 1. intra-chunk (diagonal blocks): attention-like masked matmul
    L = jnp.exp(segsum(dA.transpose(0, 1, 3, 2)))        # (B, NC, H, CH, CH)
    scores = jnp.einsum("bzlhn,bzshn->bzhls", Cc, Bc)     # (B,NC,H,CH,CH)
    y_diag = jnp.einsum(
        "bzhls,bzhls,bzsh,bzshp->bzlhp",
        scores, L, dtc, xc,
    )

    # 2. chunk-final states: decayed sum of within-chunk contributions
    decay_states = jnp.exp(dA_cum[:, :, -1:, :] - dA_cum)  # (B,NC,CH,H)
    states = jnp.einsum(
        "bzshn,bzsh,bzsh,bzshp->bzhpn", Bc, decay_states, dtc, xc
    )  # (B, NC, H, P, N)

    # 3. inter-chunk state passing (short sequential scan over NC)
    chunk_decay = jnp.exp(jnp.sum(dA, axis=2))  # (B, NC, H)

    def pass_state(carry, inp):
        s_new, decay = inp
        carry = carry * decay[..., None, None] + s_new
        return carry, carry

    init = (
        h0.astype(jnp.float32)
        if h0 is not None
        else jnp.zeros((b, h, p, n), jnp.float32)
    )
    _, all_states = jax.lax.scan(
        pass_state,
        init,
        (states.transpose(1, 0, 2, 3, 4), chunk_decay.transpose(1, 0, 2)),
    )  # (NC, B, H, P, N) — state AFTER each chunk
    prev_states = jnp.concatenate(
        [init[None], all_states[:-1]], axis=0
    ).transpose(1, 0, 2, 3, 4)  # (B, NC, H, P, N) — state entering each chunk

    # 4. inter-chunk contribution to outputs
    state_decay = jnp.exp(dA_cum)  # (B, NC, CH, H)
    y_off = jnp.einsum(
        "bzlhn,bzhpn,bzlh->bzlhp", Cc, prev_states, state_decay
    )

    y = (y_diag + y_off).reshape(b, l, h, p)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :, None] * x32
    y = y.astype(x.dtype)
    if return_last_state:
        return y, all_states[-1]
    return y


def ssd_reference(
    x, dt, A, B, C, D=None, h0=None, return_last_state=False
):
    """Naive sequential recurrence (ground truth for ssd_chunked)."""
    b, l, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    rep = h // g
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=2)
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=2)
    x32, dt32 = x.astype(jnp.float32), dt.astype(jnp.float32)
    A32 = A.astype(jnp.float32)

    def step(s, inp):
        x_t, dt_t, B_t, C_t = inp
        decay = jnp.exp(dt_t * A32[None])[:, :, None, None]     # (B,H,1,1)
        s = s * decay + jnp.einsum(
            "bhp,bhn,bh->bhpn", x_t, B_t, dt_t
        )
        y = jnp.einsum("bhpn,bhn->bhp", s, C_t)
        return s, y

    init = (
        h0.astype(jnp.float32) if h0 is not None
        else jnp.zeros((b, h, p, n), jnp.float32)
    )
    last, ys = jax.lax.scan(
        step, init,
        (x32.transpose(1, 0, 2, 3), dt32.transpose(1, 0, 2),
         Bh.transpose(1, 0, 2, 3), Ch.transpose(1, 0, 2, 3)),
    )
    y = ys.transpose(1, 0, 2, 3)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :, None] * x32
    y = y.astype(x.dtype)
    if return_last_state:
        return y, last
    return y


def ssd_state_update(
    state: jax.Array,  # (B, H, P, N)
    x: jax.Array,      # (B, H, P)
    dt: jax.Array,     # (B, H) softplus'd
    A: jax.Array,      # (H,)
    B: jax.Array,      # (B, G, N)
    C: jax.Array,      # (B, G, N)
    D: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-token Mamba-2 state update (decode/streaming)."""
    h = state.shape[1]
    rep = h // B.shape[1]
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=1)
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=1)
    decay = jnp.exp(dt.astype(jnp.float32) * A.astype(jnp.float32)[None])
    state = state * decay[:, :, None, None] + jnp.einsum(
        "bhp,bhn,bh->bhpn", x.astype(jnp.float32), Bh, dt.astype(jnp.float32)
    )
    y = jnp.einsum("bhpn,bhn->bhp", state, Ch)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * x.astype(jnp.float32)
    return y.astype(x.dtype), state
