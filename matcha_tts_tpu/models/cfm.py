"""Conditional flow matching: fixed-step ODE solvers + OT-CFM loss
(reference: /root/reference/model.py:1063-1162).

The reference's Python `for` loop over the estimator (model.py:1090-1104)
becomes a statically-unrolled loop inside one jitted graph — `n_timesteps`
is a static argument, so XLA schedules all NFE U-Net passes back-to-back
with no host round trips.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def solve(
    estimator: Callable,
    z: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    n_timesteps: int,
    solver: str = "euler",
) -> jnp.ndarray:
    """Integrate dz/dt = v(z, t) from t=0 to 1 with fixed steps.

    estimator(z, mask, mu, t) -> v;  z, mu: (B, T, C); mask: (B, T);
    t: (B,).  Matches the reference's Euler (model.py:1089-1094) and
    midpoint (model.py:1096-1104) solvers.
    """
    b = z.shape[0]
    dt = 1.0 / n_timesteps
    cdtype = mu.dtype  # compute dtype for the estimator (may be bf16)
    # integration state is kept in fp32 even under bf16 compute, so the
    # NFE-step accumulation does not lose precision
    z = z.astype(jnp.float32)

    if solver == "euler":
        for i in range(n_timesteps):
            t = jnp.full((b,), i / n_timesteps, cdtype)
            v = estimator(z.astype(cdtype), mask, mu, t)
            z = z + v.astype(jnp.float32) * dt
    elif solver == "midpoint":
        for i in range(n_timesteps):
            t = jnp.full((b,), i / n_timesteps, cdtype)
            pred = estimator(z.astype(cdtype), mask, mu, t)
            z_mid = z + pred.astype(jnp.float32) * (dt * 0.5)
            pred_mid = estimator(z_mid.astype(cdtype), mask, mu, t + dt * 0.5)
            z = z + pred_mid.astype(jnp.float32) * dt
    else:
        raise NotImplementedError(f"Solver {solver} not implemented")
    return z


def sample(
    estimator: Callable,
    key: jax.Array,
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    n_timesteps: int,
    temperature: float = 1.0,
    solver: str = "euler",
    noise_ids=None,
) -> jnp.ndarray:
    """z ~ N(0, I) * temperature, then ODE-solve (model.py:1084-1109).
    Noise is drawn in fp32 for reproducibility across compute dtypes.

    With `noise_ids` (B,) int32, each row's noise comes from
    fold_in(key, noise_ids[b]) — rows keyed by request CONTENT, so a
    batched request's noise does not depend on its row position or on
    which other requests share the batch (serving determinism)."""
    if noise_ids is None:
        z = jax.random.normal(key, mu.shape, jnp.float32) * temperature
    else:
        def row(nid):
            return jax.random.normal(jax.random.fold_in(key, nid),
                                     mu.shape[1:], jnp.float32)

        z = jax.vmap(row)(noise_ids) * temperature
    return solve(estimator, z, mask, mu, n_timesteps, solver)


def compute_loss(
    estimator: Callable,
    key: jax.Array,
    x1: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    sigma_min: float = 1e-4,
    compute_dtype: str = "float32",
):
    """OT-CFM loss (model.py:1147-1162).

    x1: (B, T, C) target mel; mask: (B, T); mu: aligned conditioning.
    t ~ U(0,1) per item; y_t = (1 - (1-sigma)t) z + t x1;
    u_t = x1 - (1-sigma) z; loss = sum (pred - u_t)^2 / (sum(mask) * C).
    Returns (loss, y_t, pred, u_t) like the reference.

    Noise, path, and target are fp32; with bf16 `compute_dtype` only the
    estimator pass runs bf16 (fp32 accumulation in its matmuls).
    """
    cd = jnp.dtype(compute_dtype)
    kt, kz = jax.random.split(key)
    b = mu.shape[0]
    x1 = x1.astype(jnp.float32)
    t = jax.random.uniform(kt, (b, 1, 1), jnp.float32)
    z = jax.random.normal(kz, x1.shape, jnp.float32)

    y_t = (1.0 - (1.0 - sigma_min) * t) * z + t * x1
    u_t = x1 - (1.0 - sigma_min) * z

    pred = estimator(y_t.astype(cd), mask.astype(cd), mu.astype(cd),
                     t[:, 0, 0].astype(cd)).astype(jnp.float32)
    # Parity note: the reference sums the UNMASKED squared error
    # (model.py:1158-1161).  The estimator zeroes `pred` at padded
    # positions but u_t there is -(1-sigma)*z (noise), so those positions
    # add a gradient-free noise floor to the loss value.  We reproduce the
    # exact expression; gradients are unaffected either way.
    loss = jnp.sum(jnp.square(pred - u_t)) / (jnp.sum(mask) * u_t.shape[-1])
    return loss, y_t, pred, u_t
