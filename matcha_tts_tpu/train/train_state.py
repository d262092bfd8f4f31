"""Optimizer + train step (reference: train_standalone.py:669-707).

Adam(lr) with global-norm gradient clipping 5.0 (Lightning's
`gradient_clip_val=5.0` default algorithm is norm clipping,
train_standalone.py:869).  The step is one jitted function; under a
data-parallel mesh sharding XLA inserts the psum gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from matcha_tts_tpu.config import MatchaConfig, TrainConfig
from matcha_tts_tpu.train.losses import matcha_losses


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adam(cfg.learning_rate),
    )


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def loss_fn(params, key, batch, model_cfg: MatchaConfig, prior_loss: bool,
            compute_dtype: str = "float32"):
    out = matcha_losses(
        params, key,
        batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
        model_cfg, spks=batch.get("spks"), train=True,
        prior_loss_enabled=prior_loss, compute_dtype=compute_dtype,
    )
    return out.total, out


@functools.partial(jax.jit,
                   static_argnames=("model_cfg", "mixed_precision",
                                    "prior_loss"),
                   donate_argnames=("state",))
def _train_step_impl(state: TrainState, key, batch, lr, grad_clip_norm,
                     model_cfg: MatchaConfig, mixed_precision: bool,
                     prior_loss: bool):
    key = jax.random.fold_in(key, state.step)
    # bf16 compute with fp32 master weights = the reference's "16-mixed"
    # (train_standalone.py:764,868); bf16 needs no loss scaling
    cd = "bfloat16" if mixed_precision else "float32"
    grads, out = jax.grad(loss_fn, has_aux=True)(
        state.params, key, batch, model_cfg, prior_loss, cd
    )
    # lr / clip norm are traced operands (same opt-state structure as
    # make_optimizer), so hyperparameter changes reuse the compile
    tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm),
                     optax.adam(lr))
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": out.total,
        "dur_loss": out.dur_loss,
        "prior_loss": out.prior_loss,
        "cfm_loss": out.cfm_loss,
        "grad_norm": optax.global_norm(grads),
    }
    return TrainState(state.step + 1, new_params, new_opt), metrics


def train_step(state: TrainState, key, batch, model_cfg: MatchaConfig,
               train_cfg: TrainConfig):
    """One optimizer step; returns (new_state, metrics dict).

    The jit compile key covers only what changes the GRAPH
    (model_cfg, mixed_precision, prior_loss); learning rate and clip
    norm enter as traced scalars.  On this hardware a train-step compile
    costs tens of minutes through the remote compile helper, so host-side
    knobs (log cadence, checkpoint cadence, lr sweeps) must never force
    a recompile.
    """
    return _train_step_impl(
        state, key, batch,
        jnp.asarray(train_cfg.learning_rate, jnp.float32),
        jnp.asarray(train_cfg.grad_clip_norm, jnp.float32),
        model_cfg, train_cfg.mixed_precision, train_cfg.prior_loss)


@functools.partial(jax.jit, static_argnames=("model_cfg", "prior_loss"))
def eval_step(params, key, batch, model_cfg: MatchaConfig, prior_loss: bool = True):
    out = matcha_losses(
        params, key,
        batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
        model_cfg, spks=batch.get("spks"), train=False,
        prior_loss_enabled=prior_loss,
    )
    return {
        "loss": out.total,
        "dur_loss": out.dur_loss,
        "prior_loss": out.prior_loss,
        "cfm_loss": out.cfm_loss,
    }
