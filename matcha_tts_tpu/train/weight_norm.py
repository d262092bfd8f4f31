"""Weight-norm parameterization for HiFi-GAN fine-tuning.

The reference (and upstream jik876/hifi-gan) trains every conv under
`torch.nn.utils.weight_norm` — w = g * v / ||v|| with the norm taken per
output channel (hifigan/models.py:17-44,152-171) — and folds it for
inference (`remove_weight_norm`, hifigan/models.py:199-206).  Folding is
what our converter does; this module restores the *training geometry* so
long fine-tunes optimize (v, g) like the reference rather than raw w.

Functional, tree-level design: parameters live as plain nested dicts;
`decompose` rewrites every conv weight leaf into {"v", "g"} and `fold`
maps back.  Training steps fold inside the loss function, so gradients
flow through the reparameterization while every forward keeps using the
stock fused conv path — no second model implementation.

Norm convention: all dims except the last (output channels) — equivalent
to torch's default dim=0 on (O, I, W) given our (W, I, O) / (H, W, I, O)
layouts.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 0.0  # torch.norm has no eps; keep exact


def _norm_per_out(w: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(w.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(w), axis=axes, keepdims=True) + _EPS)


def decompose(tree):
    """Plain param tree -> weight-norm tree: each {"weight": w, ...} leaf
    dict becomes {"v": w, "g": ||w||_per_out, ...}.  Exact round trip with
    `fold` (g is initialized to the norm, so v/||v||*g == w)."""
    if isinstance(tree, dict):
        if "weight" in tree and getattr(tree["weight"], "ndim", 0) >= 2:
            out = {k: v for k, v in tree.items() if k != "weight"}
            w = tree["weight"]
            out["v"] = w
            out["g"] = _norm_per_out(w)
            return out
        return {k: decompose(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(decompose(v) for v in tree)
    return tree


def fold(tree):
    """Weight-norm tree -> plain tree: {"v", "g"} -> weight = g * v/||v||.
    Differentiable; called inside loss functions for training parity with
    the reference's weight_norm geometry."""
    if isinstance(tree, dict):
        if "v" in tree and "g" in tree:
            out = {k: val for k, val in tree.items() if k not in ("v", "g")}
            v, g = tree["v"], tree["g"]
            out["weight"] = g * v / _norm_per_out(v)
            return out
        return {k: fold(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(fold(v) for v in tree)
    return tree


def is_weight_norm(tree) -> bool:
    """True if any conv leaf is in (v, g) form."""
    if isinstance(tree, dict):
        if "v" in tree and "g" in tree:
            return True
        return any(is_weight_norm(v) for v in tree.values())
    if isinstance(tree, (list, tuple)):
        return any(is_weight_norm(v) for v in tree)
    return False
