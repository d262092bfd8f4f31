"""Fused ResnetBlock1D kernel (ops/pallas/resnet1d.py) parity.

Forward must match the XLA composition in models/unet.py exactly
(fp32, HIGHEST-precision dots); gradients come from the rematerializing
VJP and must match jax.grad of the XLA composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.models import unet
from matcha_tts_tpu.ops.pallas.resnet1d import (
    resnet1d_fused,
    resnet1d_fused_vjp,
    resnet1d_pallas_ok,
)


def _inputs(b=2, t=128, c_in=256, c_out=256, time_dim=64, seed=0):
    key = jax.random.PRNGKey(seed)
    params = unet.init_resnet_block1d(key, c_in, c_out, time_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, c_in), jnp.float32)
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (b, time_dim),
                              jnp.float32)
    lengths = np.linspace(t // 2, t, b).astype(np.int64)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32))
    return params, x, mask, t_emb


def _fused(params, x, mask, t_emb, vjp=False):
    from matcha_tts_tpu.models import nn

    temb_row = nn.linear(params["mlp"], nn.mish(t_emb)).astype(x.dtype)
    fn = resnet1d_fused_vjp if vjp else resnet1d_fused
    return fn(x * mask[..., None].astype(x.dtype), mask, temb_row,
              params["block1"], params["block2"],
              params["res_conv"]["weight"][0], params["res_conv"]["bias"])


def test_resnet1d_fused_matches_xla():
    for b, t, c_in, c_out in ((2, 128, 256, 256), (1, 256, 512, 256),
                              (3, 64, 128, 128)):
        assert resnet1d_pallas_ok(t, c_in, c_out)
        params, x, mask, t_emb = _inputs(b, t, c_in, c_out)
        with jax.default_matmul_precision("highest"):
            ref = unet.resnet_block1d(params, x, mask, t_emb)
            out = _fused(params, x, mask, t_emb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_resnet1d_fused_bf16():
    params, x, mask, t_emb = _inputs(2, 128, 256, 256)
    ref = unet.resnet_block1d(params, x, mask, t_emb)
    out = _fused(jax.tree.map(lambda a: a, params),
                 x.astype(jnp.bfloat16), mask, t_emb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.15, rtol=0.05)


def test_resnet1d_vjp_matches_xla_grad():
    params, x, mask, t_emb = _inputs(2, 64, 128, 128)

    def loss_ref(p, xx):
        return jnp.sum(jnp.square(unet.resnet_block1d(p, xx, mask, t_emb)))

    def loss_fused(p, xx):
        return jnp.sum(jnp.square(_fused(p, xx, mask, t_emb, vjp=True)))

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_f, _ = jax.tree.flatten(g_fused)
    assert len(flat_r) == len(flat_f)
    for r, f in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   atol=5e-4, rtol=1e-4)


def test_resnet1d_in_decoder_auto_dispatch():
    """resnet_block1d(use_pallas=True) == (use_pallas=False) on CPU
    (interpret), covering the c_in=2*c_out up-path shape."""
    params, x, mask, t_emb = _inputs(2, 64, 256, 128)
    with jax.default_matmul_precision("highest"):
        a = unet.resnet_block1d(params, x, mask, t_emb, use_pallas=False)
        b = unet.resnet_block1d(params, x, mask, t_emb, use_pallas=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_resnet1d_gate():
    assert not resnet1d_pallas_ok(127, 256, 256)   # T not 8-aligned
    assert not resnet1d_pallas_ok(128, 160, 256)   # first-level c_in=160
    assert resnet1d_pallas_ok(768, 512, 256)       # up path, full res
    assert resnet1d_pallas_ok(2048, 256, 256)      # largest batch bucket
