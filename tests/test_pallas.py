"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.models import nn, unet
from matcha_tts_tpu.ops.pallas.block1d import block1d_fused, block1d_pallas_ok


def test_block1d_fused_matches_xla():
    rng = np.random.default_rng(0)
    b, t, c_in, c_out = 2, 16, 128, 128
    x = rng.standard_normal((b, t, c_in)).astype(np.float32)
    p = unet.init_block1d(jax.random.PRNGKey(0), c_in, c_out)
    mask = np.ones((b, t), np.float32)
    mask[1, 12:] = 0.0
    xm = x * mask[..., None]

    ref = np.asarray(unet.block1d(p, jnp.asarray(x), jnp.asarray(mask)))
    fused = block1d_fused(jnp.asarray(xm), p["conv"]["weight"],
                          p["conv"]["bias"], p["norm"]["gamma"],
                          p["norm"]["beta"], interpret=True)
    fused = np.asarray(fused) * mask[..., None]
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_block1d_shape_gate():
    assert block1d_pallas_ok(512, 256, 256)
    assert block1d_pallas_ok(256, 128, 256)
    assert not block1d_pallas_ok(511, 256, 256)
    assert not block1d_pallas_ok(512, 80, 256)
