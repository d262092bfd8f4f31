"""VMEM-resident attention kernel (ops/pallas/attn_vmem.py) parity.

The kernel must match the XLA einsum path at EVERY position — padded
query rows included (they get a uniform softmax over valid keys, which
downstream GroupNorm statistics can observe) — unlike the flash wrapper
whose padded rows are junk-but-masked-later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.ops.pallas.attn_vmem import attn_vmem_ok, vmem_mha

HEADS, DIM_HEAD = 2, 64


def _xla_attn(q, k, v, key_mask, scale):
    sim = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    neg = jnp.finfo(sim.dtype).min
    sim = jnp.where(key_mask[:, None, None, :] == 0, neg, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    b, t = q.shape[0], q.shape[1]
    return jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, t, -1)


def test_vmem_mha_matches_xla_everywhere():
    rng = np.random.default_rng(0)
    scale = DIM_HEAD ** -0.5
    for b, t in ((2, 128), (3, 512), (1, 1024)):
        assert attn_vmem_ok(t, DIM_HEAD)
        q = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)),
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)),
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)),
                        jnp.float32)
        lengths = rng.integers(1, t + 1, size=(b,))
        lengths[0] = t  # one full row
        mask = jnp.asarray(
            (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32))
        ref = np.asarray(_xla_attn(q, k, v, mask, scale))
        out = np.asarray(vmem_mha(q, k, v, mask, sm_scale=scale))
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_vmem_mha_in_transformer_block():
    """attention(impl='vmem') == attention(impl='xla') through the real
    U-Net block (pre-norm residual wiring)."""
    from matcha_tts_tpu.models.unet import init_transformer_block, transformer_block

    key = jax.random.PRNGKey(0)
    p = init_transformer_block(key, 256, HEADS, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256), jnp.float32)
    lengths = np.array([200, 256])
    mask = jnp.asarray(
        (np.arange(256)[None, :] < lengths[:, None]).astype(np.float32))
    a = transformer_block(p, x, mask, heads=HEADS, dim_head=128,
                          attn_impl="xla")
    b = transformer_block(p, x, mask, heads=HEADS, dim_head=128,
                          attn_impl="vmem")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_attn_vmem_gate():
    assert not attn_vmem_ok(130, 64)      # not a multiple of 8
    assert not attn_vmem_ok(512, 96)      # head dim not a lane multiple
    assert not attn_vmem_ok(8192, 64)     # scores exceed the VMEM budget
    assert attn_vmem_ok(2048, 64)         # row-tiled large T still fits
