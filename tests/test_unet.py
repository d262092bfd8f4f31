"""Decoder/U-Net parity tests vs the torch mirror (fp32, eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_mirror as tm
from matcha_tts_tpu.config import DecoderConfig
from matcha_tts_tpu.models import nn, unet
from matcha_tts_tpu.ops.masking import sequence_mask

ATOL = 3e-5


def to_bct(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 2, 1).contiguous()


def test_snake_beta_parity():
    rng = np.random.default_rng(0)
    p = unet.init_snake_beta(jax.random.PRNGKey(0), 16, 32)
    p["alpha"] = jnp.asarray(rng.standard_normal(32, dtype=np.float32) * 0.1)
    p["beta"] = jnp.asarray(rng.standard_normal(32, dtype=np.float32) * 0.1)
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    ours = np.asarray(unet.snake_beta(p, jnp.asarray(x)))
    theirs = tm.snake_beta(p, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_transformer_block_parity():
    rng = np.random.default_rng(1)
    dim, heads, dim_head = 32, 2, 16
    p = unet.init_transformer_block(jax.random.PRNGKey(1), dim, heads, dim_head)
    x = rng.standard_normal((2, 9, dim), dtype=np.float32)
    mask = np.ones((2, 9), np.float32)
    mask[1, 6:] = 0
    ours = np.asarray(unet.transformer_block(p, jnp.asarray(x), jnp.asarray(mask),
                                             heads=heads, dim_head=dim_head))
    theirs = tm.transformer_block(p, torch.from_numpy(x), torch.from_numpy(mask),
                                  heads, dim_head).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_sinusoidal_and_timestep_embedding_parity():
    t = np.array([0.0, 0.25, 0.999], np.float32)
    ours = np.asarray(unet.sinusoidal_pos_emb(jnp.asarray(t), 160))
    theirs = tm.sinusoidal_pos_emb(torch.from_numpy(t), 160).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    p = unet.init_timestep_embedding(jax.random.PRNGKey(2), 160, 64)
    ours2 = np.asarray(unet.timestep_embedding(p, jnp.asarray(ours)))
    theirs2 = tm.timestep_embedding(p, torch.from_numpy(theirs)).numpy()
    np.testing.assert_allclose(ours2, theirs2, atol=ATOL)


def test_resnet_block_parity():
    rng = np.random.default_rng(2)
    p = unet.init_resnet_block1d(jax.random.PRNGKey(3), 24, 32, 48)
    x = rng.standard_normal((2, 8, 24), dtype=np.float32)
    t_emb = rng.standard_normal((2, 48), dtype=np.float32)
    mask = np.asarray(sequence_mask(np.array([8, 5]), 8)).astype(np.float32)
    ours = np.asarray(unet.resnet_block1d(p, jnp.asarray(x), jnp.asarray(mask),
                                          jnp.asarray(t_emb)))
    theirs = tm.resnet_block1d(p, to_bct(x), torch.from_numpy(mask).unsqueeze(1),
                               torch.from_numpy(t_emb)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv_transpose_matches_torch():
    """ConvTranspose1d(k=4, s=2, p=1) parity (model.py:808)."""
    rng = np.random.default_rng(3)
    p = nn.init_conv_transpose1d(jax.random.PRNGKey(4), 8, 8, 4)
    x = rng.standard_normal((2, 10, 8), dtype=np.float32)
    ours = np.asarray(nn.conv_transpose1d(p, jnp.asarray(x), stride=2, padding=1))
    theirs = tm.conv_transpose1d(p, to_bct(x), stride=2, padding=1).permute(0, 2, 1).numpy()
    assert ours.shape == (2, 20, 8)
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_full_unet_decoder_parity():
    cfg = DecoderConfig(channels=(32, 32), attention_head_dim=16, num_heads=2,
                        n_blocks=1, num_mid_blocks=2, dropout=0.0)
    n_feats = 12
    p = unet.init_decoder(jax.random.PRNGKey(5), 2 * n_feats, n_feats, cfg)
    rng = np.random.default_rng(4)
    b, t = 2, 16  # multiple of 4
    x = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    mu = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    tt = np.array([0.3, 0.8], np.float32)
    mask = np.asarray(sequence_mask(np.array([16, 11]), t)).astype(np.float32)

    ours = np.asarray(unet.decoder(p, jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(mu), jnp.asarray(tt), cfg))
    theirs = tm.unet_decoder(p, to_bct(x), torch.from_numpy(mask).unsqueeze(1),
                             to_bct(mu), torch.from_numpy(tt),
                             cfg.num_heads, cfg.attention_head_dim)
    theirs = theirs.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_unet_static_shape_invariance():
    """Output at valid positions must not depend on values in padded tokens
    of mu/x (masked out), though GroupNorm sees pad length — same as ref."""
    cfg = DecoderConfig(channels=(16, 16), attention_head_dim=8, num_heads=2,
                        n_blocks=1, num_mid_blocks=1, dropout=0.0)
    n_feats = 8
    p = unet.init_decoder(jax.random.PRNGKey(6), 2 * n_feats, n_feats, cfg)
    rng = np.random.default_rng(5)
    b, t = 1, 12
    x = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    mu = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    mask = np.asarray(sequence_mask(np.array([8]), t)).astype(np.float32)
    tt = np.array([0.5], np.float32)

    out1 = np.asarray(unet.decoder(p, jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(mu), jnp.asarray(tt), cfg))
    x2, mu2 = x.copy(), mu.copy()
    x2[:, 8:] = 99.0
    mu2[:, 8:] = -77.0
    out2 = np.asarray(unet.decoder(p, jnp.asarray(x2), jnp.asarray(mask),
                                   jnp.asarray(mu2), jnp.asarray(tt), cfg))
    np.testing.assert_allclose(out1, out2, atol=1e-5)
    # padded outputs are exactly zero
    assert np.abs(out1[:, 8:]).max() == 0.0


def test_snake_fused_vjp_matches_autodiff():
    """snake_impl="fused_vjp" (identity rewrite + hand VJP) must equal the
    autodiff path in value AND in every gradient (input, log-alpha,
    log-beta) — it is the same math up to fp rounding."""
    import jax

    from matcha_tts_tpu.models import unet

    params = unet.init_snake_beta(jax.random.PRNGKey(0), 16, 32)
    # move alpha/beta off the zero init so their grads are non-trivial
    params["alpha"] = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (32,))
    params["beta"] = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (32,))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 16))

    y0 = unet.snake_beta(params, x)
    y1 = unet.snake_beta(params, x, impl="fused_vjp")
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-6, rtol=1e-6)

    def loss(p, x, impl):
        return jnp.sum(jnp.sin(unet.snake_beta(p, x, impl=impl)))

    g0 = jax.grad(loss, argnums=(0, 1))(params, x, "xla")
    g1 = jax.grad(loss, argnums=(0, 1))(params, x, "fused_vjp")
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_decoder_snake_impl_invariance():
    """The full U-Net gives the same output under both snake impls."""
    import dataclasses

    cfg = DecoderConfig(channels=(16, 16), attention_head_dim=8, num_heads=2,
                        n_blocks=1, num_mid_blocks=1, dropout=0.0)
    n_feats = 8
    p = unet.init_decoder(jax.random.PRNGKey(6), 2 * n_feats, n_feats, cfg)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 12, n_feats), dtype=np.float32)
    mu = rng.standard_normal((1, 12, n_feats), dtype=np.float32)
    mask = np.asarray(sequence_mask(np.array([12]), 12)).astype(np.float32)
    tt = np.array([0.5], np.float32)
    out1 = np.asarray(unet.decoder(p, jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(mu), jnp.asarray(tt), cfg))
    cfg2 = dataclasses.replace(cfg, snake_impl="fused_vjp")
    out2 = np.asarray(unet.decoder(p, jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(mu), jnp.asarray(tt), cfg2))
    np.testing.assert_allclose(out1, out2, atol=1e-5, rtol=1e-5)
