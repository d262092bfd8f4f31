"""Encoder-side parity tests: JAX (B, T, C) implementation vs torch mirror
of the reference math (fp32, eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_mirror as tm
from matcha_tts_tpu.config import DurationPredictorConfig, EncoderConfig
from matcha_tts_tpu.models import layers, nn
from matcha_tts_tpu.models.text_encoder import init_text_encoder, text_encoder
from matcha_tts_tpu.ops.masking import sequence_mask

ATOL = 2e-5


def rand_mask(rng, b, t):
    lengths = rng.integers(3, t + 1, size=b)
    lengths[0] = t
    return np.asarray(sequence_mask(lengths, t)).astype(np.float32), lengths


def to_torch_bct(x_btc):
    return torch.from_numpy(np.asarray(x_btc)).permute(0, 2, 1).contiguous()


def test_channel_layer_norm_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 16), dtype=np.float32)
    p = nn.init_norm(16)
    p = {"gamma": p["gamma"] * 1.3 + 0.1, "beta": p["beta"] + 0.05}
    ours = np.asarray(nn.channel_layer_norm(p, jnp.asarray(x)))
    theirs = tm.channel_layer_norm(p, to_torch_bct(x)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv_relu_norm_parity():
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    x = rng.standard_normal((2, 11, 24), dtype=np.float32)
    mask, _ = rand_mask(rng, 2, 11)
    p = layers.init_conv_relu_norm(key, 24, 24, 24)
    # zero-init proj would make the test trivial; randomize it
    p["proj"] = nn.init_conv1d(jax.random.PRNGKey(7), 24, 24, 1)
    ours = np.asarray(layers.conv_relu_norm(p, jnp.asarray(x), jnp.asarray(mask), rng=None))
    theirs = tm.conv_relu_norm(
        p, to_torch_bct(x), torch.from_numpy(mask).unsqueeze(1)
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_duration_predictor_parity():
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(1)
    x = rng.standard_normal((3, 13, 32), dtype=np.float32)
    mask, _ = rand_mask(rng, 3, 13)
    p = layers.init_duration_predictor(key, 32, 48)
    ours = np.asarray(layers.duration_predictor(p, jnp.asarray(x), jnp.asarray(mask), rng=None))
    theirs = tm.duration_predictor(
        p, to_torch_bct(x), torch.from_numpy(mask).unsqueeze(1)
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_rope_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 2, 9, 48), dtype=np.float32)  # (B,H,T,Dh)
    d = int(48 * 0.5)
    cos, sin = layers.rope_tables(9, d)
    ours = np.asarray(layers.apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin), d))
    theirs = tm.rope(torch.from_numpy(x), d).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_mha_parity():
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(2)
    b, t, c, h = 2, 10, 64, 2
    x = rng.standard_normal((b, t, c), dtype=np.float32)
    mask, _ = rand_mask(rng, b, t)
    p = layers.init_mha(key, c, c, h)
    attn_mask = mask[:, :, None] * mask[:, None, :]
    ours = np.asarray(layers.mha(p, jnp.asarray(x), jnp.asarray(attn_mask), n_heads=h, rng=None))
    am = torch.from_numpy(attn_mask).unsqueeze(1)
    theirs = tm.mha(p, to_torch_bct(x), am, h).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_encoder_stack_parity():
    rng = np.random.default_rng(5)
    key = jax.random.PRNGKey(3)
    b, t, c = 2, 12, 64
    x = rng.standard_normal((b, t, c), dtype=np.float32)
    mask, _ = rand_mask(rng, b, t)
    p = layers.init_encoder(key, c, 128, 2, 3, 3)
    ours = np.asarray(layers.encoder(p, jnp.asarray(x), jnp.asarray(mask),
                                     n_heads=2, kernel_size=3, rng=None))
    theirs = tm.encoder(p, to_torch_bct(x), torch.from_numpy(mask).unsqueeze(1),
                        2, 3).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_text_encoder_parity():
    rng = np.random.default_rng(6)
    key = jax.random.PRNGKey(4)
    enc = EncoderConfig(n_feats=20, n_channels=64, filter_channels=128,
                        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0)
    dp = DurationPredictorConfig(filter_channels_dp=48)
    p = init_text_encoder(key, 50, enc, dp)
    b, t = 2, 15
    ids = rng.integers(0, 50, size=(b, t)).astype(np.int32)
    lengths = np.array([t, t - 4], dtype=np.int32)
    mu, logw, x_mask = text_encoder(p, jnp.asarray(ids), jnp.asarray(lengths), enc, dp)
    mask_np = np.asarray(x_mask)
    mu_t, logw_t = tm.text_encoder(p, torch.from_numpy(ids).long(),
                                   torch.from_numpy(mask_np).unsqueeze(1),
                                   enc.n_channels, enc.n_heads, enc.kernel_size)
    np.testing.assert_allclose(np.asarray(mu), mu_t.permute(0, 2, 1).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logw), logw_t.permute(0, 2, 1).numpy(), atol=1e-4)


def test_torch_default_inits_match():
    """Statistical check: our kaiming-uniform matches torch Conv1d defaults."""
    key = jax.random.PRNGKey(11)
    p = nn.init_conv1d(key, 192, 192, 5)
    w = np.asarray(p["weight"])
    bound = 1.0 / np.sqrt(192 * 5)
    assert np.abs(w).max() <= bound
    assert w.std() > bound / 2.5  # uniform std = bound/sqrt(3)
    ref = torch.nn.Conv1d(192, 192, 5)
    assert abs(w.std() - ref.weight.detach().numpy().std()) < 0.003
