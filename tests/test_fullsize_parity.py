"""Full-LJSpeech-config fp32 parity vs the torch mirror.

The component parity tests elsewhere run at toy widths; dimension-dependent
bugs (RoPE half-split at head-dim 96, GroupNorm at 256 channels, the
512-channel V1 generator) would escape them.  These tests run the complete
default config (reference hyperparameters at main.py:63-79 /
hifigan/config.py:1-28) with shared weights through both stacks:

* text encoder: 192 ch, 768 filter, 2 heads (head-dim 96), 6 layers
  (model.py:452-535)
* CFM U-Net: channels (256, 256), 2x64 attention, 2 mid blocks
  (model.py:834-1048)
* HiFi-GAN V1 generator: 512 -> x256 upsampling (hifigan/models.py:148-197)
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_mirror as tm
from matcha_tts_tpu.config import (DecoderConfig, DurationPredictorConfig,
                                   EncoderConfig, HiFiGANConfig)
from matcha_tts_tpu.models import hifigan, unet
from matcha_tts_tpu.models.text_encoder import init_text_encoder, text_encoder
from matcha_tts_tpu.ops.masking import sequence_mask


def to_bct(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 2, 1).contiguous()


def test_fullsize_text_encoder_parity():
    enc = EncoderConfig(p_dropout=0.0)  # full size: 192/768/2 heads/6 layers
    dp = DurationPredictorConfig(p_dropout=0.0)  # 256 filter
    assert enc.n_channels == 192 and enc.n_layers == 6
    p = init_text_encoder(jax.random.PRNGKey(0), 178, enc, dp)
    rng = np.random.default_rng(0)
    b, t = 2, 64
    ids = rng.integers(0, 178, size=(b, t)).astype(np.int32)
    lengths = np.array([t, t - 17], dtype=np.int32)

    mu, logw, x_mask = text_encoder(p, jnp.asarray(ids), jnp.asarray(lengths),
                                    enc, dp)
    mu_t, logw_t = tm.text_encoder(
        p, torch.from_numpy(ids).long(),
        torch.from_numpy(np.asarray(x_mask)).unsqueeze(1),
        enc.n_channels, enc.n_heads, enc.kernel_size)
    np.testing.assert_allclose(np.asarray(mu), mu_t.permute(0, 2, 1).numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(logw),
                               logw_t.permute(0, 2, 1).numpy(), atol=5e-4)


def test_fullsize_unet_decoder_parity():
    cfg = DecoderConfig(dropout=0.0)  # full size: (256, 256), 2x64 attn
    assert cfg.channels == (256, 256) and cfg.attention_head_dim == 64
    n_feats = 80
    p = unet.init_decoder(jax.random.PRNGKey(1), 2 * n_feats, n_feats, cfg)
    rng = np.random.default_rng(1)
    b, t = 1, 64  # multiple of 2**num_downsamples
    x = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    mu = rng.standard_normal((b, t, n_feats), dtype=np.float32)
    tt = np.array([0.37], np.float32)
    mask = np.asarray(sequence_mask(np.array([51]), t)).astype(np.float32)

    ours = np.asarray(unet.decoder(p, jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(mu), jnp.asarray(tt), cfg))
    theirs = tm.unet_decoder(p, to_bct(x), torch.from_numpy(mask).unsqueeze(1),
                             to_bct(mu), torch.from_numpy(tt),
                             cfg.num_heads, cfg.attention_head_dim)
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 1).numpy(),
                               atol=1e-3)


def test_fullsize_hifigan_generator_parity():
    cfg = HiFiGANConfig()  # full V1: 512 initial, rates (8,8,2,2), 80 mels
    assert cfg.upsample_initial_channel == 512 and cfg.num_mels == 80
    p = hifigan.init_generator(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 16, 80), dtype=np.float32)

    ours = np.asarray(hifigan.generator(p, jnp.asarray(mel), cfg))
    theirs = tm.hifigan_generator(p, to_bct(mel), cfg)[:, 0].numpy()
    assert ours.shape == (1, 16 * 256)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
