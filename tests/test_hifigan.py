"""HiFi-GAN vocoder + denoiser tests (L4)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_mirror as tm
from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.models.denoiser import denoise, make_denoiser


def small_cfg():
    return HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=8,
    )


def test_generator_shape_and_parity():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 12, cfg.num_mels), dtype=np.float32)
    wav = np.asarray(hifigan.generator(p, jnp.asarray(mel), cfg))
    assert wav.shape == (2, 12 * 16)

    mel_t = torch.from_numpy(mel).permute(0, 2, 1)
    wav_t = tm.hifigan_generator(p, mel_t, cfg).squeeze(1).numpy()
    np.testing.assert_allclose(wav, wav_t, atol=1e-5)


def test_generator_v1_shape():
    """Full-size v1 config: x256 upsampling equals the hop length."""
    cfg = HiFiGANConfig()
    assert cfg.total_upsample == 256
    p = hifigan.init_generator(jax.random.PRNGKey(1), cfg)
    mel = jnp.zeros((1, 8, 80))
    wav = hifigan.generator(p, mel, cfg)
    assert wav.shape == (1, 8 * 256)


def test_denoiser_runs_and_reduces_bias():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(2), cfg)
    state = make_denoiser(p, cfg, filter_length=256, n_overlap=4, win_length=256)
    assert state.bias_spec.shape == (129, 1)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 4096), dtype=np.float32) * 0.1
    out = np.asarray(denoise(state, jnp.asarray(audio), strength=0.0005))
    assert out.shape[0] == 1 and abs(out.shape[1] - 4096) <= 256
    assert np.isfinite(out).all()
    # strength=0 must be a (near-)identity resynthesis
    out0 = np.asarray(denoise(state, jnp.asarray(audio), strength=0.0))
    n = min(out0.shape[1], 4096)
    np.testing.assert_allclose(out0[0, 64:n - 64], audio[0, 64:n - 64], atol=5e-3)


def test_gan_losses():
    r = [jnp.ones((2, 5)), jnp.ones((2, 3))]
    g = [jnp.zeros((2, 5)), jnp.zeros((2, 3))]
    loss, r_losses, g_losses = hifigan.discriminator_loss(r, g)
    assert float(loss) == 0.0
    gl, _ = hifigan.generator_loss(g)
    assert float(gl) == 2.0
    fl = hifigan.feature_loss([[jnp.ones((2, 4))]], [[jnp.zeros((2, 4))]])
    assert float(fl) == 2.0


def test_discriminators_run():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((1, 2200), dtype=np.float32))
    y_hat = jnp.asarray(rng.standard_normal((1, 2200), dtype=np.float32))
    mpd_p = hifigan.init_mpd(jax.random.PRNGKey(3))
    outs = hifigan.mpd(mpd_p, y, y_hat)
    assert len(outs[0]) == 5 and len(outs[2][0]) == 6
    msd_p = hifigan.init_msd(jax.random.PRNGKey(4))
    outs = hifigan.msd(msd_p, y, y_hat)
    assert len(outs[0]) == 3 and len(outs[2][0]) == 8


def test_mrf_dispatch_decision_table(monkeypatch):
    """auto picks Pallas kernels only on TPU and only for bf16; forced
    "packed" keeps the fp32 parity kernels available."""
    from matcha_tts_tpu.config import HiFiGANConfig
    from matcha_tts_tpu.models import hifigan

    auto = HiFiGANConfig()
    forced = HiFiGANConfig(mrf_kernel="packed")
    # CPU backend (tests run here): auto always falls back to XLA
    assert hifigan._mrf_fusable(auto, 196608, 32, jnp.bfloat16) == "xla"
    assert hifigan._mrf_fusable(forced, 196608, 32, jnp.float32) == "packed"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert hifigan._mrf_fusable(auto, 196608, 32, jnp.bfloat16) == "packed"
    assert hifigan._mrf_fusable(auto, 98304, 64, jnp.bfloat16) == "packed"
    assert hifigan._mrf_fusable(auto, 49152, 128, jnp.bfloat16) == "packed"
    # fp32 kernels are a HIGHEST-precision parity mode, 3.4x slower than
    # XLA at batch 32 -- auto must NOT select them
    assert hifigan._mrf_fusable(auto, 196608, 32, jnp.float32) == "xla"
    # unsupported widths / non-V1 configs stay on XLA
    assert hifigan._mrf_fusable(auto, 6144, 256, jnp.bfloat16) == "xla"
    rb2 = HiFiGANConfig(resblock="2")
    assert hifigan._mrf_fusable(rb2, 196608, 32, jnp.bfloat16) == "xla"
