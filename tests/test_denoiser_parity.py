"""Denoiser end-to-end parity vs a torch re-statement of
hifigan/denoiser.py semantics (bias spectrum from a zero-mel vocoder pass,
STFT subtract, iSTFT with original phase)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.models.denoiser import denoise, make_denoiser


def torch_denoise(bias_spec_np, audio_np, strength, filter_length=1024,
                  n_overlap=4, win_length=1024):
    hop = filter_length // n_overlap
    win = torch.hann_window(win_length)
    audio = torch.from_numpy(audio_np)
    spec = torch.stft(audio, filter_length, hop_length=hop,
                      win_length=win_length, window=win, return_complex=True)
    mag, ang = spec.abs(), spec.angle()
    mag = torch.clamp(mag - torch.from_numpy(bias_spec_np) * strength, 0.0)
    return torch.istft(torch.polar(mag, ang), filter_length, hop_length=hop,
                       win_length=win_length, window=win).numpy()


def test_denoiser_matches_torch_pipeline():
    cfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    p = hifigan.init_generator(jax.random.PRNGKey(0), cfg)
    state = make_denoiser(p, cfg)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, 8192)).astype(np.float32) * 0.2)

    ours = np.asarray(denoise(state, jnp.asarray(audio), strength=0.01))[0]
    theirs = torch_denoise(np.asarray(state.bias_spec), audio[0], 0.01)
    n = min(len(ours), len(theirs))
    np.testing.assert_allclose(ours[:n], theirs[:n], atol=5e-3)


def test_denoiser_reduces_bias_energy():
    """Feeding the vocoder's own zero-mel output through the denoiser at
    high strength must reduce its energy (it IS the bias)."""
    cfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    p = hifigan.init_generator(jax.random.PRNGKey(1), cfg)
    state = make_denoiser(p, cfg)
    bias_audio = hifigan.generator(p, jnp.zeros((1, 88, 8)), cfg)
    out = np.asarray(denoise(state, bias_audio, strength=1.0))
    n = min(out.shape[1], bias_audio.shape[1])
    e_in = float(jnp.sum(jnp.square(bias_audio[0, :n])))
    e_out = float(np.sum(np.square(out[0, :n])))
    assert e_out < e_in * 0.8
