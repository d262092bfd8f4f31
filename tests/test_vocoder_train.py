"""HiFi-GAN GAN fine-tuning step tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import AudioConfig, HiFiGANConfig
from matcha_tts_tpu.train.vocoder import (
    create_gan_state,
    gan_disc_step,
    gan_gen_step,
    random_segment,
)


def test_random_segment():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(10000).astype(np.float32)
    seg, start = random_segment(jax.random.PRNGKey(0), audio, 4096, 256)
    assert seg.shape == (4096,)
    assert start % 256 == 0
    np.testing.assert_array_equal(seg, audio[start:start + 4096])
    # short audio is zero-padded
    seg2, s2 = random_segment(jax.random.PRNGKey(0), audio[:1000], 4096, 256)
    assert seg2.shape == (4096,) and s2 == 0 and (seg2[1000:] == 0).all()


def test_gan_steps_run_and_update():
    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    acfg = AudioConfig(n_mels=8, n_fft=256, win_length=256, hop_length=16,
                       f_max=4000.0)
    assert hcfg.total_upsample == acfg.hop_length
    state = create_gan_state(jax.random.PRNGKey(0), hcfg)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)

    state, d_loss = gan_disc_step(state, audio, hcfg, acfg)
    assert np.isfinite(float(d_loss))
    before = jax.tree.leaves(state.gen_params)[0]
    state, metrics = gan_gen_step(state, audio, hcfg, acfg)
    after = jax.tree.leaves(state.gen_params)[0]
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["mel_l1"]))
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert int(state.step) == 1
