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


def test_gan_pair_step_data_parallel_matches_single_device():
    """DP over the mesh must be semantically invisible: one disc+gen pair
    step on a batch-8 bucket, single-device vs batch-sharded over the
    8-device CPU mesh, same updated parameters (the acoustic trainer's
    test_data_parallel_matches_single_device, for the GAN trainer)."""
    from matcha_tts_tpu.parallel import mesh as pmesh

    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    acfg = AudioConfig(n_mels=8, n_fft=256, win_length=256, hop_length=16,
                       f_max=4000.0)
    rng = np.random.default_rng(3)
    audio_np = (rng.standard_normal((8, 1024)).astype(np.float32) * 0.1)

    def pair(state, audio):
        state, d_loss = gan_disc_step(state, audio, hcfg, acfg)
        state, metrics = gan_gen_step(state, audio, hcfg, acfg)
        return state, d_loss, metrics

    state1 = create_gan_state(jax.random.PRNGKey(0), hcfg)
    state1, d1, m1 = pair(state1, jnp.asarray(audio_np))

    mesh = pmesh.make_mesh()
    stateN = create_gan_state(jax.random.PRNGKey(0), hcfg)
    stateN = pmesh.replicate(mesh, stateN)
    audioN = pmesh.shard_batch(mesh, audio_np)
    stateN, dN, mN = pair(stateN, audioN)

    assert np.allclose(float(d1), float(dN), rtol=1e-5)
    assert np.allclose(float(m1["gen_loss"]), float(mN["gen_loss"]),
                       rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.gen_params),
                    jax.tree.leaves(jax.device_get(stateN.gen_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(state1.disc_params),
                    jax.tree.leaves(jax.device_get(stateN.disc_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_weight_norm_round_trip_and_geometry():
    """decompose/fold are exact inverses; folding reproduces the generator
    bit-for-bit (the reference's remove_weight_norm contract,
    hifigan/models.py:199-206)."""
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.train import weight_norm as wn

    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    gen = hifigan.init_generator(jax.random.PRNGKey(0), hcfg)
    wn_gen = wn.decompose(gen)
    assert wn.is_weight_norm(wn_gen) and not wn.is_weight_norm(gen)
    back = wn.fold(wn_gen)
    for a, b in zip(jax.tree.leaves(gen), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 12, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hifigan.generator(back, mel, hcfg)),
        np.asarray(hifigan.generator(gen, mel, hcfg)), atol=1e-6)
    # per-out-channel norm of v equals g at init
    g0 = jax.tree.leaves(wn_gen)[0]
    assert np.isfinite(np.asarray(g0)).all()


def test_gan_steps_weight_norm_parameterization():
    """GAN steps with weight_norm=True optimize (v, g) and update both;
    the folded generator still vocodes."""
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.train import weight_norm as wn

    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    acfg = AudioConfig(n_mels=8, n_fft=256, win_length=256, hop_length=16,
                       f_max=4000.0)
    # seed fine-tuning from an existing plain generator
    gen0 = hifigan.init_generator(jax.random.PRNGKey(7), hcfg)
    state = create_gan_state(jax.random.PRNGKey(0), hcfg,
                             use_weight_norm=True, gen_params=gen0)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)

    state, d_loss = gan_disc_step(state, audio, hcfg, acfg, weight_norm=True)
    assert np.isfinite(float(d_loss))
    v_before = np.asarray(state.gen_params["conv_pre"]["v"])
    g_before = np.asarray(state.gen_params["conv_pre"]["g"])
    state, metrics = gan_gen_step(state, audio, hcfg, acfg, weight_norm=True)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert not np.allclose(v_before, np.asarray(state.gen_params["conv_pre"]["v"]))
    assert not np.allclose(g_before, np.asarray(state.gen_params["conv_pre"]["g"]))

    folded = wn.fold(state.gen_params)
    wav = hifigan.generator(folded, jnp.zeros((1, 8, 8)), hcfg)
    assert np.isfinite(np.asarray(wav)).all()
