"""Vocos vocoder family: parity vs the torch oracle, shape contract,
GAN trainability, and Synthesizer integration (beyond-parity — the
reference ships only HiFi-GAN, hifigan/models.py:14-206)."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MatchaConfig,
    VocosConfig,
)
from matcha_tts_tpu.models import vocos
from matcha_tts_tpu.models.matcha import init_matcha
from matcha_tts_tpu.models.vocoder import generate as vocoder_generate
from matcha_tts_tpu.models.vocoder import init_vocoder

TINY = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                   n_fft=64, hop_length=16)


def test_vocos_parity_vs_torch_oracle():
    """Full forward (backbone + iSTFT head) matches an independent torch
    restatement that uses torch.istft — validating the model math AND our
    reshape-OLA iSTFT + last-frame replication in one shot."""
    import torch

    from tests import torch_mirror as tm

    params = vocos.init_vocos(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 20, TINY.num_mels)).astype(np.float32)

    ours = np.asarray(vocos.generate(params, jnp.asarray(mel), TINY))
    with torch.no_grad():
        ref = tm.vocos_generate(
            jax.tree.map(np.asarray, params),
            torch.from_numpy(mel.transpose(0, 2, 1)), TINY).numpy()
    assert ours.shape == ref.shape == (2, 20 * TINY.hop_length)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_vocos_shape_contract_and_finite():
    params = vocos.init_vocos(jax.random.PRNGKey(1), TINY)
    for t in (12, 33):
        mel = jnp.asarray(np.random.default_rng(t).standard_normal(
            (1, t, TINY.num_mels)), jnp.float32)
        wav = jax.jit(vocos.generate, static_argnums=2)(params, mel, TINY)
        assert wav.shape == (1, t * TINY.hop_length)
        assert np.isfinite(np.asarray(wav)).all()


def test_vocos_bf16_runs():
    params = vocos.init_vocos(jax.random.PRNGKey(2), TINY)
    mel = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 16, TINY.num_mels)), jnp.bfloat16)
    wav = vocos.generate(params, mel, TINY)
    assert wav.dtype == jnp.float32  # iSTFT head always runs fp32
    assert np.isfinite(np.asarray(wav)).all()


def test_vocoder_dispatch_matches_family():
    params = init_vocoder(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 10, TINY.num_mels)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(vocoder_generate(params, mel, TINY)),
        np.asarray(vocos.generate(params, mel, TINY)))


def test_vocos_gan_steps_run_and_update():
    """The family drops into the existing MPD/MSD GAN trainer."""
    from matcha_tts_tpu.train.vocoder import (create_gan_state,
                                              gan_disc_step, gan_gen_step)

    vcfg = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=256, hop_length=16)
    acfg = AudioConfig(n_mels=8, n_fft=256, win_length=256, hop_length=16,
                       f_max=4000.0)
    assert vcfg.total_upsample == acfg.hop_length
    state = create_gan_state(jax.random.PRNGKey(0), vcfg)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)

    state, d_loss = gan_disc_step(state, audio, vcfg, acfg)
    assert np.isfinite(float(d_loss))
    before = jax.tree.leaves(state.gen_params)[0]
    state, metrics = gan_gen_step(state, audio, vcfg, acfg)
    after = jax.tree.leaves(state.gen_params)[0]
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["mel_l1"]))
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_mrd_shapes_and_fmaps():
    """Each MRD sub-discriminator produces logits + 6 feature maps from its
    own STFT resolution of raw audio."""
    params = vocos.init_mrd(jax.random.PRNGKey(0))
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4096)).astype(np.float32))
    outs_r, outs_g, fmaps_r, fmaps_g = vocos.mrd(params, audio, audio * 0.5)
    assert len(outs_r) == len(vocos.MRD_RESOLUTIONS) == 3
    for lr, fr in zip(outs_r, fmaps_r):
        assert lr.ndim == 2 and lr.shape[0] == 2
        assert len(fr) == 6  # 5 conv stages + post
        assert all(np.isfinite(np.asarray(f)).all() for f in fr)
    # real and fake go through the same weights: identical inputs agree
    same = vocos.mrd(params, audio, audio)
    for lr, lg in zip(same[0], same[1]):
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(lg))


def test_vocos_gan_with_mrd_recipe():
    """The paper pairing: create_gan_state(discriminators=("mpd", "mrd"))
    trains both the generator and every MRD parameter."""
    from matcha_tts_tpu.train.vocoder import (create_gan_state,
                                              gan_disc_step, gan_gen_step)

    vcfg = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=256, hop_length=16)
    acfg = AudioConfig(n_mels=8, n_fft=256, win_length=256, hop_length=16,
                       f_max=4000.0)
    state = create_gan_state(jax.random.PRNGKey(0), vcfg,
                             discriminators=("mpd", "mrd"))
    assert set(state.disc_params) == {"mpd", "mrd"}
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 4096)).astype(np.float32) * 0.1)

    before = jax.tree.map(np.asarray, state.disc_params["mrd"])
    state, d_loss = gan_disc_step(state, audio, vcfg, acfg)
    assert np.isfinite(float(d_loss))
    after = state.disc_params["mrd"]
    moved = [not np.allclose(b, np.asarray(a)) for b, a in zip(
        jax.tree.leaves(before), jax.tree.leaves(after))]
    assert all(moved), "every MRD param should receive gradient"

    state, metrics = gan_gen_step(state, audio, vcfg, acfg)
    assert np.isfinite(float(metrics["gen_loss"]))


def test_unknown_discriminator_family_rejected():
    import pytest

    from matcha_tts_tpu.train.vocoder import create_gan_state

    with pytest.raises(ValueError, match="unknown discriminator"):
        create_gan_state(jax.random.PRNGKey(0), TINY,
                         discriminators=("mpd", "mrdd"))


def _tiny_matcha():
    cfg = MatchaConfig(
        n_vocab=178,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8, hop_length=16),
    )
    return cfg, init_matcha(jax.random.PRNGKey(0), cfg)


def test_synthesizer_with_vocos_vocoder():
    """VocosConfig is a drop-in for HiFiGANConfig across the Synthesizer,
    including the in-graph denoiser (bias probe runs through dispatch)."""
    from matcha_tts_tpu.inference.synthesizer import Synthesizer

    cfg, mp = _tiny_matcha()
    vcfg = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=64, hop_length=16)
    vp = init_vocoder(jax.random.PRNGKey(1), vcfg)
    syn = Synthesizer(mp, cfg, vp, vcfg,
                      text_buckets=(16, 32), frame_buckets=(64, 128),
                      denoise_strength=0.00025)
    res = syn.synthesize("Hello vocos world.", n_timesteps=2, seed=0)
    wav = res.wav
    assert wav.ndim == 1 and len(wav) == res.y_length * vcfg.hop_length
    assert np.isfinite(wav).all()
    # batched path shares the same dispatch
    outs = syn.synthesize_batch(["One.", "Two more words."], n_timesteps=2)
    assert len(outs) == 2
    for r in outs:
        assert np.isfinite(r.wav).all()


def test_vocos_grad_flows_everywhere():
    """Every parameter (incl. layer-scale gammas and the head) receives a
    nonzero gradient from a waveform loss."""
    params = vocos.init_vocos(jax.random.PRNGKey(5), TINY)
    mel = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 12, TINY.num_mels)), jnp.float32)

    def loss(p):
        return jnp.mean(jnp.abs(vocos.generate(p, mel, TINY)))

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.max(jnp.abs(g))) > 0.0, path


def test_vocos_sharded_batch_synthesis():
    """Batch-sharded inference over the 8-device mesh works family-
    agnostically (the fused graph dispatches on the static config type)."""
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.parallel.mesh import make_mesh

    cfg, mp = _tiny_matcha()
    vcfg = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=64, hop_length=16)
    vp = init_vocoder(jax.random.PRNGKey(1), vcfg)
    syn = Synthesizer(mp, cfg, vp, vcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    mesh = make_mesh(8)
    texts = [f"sentence number {i}" for i in range(10)]
    rs = syn.synthesize_batch_sharded(texts, mesh, n_timesteps=2)
    assert len(rs) == 10
    for r in rs:
        assert len(r.wav) > 0 and np.isfinite(r.wav).all()
    rs1 = syn.synthesize_batch(texts[:2], n_timesteps=2)
    np.testing.assert_allclose(rs[0].wav, rs1[0].wav, atol=3.2e-5)


def test_vocos_stream_samples():
    """Sample-level streaming through the Synthesizer with the Vocos
    family: chunk count/length structure matches the predicted duration
    (vocoder-level exactness is proven in test_streaming_vocoder.py;
    the fused synthesize() path draws different bucket-stable CFM noise,
    so mel-level equality is not expected — same as the HiFi-GAN test)."""
    from matcha_tts_tpu.inference.synthesizer import Synthesizer

    cfg, mp = _tiny_matcha()
    vcfg = VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=64, hop_length=16)
    vp = init_vocoder(jax.random.PRNGKey(1), vcfg)
    syn = Synthesizer(mp, cfg, vp, vcfg, text_buckets=(32,),
                      frame_buckets=(64,))
    full = syn.synthesize("Stream me please.", n_timesteps=2, seed=0)
    chunks = list(syn.stream_samples("Stream me please.", chunk_frames=16,
                                     n_timesteps=2, seed=0))
    got = np.concatenate(chunks)
    assert got.shape == full.wav.shape  # same duration prediction
    for c in chunks:
        assert c.dtype == np.float32 and np.isfinite(c).all()
