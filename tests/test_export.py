"""AOT export round trip: serialized graphs reproduce the live jit path."""

import numpy as np

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    HiFiGANConfig,
    MatchaConfig,
)
from matcha_tts_tpu.inference import export as exp
from matcha_tts_tpu.inference.synthesizer import _synthesize_packed
from matcha_tts_tpu.models.hifigan import init_generator
from matcha_tts_tpu.models.matcha import init_matcha


def tiny():
    cfg = MatchaConfig(
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8),
    )
    hcfg = HiFiGANConfig(upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
                         upsample_initial_channel=32,
                         resblock_kernel_sizes=(3, 7),
                         resblock_dilation_sizes=((1, 3), (1, 3)), num_mels=8)
    mp = init_matcha(jax.random.PRNGKey(0), cfg)
    vp = init_generator(jax.random.PRNGKey(1), hcfg)
    return cfg, hcfg, mp, vp


def _example(cfg, b=1, t_x=32):
    rng = np.random.default_rng(0)
    x = np.zeros((b, t_x), np.int32)
    x[:, :20] = rng.integers(1, cfg.n_vocab, size=(b, 20))
    return jnp.asarray(x), jnp.asarray([20] * b, np.int32)


def test_export_roundtrip_matches_live_jit(tmp_path):
    cfg, hcfg, mp, vp = tiny()
    x, xl = _example(cfg)

    data = exp.export_synthesis(mp, cfg, vp, hcfg, batch=1, text_bucket=32,
                                frame_bucket=64, n_timesteps=2,
                                compute_dtype="float32")
    assert len(data) > 1000
    fn = exp.load_synthesis(data)

    key = exp.key_data(3)
    packed, mel, attn, dur, yl = fn(mp, vp, key, x, xl)

    want_packed, want_out = _synthesize_packed(
        mp, vp, jax.random.PRNGKey(3), x, xl, cfg, hcfg, 2, 64, 0.667, 1.0,
        compute_dtype="float32")
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(want_packed))
    np.testing.assert_allclose(np.asarray(mel, np.float32),
                               np.asarray(want_out.mel, np.float32))

    pcm, y_lengths = exp.unpack_pcm(np.asarray(packed), 1,
                                    cfg.audio.hop_length)
    assert pcm.shape[0] == 1 and y_lengths.shape == (1,)
    assert int(y_lengths[0]) == int(np.asarray(want_out.y_lengths)[0])


def test_export_bucket_grid_manifest(tmp_path):
    cfg, hcfg, mp, vp = tiny()
    manifest = exp.export_bucket_grid(
        mp, cfg, vp, hcfg, tmp_path, batch_buckets=(1,), text_buckets=(32,),
        frame_buckets=(64,), n_timesteps=2, compute_dtype="float32")
    assert (tmp_path / "manifest.json").exists()
    assert manifest["entries"][0]["file"].startswith("synth_b1_t32_f64")

    table = exp.load_bucket_grid(tmp_path)
    fn = table[(1, 32, 64)]
    x, xl = _example(cfg)
    packed, *_ = fn(mp, vp, exp.key_data(0), x, xl)
    pcm, yl = exp.unpack_pcm(np.asarray(packed), 1, cfg.audio.hop_length)
    assert np.isfinite(pcm.astype(np.float32)).all()
