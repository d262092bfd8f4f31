"""Fixed-seed regression tests (SURVEY.md §4): the Euler loop at several
NFE values must produce stable, finite, seed-deterministic outputs, and
NFE=very-large must approach the probability-flow solution smoothly."""

import jax
import numpy as np

from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MatchaConfig,
)
from matcha_tts_tpu.models.matcha import init_matcha, synthesize


def cfg_and_params():
    cfg = MatchaConfig(
        n_vocab=40,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8),
    )
    return cfg, init_matcha(jax.random.PRNGKey(42), cfg)


def run(cfg, params, nfe, seed=0, solver=None):
    x = np.zeros((1, 16), np.int32)
    x[0, :11] = np.arange(1, 12)
    return np.asarray(
        synthesize(params, jax.random.PRNGKey(seed), x,
                   np.asarray([11], np.int32), cfg, n_timesteps=nfe,
                   t_y_max=32, solver=solver).mel
    )


def test_nfe_sweep_finite_and_distinct():
    cfg, params = cfg_and_params()
    mels = {nfe: run(cfg, params, nfe) for nfe in (2, 4, 10, 32)}
    for nfe, mel in mels.items():
        assert np.isfinite(mel).all(), nfe
    # more steps changes the result (the ODE integration refines)
    assert np.abs(mels[2] - mels[32]).max() > 1e-4
    # but high-NFE solutions converge toward each other
    d_coarse = np.abs(mels[2] - mels[4]).max()
    d_fine = np.abs(mels[10] - mels[32]).max()
    assert d_fine < d_coarse


def test_seed_determinism_and_variation():
    cfg, params = cfg_and_params()
    a = run(cfg, params, 4, seed=7)
    b = run(cfg, params, 4, seed=7)
    c = run(cfg, params, 4, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-5  # different noise -> different mel


def test_midpoint_solver_close_to_fine_euler():
    cfg, params = cfg_and_params()
    euler_fine = run(cfg, params, 64, seed=3)
    midpoint = run(cfg, params, 16, seed=3, solver="midpoint")
    euler_coarse = run(cfg, params, 16, seed=3)
    # midpoint at NFE=16 should be at least as close to euler-64 as euler-16
    e_mid = np.abs(midpoint - euler_fine).mean()
    e_coarse = np.abs(euler_coarse - euler_fine).mean()
    assert e_mid <= e_coarse * 1.1


def test_bfloat16_inference_sane():
    cfg, params = cfg_and_params()
    x = np.zeros((1, 16), np.int32)
    x[0, :11] = np.arange(1, 12)
    out32 = synthesize(params, jax.random.PRNGKey(0), x,
                       np.asarray([11], np.int32), cfg, n_timesteps=4,
                       t_y_max=32, compute_dtype="float32")
    out16 = synthesize(params, jax.random.PRNGKey(0), x,
                       np.asarray([11], np.int32), cfg, n_timesteps=4,
                       t_y_max=32, compute_dtype="bfloat16")
    a, b = np.asarray(out32.mel), np.asarray(out16.mel)
    assert b.dtype == np.float32  # outputs are fp32 regardless
    assert np.isfinite(b).all()
    np.testing.assert_array_equal(np.asarray(out32.y_lengths),
                                  np.asarray(out16.y_lengths))
    # bf16 compute tracks fp32 within loose tolerance
    assert np.abs(a - b).mean() < 0.3


def test_golden_fixtures():
    """Exact-value regression against committed golden outputs (generated
    by tests/make_golden.py on CPU/HIGHEST).  Guards future refactors
    against silent numeric drift."""
    from pathlib import Path

    from matcha_tts_tpu.ops import log_mel_spectrogram, maximum_path

    g = np.load(Path(__file__).parent / "golden" / "golden.npz")

    t = np.arange(22050) / 22050.0
    chirp = (0.5 * np.sin(2 * np.pi * (200 + 400 * t) * t)).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(chirp[None]))
    np.testing.assert_allclose(mel, g["mel_chirp"], atol=2e-4)

    path = np.asarray(maximum_path(g["mas_neg_cent"], g["mas_mask"]))
    np.testing.assert_array_equal(path, g["mas_path"])

    from matcha_tts_tpu.config import (AudioConfig, DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       MatchaConfig)
    from matcha_tts_tpu.models.matcha import init_matcha, synthesize

    cfg = MatchaConfig(
        n_vocab=60,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8),
    )
    params = init_matcha(jax.random.PRNGKey(777), cfg)
    x = np.zeros((1, 16), np.int32)
    x[0, :9] = np.arange(1, 10)
    out = synthesize(params, jax.random.PRNGKey(5), x,
                     np.asarray([9], np.int32), cfg, n_timesteps=4,
                     t_y_max=32)
    np.testing.assert_array_equal(np.asarray(out.y_lengths), g["synth_ylen"])
    np.testing.assert_allclose(np.asarray(out.mel), g["synth_mel"], atol=2e-4)
