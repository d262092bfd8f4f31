"""End-to-end inference tests: text -> tokens -> synthesize -> vocoder."""

import jax
import numpy as np

from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    HiFiGANConfig,
    MatchaConfig,
)
from matcha_tts_tpu.inference.synthesizer import Synthesizer
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.models.matcha import init_matcha, synthesize
from matcha_tts_tpu.utils.wav import read_wav, write_wav


def tiny_models():
    cfg = MatchaConfig(
        n_vocab=178,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8, hop_length=16),
    )
    hcfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    mp = init_matcha(jax.random.PRNGKey(0), cfg)
    vp = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)
    return cfg, hcfg, mp, vp


def test_synthesize_jit_static_shapes():
    cfg, _, mp, _ = tiny_models()
    x = np.zeros((2, 16), np.int32)
    x[0, :7] = [1, 5, 9, 2, 40, 41, 2]
    x[1, :5] = [3, 4, 5, 6, 7]
    out = synthesize(mp, jax.random.PRNGKey(0), x,
                     np.asarray([7, 5], np.int32), cfg,
                     n_timesteps=4, t_y_max=64)
    assert out.mel.shape == (2, 8, 64)
    assert out.attn.shape == (2, 16, 64)
    y0 = int(out.y_lengths[0])
    mel = np.asarray(out.mel)
    assert np.isfinite(mel).all()
    # masked frames are exactly mel_mean after denormalization of zeros
    mean = float(cfg.audio.mel_mean)
    np.testing.assert_allclose(mel[0, :, y0:], 0.0, atol=1e-5)


def test_synthesizer_end_to_end():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32, 64), frame_buckets=(64, 128))
    r = syn.synthesize("Hello world.", n_timesteps=2, seed=1)
    assert r.wav.ndim == 1 and len(r.wav) > 0
    assert len(r.wav) == r.mel.shape[1] * hcfg.total_upsample
    assert np.isfinite(r.wav).all()
    assert np.abs(r.wav).max() <= 1.0


def test_synthesizer_deterministic_given_seed():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32,), frame_buckets=(64,))
    r1 = syn.synthesize("abc def", n_timesteps=2, seed=7)
    r2 = syn.synthesize("abc def", n_timesteps=2, seed=7)
    np.testing.assert_array_equal(r1.wav, r2.wav)


def test_batch_synthesis():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32,), frame_buckets=(64,))
    rs = syn.synthesize_batch(["one two", "three four five", "six"],
                              n_timesteps=2)
    assert len(rs) == 3
    for r in rs:
        assert len(r.wav) > 0 and np.isfinite(r.wav).all()


def test_batch_applies_denoiser_and_matches_single_path():
    """The batched path must run the SAME fused graph as the single path —
    including the in-graph denoiser (a batch of 1 at matched buckets is
    bitwise identical), and the denoiser must actually change the audio."""
    cfg, hcfg, mp, vp = tiny_models()
    kw = dict(text_buckets=(32,), frame_buckets=(64,),
              batch_frame_buckets=(64,), batch_buckets=(1,))
    syn_den = Synthesizer(mp, cfg, vp, hcfg, denoise_strength=0.1, **kw)
    syn_raw = Synthesizer(mp, cfg, vp, hcfg, **kw)
    text = "denoise me please"
    b = syn_den.synthesize_batch([text], n_timesteps=2, seed=4)[0]
    s = syn_den.synthesize(text, n_timesteps=2, seed=4)
    np.testing.assert_array_equal(b.wav, s.wav)
    raw = syn_raw.synthesize_batch([text], n_timesteps=2, seed=4)[0]
    assert np.abs(b.wav - raw.wav[: len(b.wav)]).max() > 1e-5, (
        "denoise_strength had no effect on the batched path")


def test_batch_rows_share_one_packed_transfer():
    """All rows of one batched call share a single packed device->host
    fetch (serving transfer-cost contract)."""
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    rs = syn.synthesize_batch(["one two", "three four"], n_timesteps=2)
    assert rs[0]._host is rs[1]._host  # shared cache list
    assert rs[0]._host[0] is None      # nothing fetched yet
    _ = rs[0].wav
    assert rs[1]._host[0] is not None  # row 1 rides row 0's fetch


def test_long_form_split():
    parts = Synthesizer.split_text(
        "First sentence. Second one! And|a pipe segment?"
    )
    assert parts == ["First sentence.", "Second one!", "And", "a pipe segment?"]


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(1000) * 0.3).clip(-1, 1).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, audio, 22050)
    back, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(back, audio, atol=1e-3)


def test_sharded_batch_synthesis():
    """BASELINE config 5: batch-sharded inference over the 8-device mesh."""
    from matcha_tts_tpu.parallel.mesh import make_mesh

    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    mesh = make_mesh(8)
    texts = [f"sentence number {i}" for i in range(10)]
    rs = syn.synthesize_batch_sharded(texts, mesh, n_timesteps=2)
    assert len(rs) == 10
    for r in rs:
        assert len(r.wav) > 0 and np.isfinite(r.wav).all()
    # sharded result matches unsharded batch result (up to one int16 PCM
    # quantization step: XLA fusion order differs under sharding)
    rs1 = syn.synthesize_batch(texts[:2], n_timesteps=2)
    np.testing.assert_allclose(rs[0].wav, rs1[0].wav, atol=3.2e-5)


def test_sharded_batch_multispeaker():
    """`spk` parity between the sharded and unsharded batch paths
    (reference conditioning: model.py:527-528,977-979)."""
    from matcha_tts_tpu.parallel.mesh import make_mesh

    cfg, hcfg, mp, vp = tiny_models()
    import dataclasses

    cfg = dataclasses.replace(cfg, n_spks=4, spk_emb_dim=8)
    mp = init_matcha(jax.random.PRNGKey(0), cfg)
    syn = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    mesh = make_mesh(8)
    texts = [f"speaker test {i}" for i in range(4)]
    rs2 = syn.synthesize_batch_sharded(texts, mesh, n_timesteps=2, spk=2)
    rs0 = syn.synthesize_batch_sharded(texts, mesh, n_timesteps=2, spk=0)
    assert np.abs(rs2[0].wav[: len(rs0[0].wav)]
                  - rs0[0].wav[: len(rs2[0].wav)]).max() > 1e-5, (
        "spk had no effect on the sharded path")
    # matches the unsharded batch path at the same speaker (up to one
    # int16 PCM quantization step; see test_sharded_batch_synthesis)
    ru = syn.synthesize_batch(texts[:2], n_timesteps=2, spk=2)
    np.testing.assert_allclose(rs2[0].wav, ru[0].wav, atol=3.2e-5)


def test_long_form_crossfade():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32,), frame_buckets=(64,))
    r_gap = syn.synthesize_long("one two. three four.", n_timesteps=2)
    r_xf = syn.synthesize_long("one two. three four.", n_timesteps=2,
                               crossfade_ms=20.0)
    assert len(r_xf.wav) > 0
    # crossfaded output is shorter than silence-joined output
    assert len(r_xf.wav) < len(r_gap.wav)
    assert np.isfinite(r_xf.wav).all()


def test_plot_helpers(tmp_path):
    from matcha_tts_tpu.utils.plot import plot_alignment, plot_spectrogram

    rng = np.random.default_rng(0)
    plot_spectrogram(rng.standard_normal((80, 100)), tmp_path / "spec.png")
    plot_alignment(rng.standard_normal((40, 100)), tmp_path / "attn.png")
    # either PNG (matplotlib present) or NPY fallback must exist
    assert any(p.suffix in (".png", ".npy") for p in tmp_path.iterdir())


def test_multispeaker_inference():
    from matcha_tts_tpu.config import (CFMConfig, DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       MatchaConfig)
    from matcha_tts_tpu.models.matcha import init_matcha, synthesize

    cfg = MatchaConfig(
        n_vocab=178, n_spks=4, spk_emb_dim=8,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8),
    )
    assert cfg.decoder_in_channels == 2 * 8 + 8  # + spk_emb_dim
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    x = np.zeros((2, 16), np.int32)
    x[:, :9] = np.arange(1, 10)
    xl = np.asarray([9, 9], np.int32)
    out0 = synthesize(params, jax.random.PRNGKey(1), x, xl, cfg,
                      n_timesteps=2, t_y_max=32,
                      spks=np.asarray([0, 0], np.int32))
    out1 = synthesize(params, jax.random.PRNGKey(1), x, xl, cfg,
                      n_timesteps=2, t_y_max=32,
                      spks=np.asarray([0, 2], np.int32))
    m0, m1 = np.asarray(out0.mel), np.asarray(out1.mel)
    # same speaker row identical; different speaker row differs
    np.testing.assert_allclose(m0[0], m1[0], atol=1e-5)
    assert np.abs(m0[1] - m1[1]).max() > 1e-4


def test_synthesizer_with_denoiser():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), denoise_strength=0.00025)
    r = syn.synthesize("Hello world.", n_timesteps=2, seed=1)
    assert len(r.wav) > 0 and np.isfinite(r.wav).all()
    assert np.abs(r.wav).max() <= 1.0
    # near-identity at tiny strength: close to non-denoised output
    syn0 = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                       frame_buckets=(64,))
    r0 = syn0.synthesize("Hello world.", n_timesteps=2, seed=1)
    n = min(len(r.wav), len(r0.wav))
    assert np.abs(r.wav[256:n-256] - r0.wav[256:n-256]).max() < 0.05


def test_streaming_synthesis():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32,), frame_buckets=(64,))
    text = "First one. Second two! Third three?"
    got = list(syn.stream(text, n_timesteps=2))
    assert len(got) == 3
    assert got[0][0] == "First one."
    for chunk_text, wav in got:
        assert len(wav) > 0 and np.isfinite(wav).all()
    # streamed chunks match one-shot synthesis of the same chunk/seed
    r0 = syn.synthesize("First one.", n_timesteps=2, seed=0)
    np.testing.assert_array_equal(got[0][1], r0.wav)


def test_multispeaker_batched_synthesis():
    """synthesize_batch must honor spk (the serving batcher groups by
    speaker): different spk -> different audio, same spk -> identical."""
    from matcha_tts_tpu.config import (DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       HiFiGANConfig, MatchaConfig)
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.models.matcha import init_matcha

    cfg = MatchaConfig(
        n_vocab=178, n_spks=4, spk_emb_dim=8,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8, hop_length=16),
    )
    hcfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    vp = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)
    syn = Synthesizer(params, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    texts = ["Hello there.", "Another one."]
    r0 = syn.synthesize_batch(texts, n_timesteps=2, seed=3, spk=0)
    r0b = syn.synthesize_batch(texts, n_timesteps=2, seed=3, spk=0)
    r2 = syn.synthesize_batch(texts, n_timesteps=2, seed=3, spk=2)
    np.testing.assert_array_equal(r0[0].wav, r0b[0].wav)
    # speaker identity changes the output (duration and/or mel content)
    m0, m2 = r0[0].mel, r2[0].mel
    n = min(m0.shape[1], m2.shape[1])
    assert (m0.shape != m2.shape
            or np.abs(m0[:, :n] - m2[:, :n]).max() > 1e-4)


def test_batched_noise_is_content_keyed():
    """A request's audio must not depend on row order or co-batched
    requests (serving determinism): the same (text, seed) yields identical
    wavs alone, reordered, and in a different batch, given the same frame
    bucket."""
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg, text_buckets=(32,),
                      frame_buckets=(64,), batch_frame_buckets=(64,))
    a, b, c = "alpha beta", "gamma delta epsilon", "zeta"
    r_ab = syn.synthesize_batch([a, b], n_timesteps=2, seed=9)
    r_ba = syn.synthesize_batch([b, a], n_timesteps=2, seed=9)
    r_ac = syn.synthesize_batch([a, c], n_timesteps=2, seed=9)
    r_a = syn.synthesize_batch([a], n_timesteps=2, seed=9)
    # same compiled shape -> bitwise identical regardless of row order
    # or co-batched content
    np.testing.assert_array_equal(r_ab[0].wav, r_ba[1].wav)
    np.testing.assert_array_equal(r_ab[0].wav, r_ac[0].wav)
    # different batch shape -> same noise, different XLA fusion order:
    # equal up to one int16 PCM quantization step
    np.testing.assert_allclose(r_ab[0].wav, r_a[0].wav, atol=1.01 / 32767.0)


def test_fp32_large_batch_hbm_guard():
    """The measured fp32 batch-32 HBM overflow (docs/RESULTS.md) must fail
    fast with an actionable error, not a runtime OOM; bf16 and small fp32
    batches pass the guard."""
    import pytest

    from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig

    cfg, hcfg = MatchaConfig(), HiFiGANConfig()  # full-size hop 256
    syn = Synthesizer.__new__(Synthesizer)  # guard needs only cfg + dtype
    syn.matcha_cfg, syn.hifi_cfg = cfg, hcfg
    syn.compute_dtype = "float32"
    with pytest.raises(ValueError, match="bfloat16"):
        syn._check_vocoder_memory(32, 768)
    syn._check_vocoder_memory(8, 768)   # measured-working fp32 shape
    syn.compute_dtype = "bfloat16"      # supported batch-throughput mode
    syn._check_vocoder_memory(32, 2048)


def test_warmup_grid_covers_all_compositions():
    """After `warmup_grid`, NO batched-traffic composition within the
    warmed ranges may trigger a new fused-graph compile (the p99 cliff in
    the serving soak: a novel (batch, text, frame) triple compiling
    mid-request, docs/RESULTS.md)."""
    from matcha_tts_tpu.inference import synthesizer as synth_mod

    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(16, 32), batch_buckets=(1, 2, 4),
                      batch_frame_buckets=(64, 128))
    triples = syn.warmup_grid(n_timesteps=2, fpt_range=(1.0, 4.0))
    # every (batch, text) pair reaches at least one frame bucket
    assert {(b, tx) for b, tx, _ in triples} == {
        (b, tx) for b in (1, 2, 4) for tx in (16, 32)}
    before = synth_mod._synthesize_packed._cache_size()
    # compositions chosen to sweep batch buckets (1, 2, 4), both text
    # buckets, and duration-model-driven frame buckets
    syn.synthesize_batch(["hi"], n_timesteps=2)
    syn.synthesize_batch(["one two", "a much longer sentence that "
                          "overflows the small text bucket"], n_timesteps=2)
    syn.synthesize_batch(["a", "bb", "ccc"], n_timesteps=2)
    syn.synthesize_batch(["w x y z"] * 4, n_timesteps=2)
    assert synth_mod._synthesize_packed._cache_size() == before, (
        "batched traffic compiled a graph warmup_grid did not cover")


def test_synthesizer_stats_count_calls_and_bucket_retries():
    cfg, hcfg, mp, vp = tiny_models()
    syn = Synthesizer(mp, cfg, vp, hcfg,
                      text_buckets=(32,), frame_buckets=(8, 64))
    assert syn.stats == {"calls": 0, "bucket_retries": 0}
    r = syn.synthesize("hello there friend", n_timesteps=2, seed=0)
    assert np.isfinite(r.wav).all()
    assert syn.stats["calls"] >= 1
    base = dict(syn.stats)
    # force an undershoot: a frames-per-token prior far below what the
    # duration model emits makes the first bucket too small, so the
    # heuristic must retry one bucket up and count it
    syn2 = Synthesizer(mp, cfg, vp, hcfg,
                       text_buckets=(32,), frame_buckets=(8, 64))
    syn2.FRAMES_PER_TOKEN = 0.1
    r2 = syn2.synthesize("hello there friend", n_timesteps=2, seed=0)
    assert syn2.stats["bucket_retries"] >= 1
    assert syn2.stats["calls"] == syn2.stats["bucket_retries"] + 1
    # the retried result equals the directly-bucketed one
    np.testing.assert_array_equal(r2.wav, r.wav)
    assert base["bucket_retries"] == 0
