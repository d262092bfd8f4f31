"""Training-loop integration test on synthetic data: dataset -> bucketed
batches -> on-device featurization -> train steps -> checkpoint + resume."""

import numpy as np
import pytest

from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MatchaConfig,
    TrainConfig,
)
from matcha_tts_tpu.data.dataset import BucketBatcher, TextMelDataset, create_filelists
from matcha_tts_tpu.train.loop import featurize_batch, fit
from matcha_tts_tpu.utils.wav import write_wav


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """A tiny LJSpeech-layout dataset of sine-wave 'speech'."""
    root = tmp_path_factory.mktemp("ljs")
    (root / "wavs").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    texts = ["hello world", "this is a test", "matcha tts on tpu",
             "four score and seven", "the quick brown fox", "jumps over dogs",
             "alpha beta gamma", "delta epsilon zeta"]
    for i, text in enumerate(texts):
        dur = rng.uniform(0.4, 0.9)
        t = np.arange(int(22050 * dur)) / 22050
        wav = (0.3 * np.sin(2 * np.pi * (120 + 30 * i) * t)).astype(np.float32)
        write_wav(root / "wavs" / f"utt{i}.wav", wav, 22050)
        lines.append(f"utt{i}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")
    return root


def tiny_model_cfg():
    return MatchaConfig(
        n_vocab=178,
        encoder=EncoderConfig(n_feats=80, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(),
    )


def test_create_filelists_and_dataset(synth_dataset):
    train_fl, val_fl = create_filelists(synth_dataset, val_fraction=0.25)
    ds = TextMelDataset(train_fl, AudioConfig(), seed=1)
    assert len(ds) == 6
    wav = ds.load_audio(0)
    assert wav.dtype == np.float32 and len(wav) > 1000
    nf = ds.n_frames(len(wav))
    assert nf == len(wav) // 256  # reference framing identity


def test_bucket_batcher_and_featurize(synth_dataset):
    train_fl, _ = create_filelists(synth_dataset, val_fraction=0.25)
    cfg = tiny_model_cfg()
    tcfg = TrainConfig(batch_size=3, text_buckets=(32, 64),
                       frame_buckets=(64, 128, 256))
    ds = TextMelDataset(train_fl, cfg.audio, seed=1)
    batches = list(BucketBatcher(ds, tcfg, shuffle=False))
    assert len(batches) == 2
    b = batches[0]
    assert b["x"].shape[1] in (32, 64)
    assert b["audio"].ndim == 2
    feat = featurize_batch(b, cfg)
    assert feat["y"].shape[0] == 3 and feat["y"].shape[2] == 80
    assert feat["y"].shape[1] in (64, 128, 256)
    # normalized log-mels should be roughly centered for real(ish) audio
    assert np.isfinite(np.asarray(feat["y"])).all()


def test_fit_two_steps_and_resume(synth_dataset, tmp_path):
    train_fl, val_fl = create_filelists(synth_dataset, val_fraction=0.25)
    cfg = tiny_model_cfg()
    tcfg = TrainConfig(batch_size=2, text_buckets=(32, 64),
                       frame_buckets=(64, 128, 256), log_every_n_steps=1,
                       ckpt_every_n_steps=2, learning_rate=1e-4)
    work = tmp_path / "run"
    state = fit(cfg, tcfg, train_fl, val_fl, work_dir=str(work), max_steps=2)
    assert int(state.step) == 2
    assert (work / "metrics.jsonl").exists()
    assert (work / "ckpt").exists()

    # resume continues from step 2
    state2 = fit(cfg, tcfg, train_fl, val_fl, work_dir=str(work), max_steps=3)
    assert int(state2.step) == 3


def test_checkpointer_keeps_best_by_val_loss(tmp_path):
    """Best-k retention semantics of the reference's ModelCheckpoint
    (monitor val/loss, mode min, top-k, save_last — train_standalone.py:
    850-857): the k best checkpoints survive plus always the latest, and
    the ranking persists across a manager restart (resume)."""
    import jax

    from matcha_tts_tpu.train.loop import Checkpointer
    from matcha_tts_tpu.train.train_state import create_train_state

    cfg = tiny_model_cfg()
    tcfg = TrainConfig(batch_size=2)
    from matcha_tts_tpu.models.matcha import init_matcha

    state = jax.device_get(
        create_train_state(init_matcha(jax.random.PRNGKey(0), cfg), tcfg))

    ck = Checkpointer(tmp_path / "best", keep=2, monitor="loss")
    losses = {1: 5.0, 2: 1.0, 3: 4.0, 4: 0.5, 5: 3.0}
    for step, loss in losses.items():
        ck.save(step, state._replace(step=np.asarray(step)), cfg,
                metrics={"loss": loss})
    kept = sorted(ck.mngr.all_steps())
    # best-2 by loss = {4, 2}; latest = 5; recency-only would keep {3,4,5}
    assert kept == [2, 4, 5], kept

    # resume restores the LATEST (not best) state, so training continues
    back = ck.restore(state)
    assert int(back.step) == 5

    # a fresh manager over the same dir (what resume constructs) still
    # ranks against the persisted metrics
    ck2 = Checkpointer(tmp_path / "best", keep=2, monitor="loss")
    ck2.save(6, state._replace(step=np.asarray(6)), cfg,
             metrics={"loss": 2.0})
    kept2 = sorted(ck2.mngr.all_steps())
    assert kept2 == [2, 4, 6], kept2
    # the best checkpoint (step 4, loss 0.5) is restorable on demand
    best = ck2.restore(state, step=4)
    assert int(best.step) == 4


def test_metrics_logger_writes_tensorboard_events(tmp_path):
    """The reference logs scalars through TensorBoardLogger
    (train_standalone.py:860-872); MetricsLogger must emit real event
    files alongside the JSONL."""
    from matcha_tts_tpu.train.loop import MetricsLogger

    lg = MetricsLogger(tmp_path)
    lg.log(10, "train", {"loss": 1.5, "dur_loss": 0.2})
    lg.log(10, "val", {"loss": 2.5})
    assert (tmp_path / "metrics.jsonl").exists()
    if lg.tb is None:  # TB stack genuinely unavailable: JSONL-only mode
        return
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_prefetch_iterator():
    from matcha_tts_tpu.data.dataset import PrefetchIterator

    items = list(PrefetchIterator(iter(range(7)), depth=2))
    assert items == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("io error")

    it = PrefetchIterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        for _ in it:
            pass


def test_checkpointer_generic_states(tmp_path):
    """Checkpointer round-trips DistillState and GanTrainState (not just
    TrainState)."""
    import jax

    from matcha_tts_tpu.config import (AudioConfig, DecoderConfig,
                                       DurationPredictorConfig, EncoderConfig,
                                       HiFiGANConfig, MatchaConfig)
    from matcha_tts_tpu.models.matcha import init_matcha
    from matcha_tts_tpu.train.distill import DistillConfig, create_distill_state
    from matcha_tts_tpu.train.loop import Checkpointer
    from matcha_tts_tpu.train.vocoder import create_gan_state

    cfg = MatchaConfig(
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        audio=AudioConfig(n_mels=8),
    )
    dstate = create_distill_state(init_matcha(jax.random.PRNGKey(0), cfg),
                                  DistillConfig())
    ck = Checkpointer(tmp_path / "d", keep=1)
    ck.save(3, jax.device_get(dstate), cfg)
    back = ck.restore(dstate)
    assert back is not None and isinstance(back, type(dstate))
    a = jax.tree.leaves(dstate.ema_params)[0]
    b = jax.tree.leaves(back.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    hcfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    gstate = create_gan_state(jax.random.PRNGKey(1), hcfg,
                              use_weight_norm=True)
    ck2 = Checkpointer(tmp_path / "g", keep=1)
    ck2.save(7, jax.device_get(gstate))  # no model_cfg: also supported
    gback = ck2.restore(gstate)
    assert gback is not None
    ga = jax.tree.leaves(gstate.gen_params)[0]
    gb = jax.tree.leaves(gback.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_graceful_shutdown_signal_mechanics():
    """SIGTERM sets the flag without killing the process; a second signal
    escalates; exiting the context restores the previous handlers."""
    import os
    import signal
    import time

    from matcha_tts_tpu.train.loop import GracefulShutdown

    before = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown(signals=(signal.SIGTERM,)) as sd:
        assert not sd.requested
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.time() + 5.0
        while not sd.requested and time.time() < deadline:
            time.sleep(0.01)
        assert sd.requested  # still alive, flag set
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
            t = time.time() + 5.0
            while time.time() < t:  # handler raises between bytecodes
                time.sleep(0.01)
    assert signal.getsignal(signal.SIGTERM) is before


def test_fit_sigterm_checkpoints_midrun(synth_dataset, tmp_path, monkeypatch):
    """Preemption safety: a SIGTERM mid-run checkpoints the CURRENT step
    (not the last ckpt_every boundary) and the run resumes from it."""
    import os
    import signal

    from matcha_tts_tpu.train import loop as loop_mod

    orig_logger = loop_mod.MetricsLogger

    class KillingLogger(orig_logger):
        """Delivers SIGTERM during step 1's train log — deterministic
        stand-in for an external preemption notice."""

        def log(self, step, split, metrics, extra=None):
            super().log(step, split, metrics, extra)
            if split == "train" and step == 1:
                os.kill(os.getpid(), signal.SIGTERM)

    monkeypatch.setattr(loop_mod, "MetricsLogger", KillingLogger)

    train_fl, val_fl = create_filelists(synth_dataset, val_fraction=0.25)
    cfg = tiny_model_cfg()
    tcfg = TrainConfig(batch_size=2, text_buckets=(32, 64),
                       frame_buckets=(64, 128, 256), log_every_n_steps=1,
                       ckpt_every_n_steps=100, learning_rate=1e-4)
    work = tmp_path / "run"
    state = fit(cfg, tcfg, train_fl, val_fl, work_dir=str(work), max_steps=5)
    assert int(state.step) == 1  # stopped after the signaled step

    from matcha_tts_tpu.train.loop import Checkpointer

    ck = Checkpointer(work / "ckpt", keep=3, monitor="loss")
    assert ck.mngr.latest_step() == 1  # saved OFF the ckpt_every grid

    # a fresh (unsignaled) run resumes from the preemption checkpoint
    monkeypatch.setattr(loop_mod, "MetricsLogger", orig_logger)
    state2 = fit(cfg, tcfg, train_fl, val_fl, work_dir=str(work), max_steps=2)
    assert int(state2.step) == 2


def test_compute_mel_statistics_matches_unpadded_oracle(synth_dataset):
    """The bucketed/masked statistics pass must agree with per-utterance
    unpadded log-mels — padding never biases the moments."""
    import jax.numpy as jnp

    from matcha_tts_tpu.config import AudioConfig
    from matcha_tts_tpu.data.dataset import load_wav, parse_filelist
    from matcha_tts_tpu.data.statistics import compute_mel_statistics
    from matcha_tts_tpu.ops.stft import log_mel_spectrogram

    train_fl, _ = create_filelists(synth_dataset, val_fraction=0.25)
    a = AudioConfig()
    mean, std = compute_mel_statistics(train_fl, a, batch_size=3,
                                       frame_buckets=(32, 64, 128))

    # oracle: one utterance at a time, generously zero-padded (no bucket
    # grouping, no masking math — plain numpy accumulation of the first
    # nf frames, the same frames the utility counts)
    vals = []
    pad = (a.n_fft - a.hop_length) // 2
    for parts in parse_filelist(train_fl):
        wav, sr = load_wav(parts[0])
        nf = 1 + (len(wav) + 2 * pad - a.n_fft) // a.hop_length
        w = np.zeros(len(wav) + 4 * a.n_fft, np.float32)
        w[: len(wav)] = wav
        mel = log_mel_spectrogram(jnp.asarray(w[None]), a.sample_rate,
                                  a.n_fft, a.n_mels, a.hop_length,
                                  a.win_length, a.f_min, a.f_max)
        vals.append(np.asarray(mel)[0, :, :nf].reshape(-1))
    allv = np.concatenate(vals).astype(np.float64)
    np.testing.assert_allclose(mean, allv.mean(), rtol=0, atol=2e-3)
    np.testing.assert_allclose(std, allv.std(), rtol=0, atol=2e-3)

    # the synth corpus is nothing like LJSpeech: the defaults would be wrong
    assert abs(mean - a.mel_mean) > 0.5
