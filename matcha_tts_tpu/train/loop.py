"""Training orchestration: data-parallel fit loop, checkpointing, metrics
(reference: /root/reference/train_standalone.py:580-886, rebuilt around
jit + Mesh instead of Lightning + DDP/NCCL)."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from matcha_tts_tpu.config import MatchaConfig, TrainConfig, config_to_dict
from matcha_tts_tpu.data.dataset import (BucketBatcher, PrefetchIterator,
                                          TextMelDataset)
from matcha_tts_tpu.models.matcha import init_matcha
from matcha_tts_tpu.ops.stft import log_mel_spectrogram, normalize_mel
from matcha_tts_tpu.parallel import mesh as pmesh
from matcha_tts_tpu.train.train_state import (
    TrainState,
    create_train_state,
    eval_step,
    train_step,
)


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def featurize_batch(batch: Dict[str, np.ndarray], cfg: MatchaConfig):
    """Raw-audio batch -> model batch with on-device log-mel features.

    The reference extracts mels in dataloader workers on host CPU
    (train_standalone.py:408-423); here the STFT runs on the accelerator
    as part of the same program that consumes it.
    """
    a = cfg.audio
    mel = log_mel_spectrogram(
        batch["audio"], a.sample_rate, a.n_fft, a.n_mels, a.hop_length,
        a.win_length, a.f_min, a.f_max,
    )  # (B, n_mels, T)
    mel = normalize_mel(mel, a.mel_mean, a.mel_std)
    out = {
        "x": batch["x"],
        "x_lengths": batch["x_lengths"],
        "y": mel.transpose(0, 2, 1),  # (B, T, n_mels)
        "y_lengths": batch["y_lengths"],
    }
    if "spks" in batch:
        out["spks"] = batch["spks"]
    return out


class MetricsLogger:
    """JSONL + stdout + TensorBoard scalar logging (the reference's
    TensorBoardLogger surface, train_standalone.py:860-872: train/val x
    {loss, dur_loss, prior_loss, cfm_loss} under split-prefixed tags)."""

    def __init__(self, log_dir, tensorboard: bool = True):
        self.path = Path(log_dir)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = open(self.path / "metrics.jsonl", "a", encoding="utf-8")
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.path / "tb"))
            except Exception:  # TB stack unavailable — JSONL still written
                self.tb = None

    def log(self, step: int, split: str, metrics: Dict, extra: Optional[Dict] = None):
        rec = {"step": step, "split": split,
               **{k: float(v) for k, v in metrics.items()}}
        if extra:
            rec.update(extra)
        self.file.write(json.dumps(rec) + "\n")
        self.file.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{split}/{k}", float(v), step)
            self.tb.flush()
        print(f"[{split} {step}] " + " ".join(f"{k}={float(v):.4f}"
                                              for k, v in metrics.items()))


class GracefulShutdown:
    """Convert SIGTERM/SIGINT into a checkpoint-then-exit request.

    TPU slices are routinely preempted (maintenance events, spot
    reclamation) with a short grace period; a training run that dies
    between checkpoints loses up to `ckpt_every` steps.  The loops poll
    `.requested` once per step and save before returning, so a preempted
    run resumes from the exact step it was killed at.  (The reference has
    no such guard — Lightning only converts Ctrl-C into a teardown,
    train_standalone.py:880-886 surface; SURVEY.md §5 failure detection.)

    Use as a context manager so previous handlers are restored (pytest
    owns SIGINT).  A second signal raises KeyboardInterrupt — the escape
    hatch when the final checkpoint itself hangs.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = tuple(signals) if signals is not None else (
            _signal.SIGTERM, _signal.SIGINT)
        self.requested = False
        self._prev = {}

    def _handle(self, signum, frame):
        if self.requested:
            raise KeyboardInterrupt(f"second signal {signum} during shutdown")
        self.requested = True
        print(f"[shutdown] caught signal {signum}; checkpointing after the "
              f"current step (send again to abort)", flush=True)

    def __enter__(self):
        for s in self.signals:
            self._prev[s] = self._signal.signal(s, self._handle)
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            self._signal.signal(s, h)
        self._prev = {}
        return False


class Checkpointer:
    """Orbax-backed checkpoint save/restore with config + mel stats embedded
    (reference embeds them as buffers + hparams, train_standalone.py:595,
    618-621, 850-857)."""

    def __init__(self, ckpt_dir, keep: int = 3,
                 monitor: Optional[str] = None, best_mode: str = "min"):
        """`monitor=None` keeps the last `keep` checkpoints by recency.
        With a metric name (e.g. "loss"), retention matches the reference's
        ModelCheckpoint(monitor="val/loss", mode="min", save_top_k=3,
        save_last=True) (train_standalone.py:850-857): the `keep` best by
        that metric are preserved, plus always the latest (so resume never
        goes back in time)."""
        import orbax.checkpoint as ocp

        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        if monitor is None:
            options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                   create=True)
        else:
            from orbax.checkpoint import checkpoint_managers as ocm

            policy = ocm.AnyPreservationPolicy([
                # reverse=True sorts descending; BestN keeps the tail of
                # the sort, i.e. the `keep` smallest values in "min" mode
                ocm.BestN(get_metric_fn=lambda m: float(m[monitor]),
                          reverse=(best_mode == "min"), n=keep),
                ocm.LatestN(1),
            ])
            # best_fn sets Orbax's _track_best, which is what persists the
            # metrics item to disk — without it a restarted manager sees
            # metric-less checkpoints and best-k ranking dies on resume.
            options = ocp.CheckpointManagerOptions(
                create=True, preservation_policy=policy,
                best_fn=lambda m: float(m[monitor]), best_mode=best_mode)
        self.mngr = ocp.CheckpointManager(self.dir, options=options)

    def save(self, step: int, state, model_cfg: Optional[MatchaConfig] = None,
             metrics: Optional[Dict] = None):
        """Save any NamedTuple train state (TrainState, DistillState,
        GanTrainState) field-by-field, with the model config embedded.
        `metrics` (e.g. the val scalars) rank checkpoints for best-k
        retention when the manager monitors a metric."""
        import orbax.checkpoint as ocp

        parts = {"state": ocp.args.StandardSave(dict(state._asdict()))}
        if model_cfg is not None:
            parts["config"] = ocp.args.JsonSave(config_to_dict(model_cfg))
        if metrics is not None:
            metrics = {k: float(v) for k, v in metrics.items()}
        self.mngr.save(step, args=ocp.args.Composite(**parts),
                       metrics=metrics)
        self.mngr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the same NamedTuple type as `state` (used as the
        shape/dtype template).  Returns None when no checkpoint exists."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(dict(state._asdict()))
            ),
        )
        return type(state)(**restored["state"])


def fit(
    model_cfg: MatchaConfig,
    train_cfg: TrainConfig,
    train_filelist: str,
    val_filelist: str,
    work_dir: str = "runs/matcha",
    max_steps: Optional[int] = None,
    mesh=None,
    resume: bool = True,
):
    """Data-parallel training driver.

    With a mesh, batches are sharded over the "data" axis and parameters
    replicated; XLA all-reduces gradients over ICI — the TPU-native DDP.
    """
    work = Path(work_dir)
    logger = MetricsLogger(work)
    ckpt = Checkpointer(work / "ckpt", keep=train_cfg.ckpt_keep,
                        monitor="loss")

    train_ds = TextMelDataset(train_filelist, model_cfg.audio, model_cfg.n_spks,
                              seed=train_cfg.seed)
    val_ds = TextMelDataset(val_filelist, model_cfg.audio, model_cfg.n_spks,
                            seed=train_cfg.seed)
    train_batches = BucketBatcher(train_ds, train_cfg, shuffle=True,
                                  seed=train_cfg.seed, drop_last=True)
    val_batches = BucketBatcher(val_ds, train_cfg, shuffle=False)

    key = jax.random.PRNGKey(train_cfg.seed)
    k_init, k_train = jax.random.split(key)
    params = init_matcha(k_init, model_cfg)
    state = create_train_state(params, train_cfg)

    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"Resumed from step {int(state.step)}")

    if mesh is not None:
        state = pmesh.replicate(mesh, state)

    if len(train_ds) == 0:
        raise ValueError(f"empty training filelist: {train_filelist}")
    steps_per_epoch = max(1, len(train_ds) // train_cfg.batch_size)
    total_steps = max_steps or steps_per_epoch * train_cfg.max_epochs

    step = int(state.step)
    t0 = time.time()
    shutdown = GracefulShutdown()
    with shutdown:
        step, state = _fit_loop(shutdown, step, total_steps, state, k_train,
                                train_batches, val_batches, model_cfg,
                                train_cfg, mesh, ckpt, logger, t0)
    if ckpt.mngr.latest_step() != step:
        # on preemption keep the val pass short — the grace period is the
        # budget for the whole save, not a 16-batch eval
        val_metrics = evaluate(state.params, val_batches, model_cfg,
                               train_cfg, mesh,
                               max_batches=2 if shutdown.requested else 16)
        logger.log(step, "val", val_metrics)
        ckpt.save(step, jax.device_get(state), model_cfg,
                  metrics=val_metrics)
    if shutdown.requested:
        print(f"[shutdown] checkpointed at step {step}; rerun with the same "
              f"work_dir to resume", flush=True)
    return state


def _fit_loop(shutdown, step, total_steps, state, k_train, train_batches,
              val_batches, model_cfg, train_cfg, mesh, ckpt, logger, t0):
    while step < total_steps and not shutdown.requested:
        # background thread overlaps host WAV loading/padding with the
        # device step (the reference uses 8 DataLoader worker processes)
        for raw in PrefetchIterator(iter(train_batches), depth=2):
            if step >= total_steps or shutdown.requested:
                break
            if mesh is not None:
                raw = pmesh.shard_batch(mesh, raw)
            batch = featurize_batch(raw, model_cfg)
            state, metrics = train_step(state, k_train, batch, model_cfg,
                                        train_cfg)
            step += 1
            if step % train_cfg.log_every_n_steps == 0:
                # failure detection: a non-finite loss means the run is
                # poisoned — stop loudly instead of writing NaN checkpoints
                # (the reference has no such guard, SURVEY.md §5)
                loss_val = float(metrics["loss"])
                if not np.isfinite(loss_val):
                    ckpt.save(step, jax.device_get(state), model_cfg)
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at step {step}; "
                        f"state checkpointed for post-mortem"
                    )
                dt = time.time() - t0
                frames = int(np.sum(np.asarray(raw["y_lengths"])))
                logger.log(step, "train", metrics,
                           {"sec_per_step": dt / train_cfg.log_every_n_steps,
                            "frames_in_batch": frames})
                t0 = time.time()
            if step % train_cfg.ckpt_every_n_steps == 0:
                # val first, so the checkpoint is ranked by val loss for
                # best-k retention (reference monitors val/loss,
                # train_standalone.py:850-857)
                val_metrics = evaluate(state.params, val_batches, model_cfg,
                                       train_cfg, mesh)
                logger.log(step, "val", val_metrics)
                ckpt.save(step, jax.device_get(state), model_cfg,
                          metrics=val_metrics)
    return step, state


def evaluate(params, val_batches, model_cfg, train_cfg, mesh=None,
             max_batches: int = 16):
    sums, n = {}, 0
    key = jax.random.PRNGKey(0)
    for i, raw in enumerate(val_batches):
        if i >= max_batches:
            break
        if mesh is not None:
            raw = pmesh.shard_batch(mesh, raw)
        batch = featurize_batch(raw, model_cfg)
        m = eval_step(params, jax.random.fold_in(key, i), batch, model_cfg,
                      train_cfg.prior_loss)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}
