"""Few-step distillation of the CFM decoder (NFE 10 -> 1-2).

The reference samples with a fixed-step Euler loop at NFE=10
(/root/reference/model.py:1089-1094); nothing in it addresses few-step
sampling.  This module distills the trained flow field into a student
estimator that matches the teacher's ODE *endpoints* in 1-2 steps — new
capability on top of reference behavior (SURVEY.md §7 "beyond parity",
docs/ROADMAP.md).

Two objectives, both text-only (no audio: conditioning `mu_y` and targets
come from the frozen teacher, so any text corpus distills a checkpoint):

* ``reflow`` (default) — rectified-flow distillation (Liu et al. 2022,
  "Flow Straight and Fast").  Teacher trajectories give endpoint pairs
  (z0, x1); the student learns the *straight* field along
  z_t = (1-(1-sigma)t) z0 + t x1 with target u = x1 - (1-sigma) z0 — the
  same path convention as training (model.py:1147-1162), so the student
  is a drop-in estimator for the existing Euler sampler at low NFE.

* ``consistency`` — consistency distillation (Song et al. 2023).  The
  one-step-to-data map f(z, t) = z + (1-t) v(z, t) is made invariant
  along the teacher ODE: f_student(z_t, t) must match an EMA student's
  f(z_{t'}, t') one teacher Euler step ahead.  f(z, 0) is exactly Euler
  NFE=1, so inference again needs no new code path.

The student is initialized from the teacher and shares its parameter
tree, checkpoint format, and the whole inference stack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tts_tpu.config import MatchaConfig
from matcha_tts_tpu.models import cfm, nn
from matcha_tts_tpu.models.matcha import estimator_fn
from matcha_tts_tpu.models.text_encoder import text_encoder
from matcha_tts_tpu.ops.masking import generate_path, sequence_mask


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    loss: str = "reflow"            # "reflow" | "consistency"
    nfe_teacher: int = 16           # teacher ODE steps for targets
    nfe_student: int = 2            # target student step count
    # "grid" samples t from the student's own Euler grid {i/nfe_student} —
    # capacity goes exactly where the few-step sampler evaluates the field;
    # "uniform" is classic rectified flow (any-NFE student).
    t_sampling: str = "grid"
    temperature: float = 1.0        # noise scale for trajectory starts
    ema_decay: float = 0.995        # consistency target network decay
    learning_rate: float = 1e-4
    grad_clip_norm: float = 5.0
    length_scale: float = 1.0


class DistillState(NamedTuple):
    step: jnp.ndarray
    params: dict                    # student (trainable)
    ema_params: dict                # consistency target / final weights
    opt_state: optax.OptState


def _optimizer(dcfg: DistillConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(dcfg.grad_clip_norm),
        optax.adam(dcfg.learning_rate),
    )


def create_distill_state(teacher_params, dcfg: DistillConfig) -> DistillState:
    student = jax.tree_util.tree_map(jnp.array, teacher_params)
    return DistillState(
        step=jnp.zeros((), jnp.int32),
        params=student,
        ema_params=jax.tree_util.tree_map(jnp.array, student),
        opt_state=_optimizer(dcfg).init(student),
    )


def expand_conditioning(params, x, x_lengths, cfg: MatchaConfig, t_y_max: int,
                        length_scale: float = 1.0, spks=None):
    """Teacher encoder + duration expansion -> (mu_y, y_mask, spk_emb).

    Mirrors the first half of `synthesize` (model.py:1270-1289): tokens ->
    mu, log-durations -> ceil -> binary path -> aligned conditioning.
    """
    spk_emb = None
    if cfg.n_spks > 1 and spks is not None:
        spk_emb = nn.embedding(params["spk_emb"], spks)
    mu, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                    cfg.encoder, cfg.duration_predictor,
                                    spk_emb=spk_emb, rng=None)
    logw = logw.astype(jnp.float32)
    x_mask = x_mask.astype(jnp.float32)
    w_ceil = jnp.ceil(jnp.exp(logw[..., 0]) * x_mask * length_scale)
    y_lengths = jnp.minimum(
        jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0).astype(jnp.int32), t_y_max)
    y_mask = sequence_mask(y_lengths, t_y_max).astype(jnp.float32)
    attn = generate_path(w_ceil, x_mask[:, :, None] * y_mask[:, None, :])
    mu_y = jnp.einsum("bxy,bxc->byc", attn, mu)
    return mu_y, y_mask, spk_emb


def _teacher_endpoints(teacher_params, key, mu_y, y_mask, cfg: MatchaConfig,
                       dcfg: DistillConfig, spk_emb=None):
    """(z0, x1): noise starts and their teacher ODE solutions (stop-grad)."""
    z0 = jax.random.normal(key, mu_y.shape, jnp.float32) * dcfg.temperature
    est_t = estimator_fn(teacher_params, cfg, spk_emb=spk_emb, rng=None)
    x1 = cfm.solve(est_t, z0, y_mask, mu_y, dcfg.nfe_teacher,
                   solver=cfg.cfm.solver)
    return jax.lax.stop_gradient(z0), jax.lax.stop_gradient(x1)


def _sample_t(key, b: int, dcfg: DistillConfig) -> jnp.ndarray:
    if dcfg.t_sampling == "grid":
        idx = jax.random.randint(key, (b, 1, 1), 0, dcfg.nfe_student)
        return idx.astype(jnp.float32) / dcfg.nfe_student
    if dcfg.t_sampling == "uniform":
        return jax.random.uniform(key, (b, 1, 1), jnp.float32)
    raise ValueError(f"unknown t_sampling {dcfg.t_sampling!r}")


def reflow_loss(student_params, key, z0, x1, y_mask, mu_y, cfg: MatchaConfig,
                dcfg: DistillConfig, spk_emb=None):
    """Masked straight-field MSE along teacher endpoint pairs."""
    sigma = cfg.cfm.sigma_min
    b = z0.shape[0]
    t = _sample_t(key, b, dcfg)
    z_t = (1.0 - (1.0 - sigma) * t) * z0 + t * x1
    u = x1 - (1.0 - sigma) * z0
    est = estimator_fn(student_params, cfg, spk_emb=spk_emb, rng=None)
    pred = est(z_t, y_mask, mu_y, t[:, 0, 0])
    sq = jnp.square(pred - u) * y_mask[..., None]
    return jnp.sum(sq) / (jnp.sum(y_mask) * u.shape[-1])


def consistency_loss(student_params, ema_params, teacher_params, key,
                     z0, x1, y_mask, mu_y, cfg: MatchaConfig,
                     dcfg: DistillConfig, spk_emb=None):
    """CD objective on the one-step-to-data map f(z, t) = z + (1-t) v(z, t).

    z_t is taken on the training path at a random grid time, stepped once
    with the *teacher* field; the EMA student one step ahead is the target.
    """
    sigma = cfg.cfm.sigma_min
    b = z0.shape[0]
    n = dcfg.nfe_teacher
    idx = jax.random.randint(key, (b,), 0, n)  # grid times t_i = i/n
    t = (idx.astype(jnp.float32) / n)[:, None, None]
    dt = 1.0 / n
    z_t = (1.0 - (1.0 - sigma) * t) * z0 + t * x1

    est_teacher = estimator_fn(teacher_params, cfg, spk_emb=spk_emb, rng=None)
    v_t = est_teacher(z_t, y_mask, mu_y, t[:, 0, 0])
    z_next = jax.lax.stop_gradient(z_t + dt * v_t)
    t_next = t[:, 0, 0] + dt

    est_s = estimator_fn(student_params, cfg, spk_emb=spk_emb, rng=None)
    f_s = z_t + (1.0 - t[:, 0, 0])[:, None, None] * est_s(
        z_t, y_mask, mu_y, t[:, 0, 0])

    est_e = estimator_fn(ema_params, cfg, spk_emb=spk_emb, rng=None)
    f_e = z_next + (1.0 - t_next)[:, None, None] * est_e(
        z_next, y_mask, mu_y, t_next)
    f_e = jax.lax.stop_gradient(f_e)

    sq = jnp.square(f_s - f_e) * y_mask[..., None]
    return jnp.sum(sq) / (jnp.sum(y_mask) * f_s.shape[-1])


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dcfg", "t_y_max"),
                   donate_argnames=("state",))
def distill_step(state: DistillState, teacher_params, key, x, x_lengths,
                 cfg: MatchaConfig, dcfg: DistillConfig, t_y_max: int,
                 spks=None):
    """One distillation step from a TEXT batch (B, T_x) + lengths.

    Teacher conditioning, trajectories, student update, and EMA update run
    in one jitted graph; under a data-parallel mesh sharding XLA inserts
    the gradient all-reduce exactly as in train_state.train_step.
    """
    key = jax.random.fold_in(key, state.step)
    k_traj, k_loss = jax.random.split(key)

    mu_y, y_mask, spk_emb = expand_conditioning(
        teacher_params, x, x_lengths, cfg, t_y_max,
        length_scale=dcfg.length_scale, spks=spks)
    mu_y = jax.lax.stop_gradient(mu_y)
    z0, x1 = _teacher_endpoints(teacher_params, k_traj, mu_y, y_mask, cfg,
                                dcfg, spk_emb=spk_emb)

    if dcfg.loss == "reflow":
        def lfn(p):
            return reflow_loss(p, k_loss, z0, x1, y_mask, mu_y, cfg, dcfg,
                               spk_emb=spk_emb)
    elif dcfg.loss == "consistency":
        def lfn(p):
            return consistency_loss(p, state.ema_params, teacher_params,
                                    k_loss, z0, x1, y_mask, mu_y, cfg, dcfg,
                                    spk_emb=spk_emb)
    else:
        raise ValueError(f"unknown distill loss {dcfg.loss!r}")

    loss, grads = jax.value_and_grad(lfn)(state.params)
    tx = _optimizer(dcfg)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    d = dcfg.ema_decay
    new_ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p,
                                     state.ema_params, new_params)
    metrics = {"distill_loss": loss, "grad_norm": optax.global_norm(grads)}
    return DistillState(state.step + 1, new_params, new_ema, new_opt), metrics


@functools.partial(jax.jit, static_argnames=("cfg", "dcfg", "t_y_max",
                                             "nfe_student"))
def distill_eval(student_params, teacher_params, key, x, x_lengths,
                 cfg: MatchaConfig, dcfg: DistillConfig, t_y_max: int,
                 nfe_student: int = 1, spks=None):
    """Endpoint MSE: student at `nfe_student` vs teacher at nfe_teacher,
    from identical noise.  The number that justifies shipping NFE=1-2."""
    mu_y, y_mask, spk_emb = expand_conditioning(
        teacher_params, x, x_lengths, cfg, t_y_max,
        length_scale=dcfg.length_scale, spks=spks)
    z0, x1 = _teacher_endpoints(teacher_params, key, mu_y, y_mask, cfg, dcfg,
                                spk_emb=spk_emb)
    est_s = estimator_fn(student_params, cfg, spk_emb=spk_emb, rng=None)
    x1_s = cfm.solve(est_s, z0, y_mask, mu_y, nfe_student,
                     solver=cfg.cfm.solver)
    sq = jnp.square(x1_s - x1) * y_mask[..., None]
    return jnp.sum(sq) / (jnp.sum(y_mask) * x1.shape[-1])


def distill_fit(teacher_params, cfg: MatchaConfig, dcfg: DistillConfig,
                texts: Sequence[str], steps: int, batch_size: int = 16,
                text_bucket: int = 128, frame_bucket: int = 512,
                seed: int = 0, mesh=None, log_every: int = 10,
                callback=None) -> DistillState:
    """Distillation driver over a text corpus (no audio required).

    Returns the final state; `state.params` is a drop-in parameter tree
    for `synthesize(..., n_timesteps=1 or 2)`.  With a mesh, batches are
    sharded over the data axis like `fit()`.
    """
    from matcha_tts_tpu.text.tokenizer import encode_text

    encoded = [np.asarray(encode_text(t, add_blank=True))[:text_bucket]
               for t in texts]
    if not encoded:
        raise ValueError("distill_fit needs a non-empty text corpus")

    state = create_distill_state(teacher_params, dcfg)
    if mesh is not None:
        from matcha_tts_tpu.parallel import mesh as pmesh
        state = pmesh.replicate(mesh, state)
        teacher_params = pmesh.replicate(mesh, teacher_params)
    else:
        # Commit the frozen teacher to the device ONCE.  A host (numpy)
        # tree here is re-transferred on EVERY distill_step call — jit
        # does not cache host->device copies across calls — which both
        # wastes H2D bandwidth and, on the tunneled TPU plugin, staged
        # ~72 MB/step host-side until a full-size run was OOM-killed.
        teacher_params = jax.tree_util.tree_map(jnp.asarray, teacher_params)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    for step in range(steps):
        rows = rng.integers(0, len(encoded), size=batch_size)
        x = np.zeros((batch_size, text_bucket), np.int32)
        x_lengths = np.ones((batch_size,), np.int32)
        for r, i in enumerate(rows):
            ids = encoded[i]
            x[r, : len(ids)] = ids
            x_lengths[r] = len(ids)
        if mesh is not None:
            from matcha_tts_tpu.parallel import mesh as pmesh
            batch = pmesh.shard_batch(mesh, {"x": x, "x_lengths": x_lengths})
            x, x_lengths = batch["x"], batch["x_lengths"]
        state, metrics = distill_step(state, teacher_params, key,
                                      jnp.asarray(x), jnp.asarray(x_lengths),
                                      cfg, dcfg, frame_bucket)
        # Per-step scalar drain (doubles as a NaN guard, like fit()'s):
        # dispatch is async and each queued step stages a fresh donated
        # state copy host-side on the tunneled TPU — an undrained
        # full-size (18M) distill run grew ~80 MB/step and was OOM-killed
        # at step ~1600 (130 GB RSS).  One ~28 ms scalar fetch per step
        # keeps the queue depth at 1.
        loss_val = float(metrics["distill_loss"])
        if not np.isfinite(loss_val):
            raise FloatingPointError(
                f"non-finite distill loss at step {step + 1}")
        if callback is not None:
            callback(step, metrics)
        elif (step + 1) % log_every == 0:
            print(f"[distill {step + 1}] "
                  + " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items()))
    return state


def main(argv=None):
    """CLI: distill a checkpoint to a few-step student.

      python -m matcha_tts_tpu.train.distill --teacher matcha.ckpt \\
          --texts corpus.txt --steps 2000 --nfe-student 2 \\
          --work_dir runs/distill
    """
    import argparse

    ap = argparse.ArgumentParser(description="few-step CFM distillation")
    ap.add_argument("--teacher", default=None,
                    help="teacher checkpoint (torch .ckpt/.pt); random init "
                         "if omitted (smoke)")
    ap.add_argument("--texts", default=None,
                    help="text corpus, one utterance per line (or a "
                         "filelist with wav|text rows); built-in sample "
                         "sentences if omitted")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--loss", choices=("reflow", "consistency"),
                    default="reflow")
    ap.add_argument("--nfe-teacher", type=int, default=16)
    ap.add_argument("--nfe-student", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--text_bucket", type=int, default=128)
    ap.add_argument("--frame_bucket", type=int, default=512)
    ap.add_argument("--work_dir", default="runs/distill")
    ap.add_argument("--ckpt_every", type=int, default=500)
    args = ap.parse_args(argv)

    from matcha_tts_tpu.inference.cli import load_models
    from matcha_tts_tpu.train.loop import Checkpointer, MetricsLogger

    teacher_params, cfg, _, _ = load_models(args.teacher, None)

    if args.texts:
        lines = []
        for raw in open(args.texts, encoding="utf-8"):
            raw = raw.strip()
            if raw:
                lines.append(raw.split("|")[-1])  # filelist or plain text
        texts = lines
    else:
        texts = [
            "The birch canoe slid on the smooth planks.",
            "Glue the sheet to the dark blue background.",
            "It is easy to tell the depth of a well.",
            "These days a chicken leg is a rare dish.",
        ]

    dcfg = DistillConfig(loss=args.loss, nfe_teacher=args.nfe_teacher,
                         nfe_student=args.nfe_student,
                         learning_rate=args.lr)
    logger = MetricsLogger(args.work_dir)
    ckpt = Checkpointer(f"{args.work_dir}/ckpt")
    holder = {}

    def cb(step, metrics):
        holder["metrics"] = metrics
        if (step + 1) % 10 == 0:
            logger.log(step + 1, "distill", metrics)

    state = distill_fit(teacher_params, cfg, dcfg, texts, steps=args.steps,
                        batch_size=args.batch_size,
                        text_bucket=args.text_bucket,
                        frame_bucket=args.frame_bucket, callback=cb)
    ckpt.save(args.steps, jax.device_get(state), cfg)
    print(f"saved distilled student ({args.loss}, NFE {args.nfe_student}) "
          f"to {args.work_dir}/ckpt; use state.params with "
          f"synthesize(n_timesteps={args.nfe_student})")
    return state


if __name__ == "__main__":
    main()
