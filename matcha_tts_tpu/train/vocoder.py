"""HiFi-GAN vocoder training / fine-tuning.

The reference vendors the full HiFi-GAN model zoo — generator, MPD/MSD
discriminators, feature-matching and LS-GAN losses, and a mel dataset with
random segment cropping — but ships no vocoder trainer (the generator is
loaded pretrained; hifigan/models.py:209-368, hifigan/meldataset.py:105-165).
This module makes those pieces trainable TPU-natively: jitted generator /
discriminator steps with AdamW(0.8, 0.99) + exponential LR decay per the
vendored config (hifigan/config.py:4-8).

Data parallelism: the steps are pure jitted functions, so DP over a mesh
is the standard recipe (the vendored config names a distributed backend,
hifigan/config.py:27) — `pmesh.replicate(mesh, state)` once, then
`pmesh.shard_batch(mesh, audio)` per step; XLA derives the gradient
all-reduce from the shardings (see train/vocoder_cli.py --data_parallel
and tests/test_vocoder_train.py::test_gan_pair_step_data_parallel_matches
_single_device).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tts_tpu.config import AudioConfig, HiFiGANConfig
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.models import vocoder as vocoder_mod
from matcha_tts_tpu.ops.stft import log_mel_spectrogram
from matcha_tts_tpu.train import weight_norm as wn


class GanTrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: dict
    disc_params: dict  # one entry per family, e.g. {"mpd": ..., "msd": ...}
    gen_opt: optax.OptState
    disc_opt: optax.OptState


def make_gan_optimizers(learning_rate: float = 2e-4, b1: float = 0.8,
                        b2: float = 0.99, lr_decay: float = 0.999,
                        decay_every: int = 1000,
                        grad_clip: Optional[float] = None):
    """Adam(b1=0.8, b2=0.99) with exponential decay, per hifigan/config.py.

    `grad_clip` adds global-norm clipping before Adam: GAN training on
    sparse/silence-heavy corpora can spike gradients into NaN (measured
    round 4: full-size Vocos+MPD/MRD on the tone corpus diverged at step
    ~1100 with lr 2e-4); pass the same value to create_gan_state and the
    step functions (it changes the opt-state pytree structure)."""
    sched = optax.exponential_decay(learning_rate, decay_every, lr_decay)

    def tx():
        opt = optax.adam(sched, b1=b1, b2=b2)
        if grad_clip is not None:
            # apply_if_finite: a single inf/NaN-gradient step is SKIPPED
            # instead of poisoning Adam state + params (clipping alone
            # cannot save such a step: the global norm is inf and the
            # scale becomes NaN)
            return optax.apply_if_finite(
                optax.chain(optax.clip_by_global_norm(grad_clip), opt),
                max_consecutive_errors=32)
        return opt

    return tx(), tx()


def _disc_registry():
    from matcha_tts_tpu.models import vocos

    return {
        "mpd": (hifigan.init_mpd, hifigan.mpd),
        "msd": (hifigan.init_msd, hifigan.msd),
        "mrd": (vocos.init_mrd, vocos.mrd),
    }


def _disc_forward_all(disc_params: dict, y: jnp.ndarray, y_hat: jnp.ndarray):
    """Run every discriminator family present in the state (dict keys are
    static pytree structure, so the set of families is baked at trace)."""
    reg = _disc_registry()
    return {name: reg[name][1](disc_params[name], y, y_hat)
            for name in sorted(disc_params)}


def create_gan_state(key, hcfg: HiFiGANConfig, learning_rate: float = 2e-4,
                     use_weight_norm: bool = False,
                     gen_params=None,
                     discriminators: Tuple[str, ...] = ("mpd", "msd"),
                     grad_clip: Optional[float] = None,
                     ) -> GanTrainState:
    """`use_weight_norm=True` stores generator and discriminators in the
    reference's (v, g) training parameterization (train/weight_norm.py);
    pass matching `weight_norm` to the step functions.  `gen_params` seeds
    fine-tuning from an existing (plain) generator tree.

    `discriminators` picks the adversary families: ("mpd", "msd") is the
    HiFi-GAN recipe (hifigan/models.py:209-334); ("mpd", "mrd") is the
    Vocos/UnivNet pairing (models/vocos.py::mrd).  The step functions
    dispatch on the state's keys — no extra arguments needed."""
    reg = _disc_registry()
    unknown = set(discriminators) - set(reg)
    if unknown:
        raise ValueError(f"unknown discriminator families {sorted(unknown)}; "
                         f"available: {sorted(reg)}")
    kg, *dkeys = jax.random.split(key, 1 + len(discriminators))
    gen = (gen_params if gen_params is not None
           else vocoder_mod.init_vocoder(kg, hcfg))
    disc = {name: reg[name][0](k) for name, k in zip(discriminators, dkeys)}
    if use_weight_norm:
        gen = wn.decompose(gen)
        disc = wn.decompose(disc)
    g_tx, d_tx = make_gan_optimizers(learning_rate, grad_clip=grad_clip)
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen,
        disc_params=disc,
        gen_opt=g_tx.init(gen),
        disc_opt=d_tx.init(disc),
    )


def random_segment(key, audio: np.ndarray, segment_size: int,
                   hop: int) -> Tuple[np.ndarray, int]:
    """Random crop to `segment_size` samples aligned to the hop (the
    reference's MelDataset cropping, hifigan/meldataset.py:140-152)."""
    if len(audio) <= segment_size:
        out = np.zeros(segment_size, np.float32)
        out[: len(audio)] = audio
        return out, 0
    max_start = (len(audio) - segment_size) // hop
    start = int(jax.random.randint(key, (), 0, max_start + 1)) * hop
    return audio[start : start + segment_size], start


def random_segment_np(rng: np.random.Generator, audio: np.ndarray,
                      segment_size: int, hop: int) -> np.ndarray:
    """`random_segment` with a host NumPy Generator: one eager jax.random
    op per item costs ~30 ms on a tunneled TPU, so training drivers that
    crop on the host per step use this variant (same zero-pad + hop-
    aligned semantics)."""
    if len(audio) <= segment_size:
        out = np.zeros(segment_size, np.float32)
        out[: len(audio)] = audio
        return out
    max_start = (len(audio) - segment_size) // hop
    start = int(rng.integers(0, max_start + 1)) * hop
    return audio[start : start + segment_size]


def _check_clip(state: GanTrainState, grad_clip: Optional[float]):
    """Trace-time guard: `grad_clip` changes the opt-state pytree (the
    apply_if_finite wrapper), and create_gan_state / the step functions
    take it independently — a mismatched pair would otherwise surface as
    an opaque optax tree-structure error deep in `tx.update` (ADVICE r4).
    Derive the truth from the state's own opt-state structure."""
    has_clip = isinstance(state.gen_opt, optax.ApplyIfFiniteState)
    if has_clip != (grad_clip is not None):
        raise ValueError(
            f"state was created with "
            f"{'grad_clip set' if has_clip else 'grad_clip=None'} but the "
            f"step was called with grad_clip={grad_clip}; pass the same "
            f"grad_clip to create_gan_state and the step functions (it "
            f"changes the optimizer-state pytree)")


def _check_wn(state: GanTrainState, weight_norm: bool):
    """Trace-time guard: the step's `weight_norm` flag must match how the
    state was created (`create_gan_state(use_weight_norm=...)`)."""
    actual = wn.is_weight_norm(state.gen_params)
    if actual != weight_norm:
        raise ValueError(
            f"state is {'(v, g) weight-norm' if actual else 'plain'}-"
            f"parameterized but the step was called with "
            f"weight_norm={weight_norm}")


def _xla_generator_cfg(hcfg):
    """Training differentiates through the generator; the packed MRF
    Pallas kernels have no VJP, so the train steps pin the XLA conv path
    (batched GAN training is MXU-bound — the kernels target batch-1
    latency anyway).  Vocos configs pass through (pure XLA already)."""
    if not isinstance(hcfg, HiFiGANConfig):
        return hcfg
    if getattr(hcfg, "mrf_kernel", "xla") == "xla" and not hcfg.use_pallas:
        return hcfg
    return dataclasses.replace(hcfg, mrf_kernel="xla", use_pallas=False,
                               int8_levels=None)


def _mel(audio, acfg: AudioConfig):
    return log_mel_spectrogram(
        audio, acfg.sample_rate, acfg.n_fft, acfg.n_mels, acfg.hop_length,
        acfg.win_length, acfg.f_min, acfg.f_max,
    )


def _mel_full_band(audio, acfg: AudioConfig):
    """Loss mel: full band to Nyquist, per the recipe's fmax_for_loss=None
    (hifigan/config.py:25 -> meldataset.py mel_spectrogram with fmax=None).
    Generator *input* mels stay at the acoustic band (acfg.f_max)."""
    return log_mel_spectrogram(
        audio, acfg.sample_rate, acfg.n_fft, acfg.n_mels, acfg.hop_length,
        acfg.win_length, acfg.f_min, acfg.sample_rate / 2.0,
    )


@functools.partial(jax.jit, static_argnames=("hcfg", "acfg", "lr",
                                             "weight_norm", "grad_clip"))
def gan_disc_step(state: GanTrainState, audio: jnp.ndarray,
                  hcfg: HiFiGANConfig, acfg: AudioConfig, lr: float = 2e-4,
                  weight_norm: bool = False,
                  grad_clip: Optional[float] = None):
    """Discriminator update (LS-GAN): real audio vs generator(mel(real))."""
    _check_wn(state, weight_norm)
    _check_clip(state, grad_clip)
    hcfg = _xla_generator_cfg(hcfg)
    gen_plain = wn.fold(state.gen_params) if weight_norm else state.gen_params
    mel = _mel(audio, acfg).transpose(0, 2, 1)
    fake = vocoder_mod.generate(gen_plain, mel, hcfg)
    fake = jax.lax.stop_gradient(fake)
    n = min(audio.shape[-1], fake.shape[-1])

    def loss_fn(disc_params):
        if weight_norm:
            disc_params = wn.fold(disc_params)
        outs = _disc_forward_all(disc_params, audio[..., :n], fake[..., :n])
        return sum(hifigan.discriminator_loss(o[0], o[1])[0]
                   for o in outs.values())

    loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
    _, d_tx = make_gan_optimizers(lr, grad_clip=grad_clip)
    updates, new_opt = d_tx.update(grads, state.disc_opt, state.disc_params)
    new_disc = optax.apply_updates(state.disc_params, updates)
    return state._replace(disc_params=new_disc, disc_opt=new_opt), loss


@functools.partial(jax.jit, static_argnames=("hcfg", "acfg", "lr",
                                             "weight_norm", "grad_clip"))
def gan_gen_step(state: GanTrainState, audio: jnp.ndarray,
                 hcfg: HiFiGANConfig, acfg: AudioConfig, lr: float = 2e-4,
                 weight_norm: bool = False,
                 grad_clip: Optional[float] = None):
    """Generator update: LS-GAN + feature matching + 45x mel L1 (the
    standard HiFi-GAN recipe the vendored losses implement)."""
    _check_wn(state, weight_norm)
    _check_clip(state, grad_clip)
    hcfg = _xla_generator_cfg(hcfg)
    mel_real = _mel(audio, acfg)
    disc_plain = (wn.fold(state.disc_params) if weight_norm
                  else state.disc_params)

    mel_real_full = _mel_full_band(audio, acfg)

    def loss_fn(gen_params):
        if weight_norm:
            gen_params = wn.fold(gen_params)
        fake = vocoder_mod.generate(gen_params, mel_real.transpose(0, 2, 1),
                                    hcfg)
        n = min(audio.shape[-1], fake.shape[-1])
        mel_fake = _mel_full_band(fake[..., :n], acfg)
        mel_loss = jnp.mean(jnp.abs(
            mel_fake - mel_real_full[..., : mel_fake.shape[-1]]))

        outs = _disc_forward_all(disc_plain, audio[..., :n], fake[..., :n])
        fm = sum(hifigan.feature_loss(o[2], o[3]) for o in outs.values())
        adv = sum(hifigan.generator_loss(o[1])[0] for o in outs.values())
        total = adv + fm + 45.0 * mel_loss
        return total, (mel_loss, fm)

    (loss, (mel_loss, fm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.gen_params
    )
    g_tx, _ = make_gan_optimizers(lr, grad_clip=grad_clip)
    updates, new_opt = g_tx.update(grads, state.gen_opt, state.gen_params)
    new_gen = optax.apply_updates(state.gen_params, updates)
    new_state = state._replace(gen_params=new_gen, gen_opt=new_opt,
                               step=state.step + 1)
    return new_state, {"gen_loss": loss, "mel_l1": mel_loss, "fm_loss": fm}
