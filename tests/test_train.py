"""Training-step tests: losses finite, gradients flow, DP sharding works
on the 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import (
    AudioConfig,
    CFMConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MatchaConfig,
    TrainConfig,
)
from matcha_tts_tpu.models.matcha import init_matcha
from matcha_tts_tpu.parallel import mesh as pmesh
from matcha_tts_tpu.train.losses import log_gaussian_prior, matcha_losses
from matcha_tts_tpu.train.train_state import create_train_state, train_step


def tiny_cfg():
    return MatchaConfig(
        n_vocab=50,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=1, kernel_size=3,
                              p_dropout=0.1),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
        cfm=CFMConfig(),
        audio=AudioConfig(n_mels=8),
    )


def tiny_batch(rng, b=8, t_x=12, t_y=24, n_feats=8):
    return {
        "x": jnp.asarray(rng.integers(1, 50, size=(b, t_x)), jnp.int32),
        "x_lengths": jnp.asarray(rng.integers(6, t_x + 1, size=(b,)), jnp.int32),
        "y": jnp.asarray(rng.standard_normal((b, t_y, n_feats)), jnp.float32),
        "y_lengths": jnp.asarray(rng.integers(t_x, t_y + 1, size=(b,)), jnp.int32),
    }


def test_log_gaussian_prior_matches_direct():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal((2, 5, 8)).astype(np.float32)
    y = rng.standard_normal((2, 9, 8)).astype(np.float32)
    lp = np.asarray(log_gaussian_prior(jnp.asarray(mu), jnp.asarray(y), 8))
    # direct: log N(y; mu, I) summed over feature dim
    direct = np.zeros((2, 5, 9), np.float32)
    for b in range(2):
        for i in range(5):
            for j in range(9):
                d = y[b, j] - mu[b, i]
                direct[b, i, j] = -0.5 * (d @ d) - 0.5 * np.log(2 * np.pi) * 8
    np.testing.assert_allclose(lp, direct, atol=1e-3)


def test_losses_finite_and_grad_flows():
    cfg = tiny_cfg()
    rng = np.random.default_rng(1)
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(rng)

    def scalar_loss(p):
        out = matcha_losses(p, jax.random.PRNGKey(1), batch["x"],
                            batch["x_lengths"], batch["y"], batch["y_lengths"],
                            cfg, train=False)
        return out.total, out

    (loss, out), grads = jax.value_and_grad(scalar_loss, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(out.dur_loss))
    assert np.isfinite(float(out.prior_loss))
    assert np.isfinite(float(out.cfm_loss))
    flat = jax.tree.leaves(grads)
    total_norm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in flat)))
    assert total_norm > 0 and np.isfinite(total_norm)
    # mel_mean/std buffers get zero gradient (used only at inference)
    assert float(jnp.abs(grads["mel_mean"])) == 0.0
    # duration predictor grads exist despite stop-gradient on its input
    dp_norm = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(g))
                     for g in jax.tree.leaves(grads["encoder"]["proj_w"])))
    )
    assert dp_norm > 0


def test_train_step_decreases_loss():
    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3)
    rng = np.random.default_rng(2)
    params = init_matcha(jax.random.PRNGKey(2), cfg)
    state = create_train_state(params, tcfg)
    batch = tiny_batch(rng)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(5):
        state, metrics = train_step(state, key, batch, cfg, tcfg)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 5


def test_data_parallel_matches_single_device():
    """The DP-sharded step must produce the same update as unsharded.
    fp32: this tests sharding equivalence, and bf16 rounding amplifies
    cross-device reduction-order noise past tight tolerances."""
    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                       mixed_precision=False)
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng)
    key = jax.random.PRNGKey(5)

    # init twice: train_step donates its input state's buffers
    state1 = create_train_state(init_matcha(jax.random.PRNGKey(4), cfg), tcfg)
    state1, m1 = train_step(state1, key, batch, cfg, tcfg)

    mesh = pmesh.make_mesh(8)
    state2 = create_train_state(init_matcha(jax.random.PRNGKey(4), cfg), tcfg)
    state2 = pmesh.replicate(mesh, state2)
    sharded = pmesh.shard_batch(mesh, batch)
    state2, m2 = train_step(state2, key, sharded, cfg, tcfg)

    # tolerances absorb fp reduction-order differences across devices
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(jax.device_get(state1.params))
    l2 = jax.tree.leaves(jax.device_get(state2.params))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_multi_speaker_path():
    cfg_dict = tiny_cfg().__dict__.copy()
    cfg_dict["n_spks"] = 4
    cfg_dict["spk_emb_dim"] = 8
    cfg = MatchaConfig(**cfg_dict)
    rng = np.random.default_rng(4)
    params = init_matcha(jax.random.PRNGKey(6), cfg)
    assert "spk_emb" in params
    batch = tiny_batch(rng)
    batch["spks"] = jnp.asarray(rng.integers(0, 4, size=(8,)), jnp.int32)
    out = matcha_losses(params, jax.random.PRNGKey(7), batch["x"],
                        batch["x_lengths"], batch["y"], batch["y_lengths"],
                        cfg, spks=batch["spks"], train=False)
    assert np.isfinite(float(out.total))


def test_multislice_mesh_matches_single_mesh():
    """2x4 ("dcn", "data") mesh: batch sharded over both axes; one
    train_step must produce the same loss as the 1-D 8-device mesh
    (pure DP is layout-invariant)."""
    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                       mixed_precision=False)

    losses = {}
    for name, mesh in (("1d", pmesh.make_mesh(8)),
                       ("2x4", pmesh.make_multislice_mesh(2))):
        assert mesh.devices.size == 8
        # fresh init per run: train_step donates its input state's buffers
        params = init_matcha(jax.random.PRNGKey(0), cfg)
        batch = tiny_batch(np.random.default_rng(9))
        state = create_train_state(params, tcfg)
        state = pmesh.replicate(mesh, state)
        sharded = pmesh.shard_batch(mesh, batch)
        state, metrics = train_step(state, jax.random.PRNGKey(1), sharded,
                                    cfg, tcfg)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
    np.testing.assert_allclose(losses["1d"], losses["2x4"], rtol=1e-5)


def test_mixed_precision_step_runs_and_tracks_fp32():
    """bf16 mixed-precision training (the default, mirroring the
    reference's "16-mixed") must run under grad and stay close to the
    fp32 step for one update."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng)
    key = jax.random.PRNGKey(11)

    outs = {}
    for mp_flag in (False, True):
        tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                           mixed_precision=mp_flag)
        state = create_train_state(init_matcha(jax.random.PRNGKey(4), cfg),
                                   tcfg)
        state, m = train_step(state, key, batch, cfg, tcfg)
        assert np.isfinite(float(m["loss"]))
        # master weights stay fp32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(state.params)
                   if hasattr(l, "dtype") and l.dtype.kind == "f")
        outs[mp_flag] = float(m["loss"])
    # bf16 loss within ~1% of fp32 (same data, same key)
    assert abs(outs[True] - outs[False]) / abs(outs[False]) < 0.02, outs


def test_multislice_mesh_validation():
    import pytest

    with pytest.raises(ValueError, match="do not split"):
        pmesh.make_multislice_mesh(3)  # 8 devices don't split into 3
    # explicit per_slice subset is allowed
    mesh = pmesh.make_multislice_mesh(3, per_slice=2)
    assert mesh.devices.size == 6
