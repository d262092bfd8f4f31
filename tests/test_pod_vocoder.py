"""Pod-sharded vocoder: exact equivalence with the single-device pass on
the 8-device CPU mesh (sequence-parallel inference over ICI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.inference.pod_vocoder import pod_vocode
from matcha_tts_tpu.inference.streaming import receptive_radius_frames
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.parallel import mesh as pmesh


def small_cfg():
    return HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=8,
    )


def test_pod_vocode_exact_vs_single_device():
    cfg = small_cfg()
    r = receptive_radius_frames(cfg)
    p = hifigan.init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 8 * max(2 * r, 24)  # divisible by 8, span >= 2r
    mel = rng.standard_normal((t, cfg.num_mels)).astype(np.float32)

    want = np.clip(
        np.asarray(hifigan.generator(p, jnp.asarray(mel[None]), cfg)[0]),
        -1.0, 1.0)

    for n in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(n)
        got = np.asarray(pod_vocode(p, jnp.asarray(mel), mesh, cfg))
        assert got.shape == want.shape == (t * cfg.total_upsample,)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"n_devices={n}")


def test_pod_vocode_validation():
    cfg = small_cfg()
    p = hifigan.init_generator(jax.random.PRNGKey(1), cfg)
    mesh = pmesh.make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        pod_vocode(p, jnp.zeros((100, cfg.num_mels)), mesh, cfg)
    with pytest.raises(ValueError, match="span"):
        pod_vocode(p, jnp.zeros((8 * 8, cfg.num_mels)), mesh, cfg)
