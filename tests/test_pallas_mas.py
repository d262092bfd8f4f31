"""Pallas MAS kernel vs the scalar NumPy oracle (interpret mode on CPU).

Hardware exactness at the LJSpeech training shape is additionally
asserted by benchmarks/mas_bench.py --impl pallas on the TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matcha_tts_tpu.ops.mas import maximum_path, maximum_path_numpy
from matcha_tts_tpu.ops.masking import sequence_mask
from matcha_tts_tpu.ops.pallas.mas import mas_pallas_ok, maximum_path_pallas


def _case(rng, b, t_x, t_y):
    value = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    xl = rng.integers(1, t_x + 1, size=(b,))
    yl = np.maximum(rng.integers(1, t_y + 1, size=(b,)), xl)
    x_mask = np.asarray(sequence_mask(jnp.asarray(xl, jnp.int32), t_x))
    y_mask = np.asarray(sequence_mask(jnp.asarray(yl, jnp.int32), t_y))
    mask = (x_mask[:, :, None] * y_mask[:, None, :]).astype(np.float32)
    return value, mask


@pytest.mark.parametrize("b,t_x,t_y", [(3, 7, 11), (2, 16, 24), (8, 24, 64),
                                       (5, 128, 130)])
def test_pallas_mas_matches_oracle(b, t_x, t_y):
    rng = np.random.default_rng(b * 100 + t_x)
    value, mask = _case(rng, b, t_x, t_y)
    want = maximum_path_numpy(value, mask)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value),
                                         jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_mas_matches_scan_impl():
    rng = np.random.default_rng(0)
    value, mask = _case(rng, 4, 33, 80)
    scan = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask),
                                   impl="scan"))
    pallas = np.asarray(maximum_path_pallas(jnp.asarray(value),
                                            jnp.asarray(mask),
                                            interpret=True))
    np.testing.assert_array_equal(pallas, scan)


def test_shape_gate():
    assert mas_pallas_ok(32, 256, 768)
    assert mas_pallas_ok(64, 256, 768)          # large batch: smaller chunk
    assert not mas_pallas_ok(32, 256, 100)     # t_y < t_x
    assert not mas_pallas_ok(4096, 2048, 4096)  # column exceeds VMEM budget


def test_pick_chunk_respects_vmem_budget():
    # Chunk 64 at batch 64 x T_x 256 allocates 24 MB of scoped VMEM on TPU
    # (measured AOT-compile failure); the picker must halve it, and every
    # gate-passing shape must fit the budget model.
    from matcha_tts_tpu.ops.pallas.mas import (
        _col_bytes, _pick_chunk, _PIPELINE_BLOCKS, _VMEM_BUDGET)

    assert _pick_chunk(32, 256) == 64   # the measured-good round-1 shape
    assert _pick_chunk(64, 256) == 32   # the measured-OOM shape, halved
    assert _pick_chunk(128, 256) == 16
    for b, t_x in [(8, 128), (32, 256), (64, 256), (128, 512), (256, 512)]:
        if mas_pallas_ok(b, t_x, max(t_x, 1024)):
            chunk = _pick_chunk(b, t_x)
            used = _PIPELINE_BLOCKS * chunk * _col_bytes(b, t_x) \
                + _col_bytes(b, t_x)
            assert used <= _VMEM_BUDGET, (b, t_x, chunk, used)


def test_pallas_mas_large_batch_small_chunk_matches_oracle():
    # batch 64 triggers chunk=32 (< the 64-column max): exercise the
    # adaptive-chunk path end to end in interpret mode.
    from matcha_tts_tpu.ops.pallas.mas import _pick_chunk

    assert _pick_chunk(64, 256) < 64
    rng = np.random.default_rng(7)
    value, mask = _case(rng, 64, 256, 320)
    want = maximum_path_numpy(value, mask)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value),
                                         jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_auto_impl_on_cpu_uses_scan():
    # on the CPU backend "auto" must stay on the portable scan path
    rng = np.random.default_rng(1)
    value, mask = _case(rng, 2, 9, 15)
    out = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(out, want)
