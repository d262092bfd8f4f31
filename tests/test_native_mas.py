"""Native C++ MAS kernel parity vs the NumPy oracle and the device kernel."""

import numpy as np
import pytest

from matcha_tts_tpu.native.mas_native import maximum_path_native, native_available
from matcha_tts_tpu.ops import maximum_path, maximum_path_numpy
from matcha_tts_tpu.ops.masking import sequence_mask


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for b, tx, ty in [(4, 20, 50), (3, 16, 16), (2, 2, 5), (6, 33, 77)]:
        neg_cent = rng.standard_normal((b, tx, ty)).astype(np.float32) * 2 - 4
        t_xs = rng.integers(1, tx + 1, size=b)
        t_ys = np.maximum(t_xs, rng.integers(1, ty + 1, size=b))
        x_mask = np.asarray(sequence_mask(t_xs, tx)).astype(np.float32)
        y_mask = np.asarray(sequence_mask(t_ys, ty)).astype(np.float32)
        mask = x_mask[:, :, None] * y_mask[:, None, :]
        np.testing.assert_array_equal(
            maximum_path_native(neg_cent, mask),
            maximum_path_numpy(neg_cent, mask),
            err_msg=f"{b},{tx},{ty}",
        )


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_device_kernel():
    rng = np.random.default_rng(1)
    neg_cent = rng.standard_normal((5, 24, 64)).astype(np.float32)
    t_xs = rng.integers(2, 25, size=5)
    t_ys = np.maximum(t_xs, rng.integers(2, 65, size=5))
    x_mask = np.asarray(sequence_mask(t_xs, 24)).astype(np.float32)
    y_mask = np.asarray(sequence_mask(t_ys, 64)).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    np.testing.assert_array_equal(
        maximum_path_native(neg_cent, mask),
        np.asarray(maximum_path(neg_cent, mask)),
    )
