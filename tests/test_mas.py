"""MAS tests: every implementation (scan / Pallas / native / oracle) must
agree on the TRUE Glow-TTS recurrence (the reference's own rewrite at
train_standalone.py:241-325 is degenerate — see docs/PARITY.md), return
globally optimal paths (exhaustive check), and produce valid monotonic
one-hot paths."""

import numpy as np

from matcha_tts_tpu.ops import maximum_path, maximum_path_numpy
from matcha_tts_tpu.ops.masking import sequence_mask


def make_problem(rng, b, t_x, t_y):
    """Random Gaussian-log-prior-like values and a ragged mask."""
    neg_cent = rng.standard_normal((b, t_x, t_y)).astype(np.float32) * 3.0 - 5.0
    t_xs = rng.integers(2, t_x + 1, size=b)
    t_ys = np.maximum(rng.integers(2, t_y + 1, size=b), t_xs)  # t_y >= t_x typical
    x_mask = np.asarray(sequence_mask(t_xs, t_x)).astype(np.float32)
    y_mask = np.asarray(sequence_mask(t_ys, t_y)).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    return neg_cent, mask, t_xs, t_ys


def test_matches_scalar_reference():
    rng = np.random.default_rng(0)
    neg_cent, mask, _, _ = make_problem(rng, 6, 24, 60)
    ours = np.asarray(maximum_path(neg_cent, mask))
    ref = maximum_path_numpy(neg_cent, mask)
    np.testing.assert_array_equal(ours, ref)


def test_matches_scalar_reference_square_and_edge_cases():
    rng = np.random.default_rng(1)
    # square lattice, t_x == t_y (tight band) and tiny sizes
    for b, tx, ty in [(4, 16, 16), (3, 5, 7), (2, 2, 2), (1, 1, 4), (5, 31, 33)]:
        neg_cent = rng.standard_normal((b, tx, ty)).astype(np.float32)
        t_xs = rng.integers(1, tx + 1, size=b)
        t_ys = np.maximum(t_xs, rng.integers(1, ty + 1, size=b))
        x_mask = np.asarray(sequence_mask(t_xs, tx)).astype(np.float32)
        y_mask = np.asarray(sequence_mask(t_ys, ty)).astype(np.float32)
        mask = x_mask[:, :, None] * y_mask[:, None, :]
        ours = np.asarray(maximum_path(neg_cent, mask))
        ref = maximum_path_numpy(neg_cent, mask)
        np.testing.assert_array_equal(ours, ref, err_msg=f"b={b} tx={tx} ty={ty}")


def test_path_properties():
    rng = np.random.default_rng(2)
    neg_cent, mask, t_xs, t_ys = make_problem(rng, 8, 20, 50)
    path = np.asarray(maximum_path(neg_cent, mask))
    for i in range(path.shape[0]):
        p = path[i, : t_xs[i], : t_ys[i]]
        # each frame (column) is assigned to exactly one token
        np.testing.assert_array_equal(p.sum(axis=0), np.ones(t_ys[i]))
        # token index is monotonically non-decreasing over frames
        idx = p.argmax(axis=0)
        assert (np.diff(idx) >= 0).all()
        # ends at the last token, starts at token 0 region
        assert idx[-1] == t_xs[i] - 1
        # nothing outside the valid region
        assert path[i, t_xs[i]:, :].sum() == 0
        assert path[i, :, t_ys[i]:].sum() == 0


def test_prefers_high_likelihood_diagonal():
    # construct a log-prior with an obvious diagonal ridge; MAS must follow it
    t = 12
    neg_cent = np.full((1, t, 2 * t), -50.0, dtype=np.float32)
    for x in range(t):
        neg_cent[0, x, 2 * x] = 0.0
        neg_cent[0, x, 2 * x + 1] = 0.0
    mask = np.ones((1, t, 2 * t), dtype=np.float32)
    path = np.asarray(maximum_path(neg_cent, mask))
    idx = path[0].argmax(axis=0)
    np.testing.assert_array_equal(idx, np.repeat(np.arange(t), 2))


def test_matches_scalar_reference_large():
    """Realistic training sizes (T_x=192, T_y=768): band logic and
    backtrack at scale."""
    rng = np.random.default_rng(7)
    b, tx, ty = 2, 192, 768
    # Gaussian-log-prior-like magnitudes (very negative, structured)
    pos_x = np.linspace(0, 1, tx)[None, :, None]
    pos_y = np.linspace(0, 1, ty)[None, None, :]
    neg_cent = (-200.0 * np.square(pos_x - pos_y)
                + rng.standard_normal((b, tx, ty)) * 2.0 - 40.0
                ).astype(np.float32)
    t_xs = np.array([192, 150])
    t_ys = np.array([768, 500])
    x_mask = np.asarray(sequence_mask(t_xs, tx)).astype(np.float32)
    y_mask = np.asarray(sequence_mask(t_ys, ty)).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    ours = np.asarray(maximum_path(neg_cent, mask))
    ref = maximum_path_numpy(neg_cent, mask)
    np.testing.assert_array_equal(ours, ref)
    # diagonal prior should produce a roughly diagonal path
    idx = ours[0].argmax(axis=0)
    assert idx[0] < 10 and idx[-1] == t_xs[0] - 1


def test_generate_path_matches_manual():
    """generate_path (model.py:64-76 semantics): token x covers frames
    [cumdur[x-1], cumdur[x])."""
    from matcha_tts_tpu.ops.masking import generate_path

    dur = np.array([[2, 0, 3, 1], [1, 1, 1, 1]], np.float32)
    t_y = 8
    mask = np.ones((2, 4, t_y), np.float32)
    path = np.asarray(generate_path(dur, mask))
    expected0 = np.zeros((4, t_y))
    expected0[0, 0:2] = 1   # dur 2
    # token 1 has dur 0 -> no frames
    expected0[2, 2:5] = 1   # dur 3
    expected0[3, 5:6] = 1   # dur 1
    np.testing.assert_array_equal(path[0], expected0)
    np.testing.assert_array_equal(path[1, :, :4], np.eye(4))


def test_path_is_globally_optimal_vs_exhaustive():
    """The returned path must be the argmax over ALL monotonic paths.

    Regression for the degenerate-path bug inherited from the reference:
    its rewrite (train_standalone.py:263-266) reads the just-written
    current column (`path[x-1, y]`) instead of column y-1, which makes
    the first token absorb nearly all frames.  Exhaustive enumeration on
    small lattices catches any such recurrence error.
    """
    import itertools

    rng = np.random.default_rng(3)
    t_x, t_y = 4, 7
    value = rng.standard_normal((1, t_x, t_y)).astype(np.float32) * 3
    mask = np.ones((1, t_x, t_y), np.float32)

    best_score, best_path = -np.inf, None
    # enumerate all monotonic paths: choose the 3 frames where the token
    # index steps down (strictly increasing step positions in 1..t_y-1)
    for steps in itertools.combinations(range(1, t_y), t_x - 1):
        idx = np.zeros(t_y, np.int32)
        for s in steps:
            idx[s:] += 1
        score = sum(value[0, idx[j], j] for j in range(t_y))
        if score > best_score:
            best_score, best_path = score, idx.copy()

    def check(path, name):
        got_idx = path[0].argmax(axis=0)
        got_score = sum(value[0, got_idx[j], j] for j in range(t_y))
        assert np.isclose(got_score, best_score), (name, got_idx, best_path)

    # every implementation directly, so an oracle regression can never
    # mask a kernel regression (they are otherwise only compared pairwise)
    for impl in ("scan", "pallas"):
        check(np.asarray(maximum_path(value, mask, impl=impl)), impl)
    check(maximum_path_numpy(value, mask), "numpy")
    from matcha_tts_tpu.native.mas_native import (maximum_path_native,
                                                  native_available)
    if native_available():
        check(maximum_path_native(value, mask), "native")


def test_not_degenerate_on_sharp_diagonal():
    """A strongly diagonal prior must produce near-uniform durations —
    NOT the first-token-absorbs-everything path of the broken recurrence."""
    t_x, t_y = 8, 32
    value = np.full((1, t_x, t_y), -10.0, np.float32)
    for x in range(t_x):
        value[0, x, 4 * x : 4 * (x + 1)] = 0.0  # true alignment: 4 frames each
    mask = np.ones((1, t_x, t_y), np.float32)
    for impl in ("scan", "pallas"):
        path = np.asarray(maximum_path(value, mask,
                                       impl=impl))
        durs = path[0].sum(axis=1)
        np.testing.assert_array_equal(durs, np.full(t_x, 4.0), err_msg=impl)
