"""Quantized (int8) packed-MRF kernel: exact semantics + error bounds.

The int8 mode (mrf_kernel="int8") runs the 18-conv MRF chains as int8
MXU dots: per-output-channel weight scales (pack_packed_weights_int8)
and one dynamic absmax activation scale per (conv, tile).  With a
single tile the activation scale is the global absmax, so the whole
computation is reproducible in pure NumPy — that oracle pins the
quantization semantics exactly.  Separate tests bound the quantization
error against the fp32 kernel and lock the generator dispatch.

Reference semantics under quantization: hifigan/models.py:74-97 (the
resblock chain being quantized) — the quantized path is a beyond-
reference serving mode, opt-in only, never selected by "auto".
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.ops.pallas.mrf_packed import (
    mrf_packed,
    pack_packed_weights,
    pack_packed_weights_int8,
)


def _resblocks(key, c: int, kernel_sizes=(3, 7, 11)):
    keys = jax.random.split(key, len(kernel_sizes))
    return [hifigan.init_resblock1(k, c, ks)
            for k, ks in zip(keys, kernel_sizes)]


def _mrf_xla(resblocks, x, kernel_sizes=(3, 7, 11)):
    xs = None
    for rb, k in zip(resblocks, kernel_sizes):
        y = hifigan.resblock1(rb, x, k)
        xs = y if xs is None else xs + y
    return xs / len(resblocks)


def _quantized_oracle(resblocks, x, kernel_sizes, dilations):
    """NumPy restatement of the kernel's quantized semantics for ONE tile:
    per conv, q_act = clip(round(a * 127/max|a|)); int32 conv of q_act
    with per-channel int8 weights; dequant by (max|a|/127) * s_w + bias."""
    x = np.asarray(x, np.float32)[0]  # (T, C)
    t, c = x.shape

    def conv(q_act, wq, d):
        k = wq.shape[0]
        half = (k * d - d) // 2
        acc = np.zeros((t, wq.shape[2]), np.int64)
        for tap in range(k):
            off = tap * d - half
            src = np.zeros_like(q_act)
            lo, hi = max(0, -off), min(t, t - off)
            src[lo:hi] = q_act[lo + off:hi + off]
            acc += src.astype(np.int64) @ wq[tap].astype(np.int64)
        return acc

    def quant_act(a):
        # fp32 arithmetic throughout: the kernel computes a*inv in fp32,
        # so the oracle must hit the same rounding boundaries
        m = np.float32(np.max(np.abs(a)))
        inv = np.float32(127.0) / m if m > 0 else np.float32(0.0)
        q = np.clip(np.round(a.astype(np.float32) * inv), -127, 127)
        return q.astype(np.int32), np.float32(m / np.float32(127.0)
                                              if m > 0 else 1.0)

    out = None
    for rb, k, dils in zip(resblocks, kernel_sizes, dilations):
        xb = x.copy()
        for m, d in enumerate(dils):
            for which, dd in (("convs1", d), ("convs2", 1)):
                w = np.asarray(rb[which][m]["weight"], np.float32)
                bias = np.asarray(rb[which][m]["bias"], np.float32)
                s_w = np.max(np.abs(w), axis=(0, 1)) / 127.0
                s_w = np.where(s_w > 0, s_w, 1.0)
                wq = np.clip(np.round((w / s_w).astype(np.float32)),
                             -127, 127)
                src = xb if which == "convs1" else xt
                a = np.where(src > 0, src, 0.1 * src).astype(np.float32)
                q, s_a = quant_act(a)
                xt = (conv(q, wq, dd).astype(np.float32)
                      * (s_a * s_w)[None, :] + bias[None, :])
            xb = xb + xt
        out = xb if out is None else out + xb
    return out / len(resblocks)


@pytest.mark.parametrize("c", [32, 64, 256])
def test_int8_kernel_matches_numpy_oracle(c):
    """Single tile -> the dynamic activation scale is global, so the
    quantized kernel must match the NumPy restatement to fp32 tolerance.
    c=256 exercises the wide (two-lane-tile, r_pack=1, int8-only) case."""
    ks, dils = (3, 7, 11), ((1, 3, 5),) * 3
    t = 512 * (128 // c) if c <= 128 else 256  # one tile of packed rows
    rb = _resblocks(jax.random.PRNGKey(0), c, ks)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, c), jnp.float32)
    w, b, ws = pack_packed_weights_int8(rb, ks, dils)
    got = np.asarray(mrf_packed(x, w, b, ws, kernel_sizes=ks,
                                dilations=dils))
    want = _quantized_oracle(rb, x, ks, dils)[None]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


def test_int8_error_bounded_vs_fp32_kernel():
    """Quantization error vs the fp32 packed kernel stays small (SNR)."""
    ks, dils = (3, 7, 11), ((1, 3, 5),) * 3
    c, t = 32, 2048
    rb = _resblocks(jax.random.PRNGKey(2), c, ks)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, t, c), jnp.float32)
    w32, b32 = pack_packed_weights(rb, ks, dils, dtype=jnp.float32)
    ref = np.asarray(mrf_packed(x, w32, b32, kernel_sizes=ks,
                                dilations=dils), np.float64)
    w8, b8, ws = pack_packed_weights_int8(rb, ks, dils)
    got = np.asarray(mrf_packed(x, w8, b8, ws, kernel_sizes=ks,
                                dilations=dils), np.float64)
    err = got - ref
    snr_db = 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))
    assert snr_db > 35.0, f"int8 SNR {snr_db:.1f} dB"


def test_int8_weight_packer_roundtrip():
    ks, dils = (3,), ((1, 3, 5),)
    rb = _resblocks(jax.random.PRNGKey(4), 64, ks)
    w8, b8, ws = pack_packed_weights_int8(rb, ks, dils)
    assert w8.dtype == jnp.int8 and b8.dtype == jnp.float32
    assert ws.shape == b8.shape
    assert int(jnp.max(jnp.abs(w8.astype(jnp.int32)))) <= 127
    # every conv's per-lane scale row repeats per packed frame slot
    s = np.asarray(ws)
    assert np.allclose(s[:, :64], s[:, 64:])


def test_int8_generator_dispatch_and_quality():
    """mrf_kernel='int8' produces a wav close to the xla generator and is
    never selected by 'auto'."""
    cfg = HiFiGANConfig()
    params = hifigan.init_generator(jax.random.PRNGKey(5), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(6), (1, 64, cfg.num_mels),
                            jnp.float32)
    ref = np.asarray(hifigan.generator(
        params, mel, dataclasses.replace(cfg, mrf_kernel="xla")), np.float64)
    got = np.asarray(hifigan.generator(
        params, mel, dataclasses.replace(cfg, mrf_kernel="int8")), np.float64)
    assert got.shape == ref.shape
    err = got - ref
    snr_db = 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30))
    assert snr_db > 25.0, f"generator int8 SNR {snr_db:.1f} dB"
    # 'auto' must never select the quantized mode (on CPU it is "xla";
    # on TPU it is the exact "packed" kernel); forced "int8" dispatches.
    assert hifigan._mrf_fusable(dataclasses.replace(cfg, mrf_kernel="auto"),
                                8192, 32, jnp.bfloat16) != "int8"
    assert hifigan._mrf_fusable(dataclasses.replace(cfg, mrf_kernel="int8"),
                                8192, 32, jnp.bfloat16) == "int8"


def test_wide_c256_gate():
    """The wide C=256 kernel exists only under quant (weights fit VMEM at
    int8 only), but the GENERATOR keeps XLA at C=256 in every mode — the
    kernel measured a tie there (halo recompute at the VMEM-forced tile
    cancels int8's headroom; see _mrf_fusable)."""
    from matcha_tts_tpu.ops.pallas.mrf_packed import mrf_packed_ok

    assert mrf_packed_ok(6144, 256, quant=True)
    assert not mrf_packed_ok(6144, 256, quant=False)
    cfg = HiFiGANConfig()
    assert hifigan._mrf_fusable(dataclasses.replace(cfg, mrf_kernel="int8"),
                                6144, 256, jnp.bfloat16) == "xla"
    assert hifigan._mrf_fusable(dataclasses.replace(cfg, mrf_kernel="packed"),
                                6144, 256, jnp.bfloat16) == "xla"


def test_quantization_report():
    """The per-checkpoint int8 quality report returns sane metrics."""
    cfg = HiFiGANConfig()
    params = hifigan.init_generator(jax.random.PRNGKey(8), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(9), (1, 64, cfg.num_mels),
                            jnp.float32)
    rep = hifigan.quantization_report(params, mel, cfg, exact_kernel="xla")
    assert set(rep) == {"snr_db", "max_abs_err", "mel_l1",
                        "exact_kernel", "quantized_kernel"}
    assert rep["snr_db"] > 25.0 and rep["max_abs_err"] < 0.1
    assert rep["mel_l1"] >= 0.0 and np.isfinite(rep["mel_l1"])


def test_int8_levels_attribution_gate():
    """int8_levels restricts quantization per upsample level: () == the
    exact packed path bit-for-bit; None == full int8; a single level
    changes only that level's contribution (VERDICT r4 #5 attribution
    surface)."""
    cfg = HiFiGANConfig()
    params = hifigan.init_generator(jax.random.PRNGKey(7), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(8), (1, 32, cfg.num_mels),
                            jnp.float32)

    def run(c):
        return np.asarray(hifigan.generator(params, mel, c), np.float64)

    packed = run(dataclasses.replace(cfg, mrf_kernel="packed"))
    none_quant = run(dataclasses.replace(cfg, mrf_kernel="int8",
                                         int8_levels=()))
    np.testing.assert_array_equal(none_quant, packed)
    full = run(dataclasses.replace(cfg, mrf_kernel="int8"))
    only1 = run(dataclasses.replace(cfg, mrf_kernel="int8",
                                    int8_levels=(1,)))
    only2 = run(dataclasses.replace(cfg, mrf_kernel="int8",
                                    int8_levels=(2,)))
    both = run(dataclasses.replace(cfg, mrf_kernel="int8",
                                   int8_levels=(1, 2)))
    # quantization actually engages somewhere
    assert np.abs(full - packed).max() > 0
    # at fp32 input the v1 int8 mode quantizes levels 1, 2 AND 3 (the
    # C=32 exact-bf16 exception applies to bf16 inputs only), so the
    # explicit (1, 2) subset differs from full int8 ...
    assert np.abs(only1 - packed).max() > 0
    assert np.abs(only2 - packed).max() > 0
    # ... and each single-level run differs from the exact path only
    # through its own level (sanity: both-levels error >= each single)
    def mse(a):
        return float(np.mean((a - packed) ** 2))

    assert mse(both) >= max(mse(only1), mse(only2)) * 0.5

    # validation
    with pytest.raises(ValueError):
        HiFiGANConfig(int8_levels=(1,))  # requires mrf_kernel="int8"
    with pytest.raises(ValueError):
        HiFiGANConfig(mrf_kernel="int8", int8_levels=(9,))
