"""Cross-platform TPU (Mosaic) lowering regression tests.

Interpret-mode tests validate kernel *math* but never run Mosaic's
verifier or lowering passes — a kernel can pass every CPU test and still
fail to compile on the TPU backend (found live: `tpu.iota` is
integer-only, so a float32 `broadcasted_iota` inside ops/pallas/mas.py
passed interpret-mode parity and crashed Mosaic verification on TPU).

These tests lower every Pallas kernel for the TPU platform *from the CPU
suite* via `jax.export`'s cross-platform lowering — no TPU required —
so Mosaic lowering bugs fail here instead of in a hardware run.

Also locks the location-stable Mosaic payload behavior
(matcha_tts_tpu/ops/pallas/_stable.py): kernel cache keys must not
change when kernel source merely moves by a few lines.
"""

from __future__ import annotations

import re
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jax_export

import matcha_tts_tpu  # noqa: F401  (installs the _stable patch)
from matcha_tts_tpu.models import hifigan, nn as mnn


def lower_tpu(fn, *args):
    """Cross-lower `fn(*args)` for the TPU platform; returns MLIR text."""
    exp = jax_export.export(jax.jit(fn), platforms=["tpu"])(*args)
    return exp.mlir_module()


def _assert_mosaic(txt: str, n: int):
    assert txt.count("@tpu_custom_call(") == n, (
        "expected %d Mosaic custom calls" % n)


def test_stable_patch_installed():
    from jax._src import tpu_custom_call as tcc

    assert getattr(tcc._lower_mosaic_module_to_asm, "_matcha_stable", False)


def test_mas_kernel_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mas import maximum_path_pallas

    nc = jax.ShapeDtypeStruct((8, 128, 256), jnp.float32)
    mk = jax.ShapeDtypeStruct((8, 128, 256), jnp.float32)
    txt = lower_tpu(
        lambda v, m: maximum_path_pallas(v, m, interpret=False), nc, mk)
    _assert_mosaic(txt, 2)  # forward DP + backtrack


def test_mas_kernel_lowers_for_tpu_large_batch():
    # batch 64 picks the reduced 32-column chunk (the 64-column pipeline
    # exceeds the scoped-VMEM limit on TPU — measured AOT failure)
    from matcha_tts_tpu.ops.pallas.mas import _pick_chunk, maximum_path_pallas

    assert _pick_chunk(64, 256) == 32
    nc = jax.ShapeDtypeStruct((64, 256, 768), jnp.float32)
    mk = jax.ShapeDtypeStruct((64, 256, 768), jnp.float32)
    txt = lower_tpu(
        lambda v, m: maximum_path_pallas(v, m, interpret=False), nc, mk)
    _assert_mosaic(txt, 2)


def test_block1d_kernel_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.block1d import block1d_fused

    x = jax.ShapeDtypeStruct((2, 256, 256), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 256, 256), jnp.float32)
    b = jax.ShapeDtypeStruct((256,), jnp.float32)
    g = jax.ShapeDtypeStruct((256,), jnp.float32)
    be = jax.ShapeDtypeStruct((256,), jnp.float32)
    txt = lower_tpu(
        lambda *a: block1d_fused(*a, groups=8, interpret=False),
        x, w, b, g, be)
    _assert_mosaic(txt, 1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mrf_packed_lowers_for_tpu(dtype):
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed,
        pack_packed_weights,
    )

    c = 32
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    w, b = pack_packed_weights(rbs, dtype=dtype)
    x = jax.ShapeDtypeStruct((1, 512, c), dtype)
    txt = lower_tpu(
        lambda xx: mrf_packed(xx, w, b, tile=64, interpret=False), x)
    _assert_mosaic(txt, 1)


def test_mrf_packed_int8_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed,
        pack_packed_weights_int8,
    )

    c = 32
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    w, b, ws = pack_packed_weights_int8(rbs)
    x = jax.ShapeDtypeStruct((1, 512, c), jnp.bfloat16)
    txt = lower_tpu(
        lambda xx: mrf_packed(xx, w, b, ws, tile=64, interpret=False), x)
    _assert_mosaic(txt, 1)


def test_mrf_wide_c256_int8_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed,
        pack_packed_weights_int8,
    )

    c = 256
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    w, b, ws = pack_packed_weights_int8(rbs)
    x = jax.ShapeDtypeStruct((1, 256, c), jnp.bfloat16)
    txt = lower_tpu(
        lambda xx: mrf_packed(xx, w, b, ws, tile=128, interpret=False), x)
    _assert_mosaic(txt, 1)
    # production streaming shape: tile=1024 with the double-buffered
    # per-conv weight DMA pipeline (weights in HBM, not VMEM-resident)
    x = jax.ShapeDtypeStruct((1, 2048, c), jnp.bfloat16)
    txt = lower_tpu(
        lambda xx: mrf_packed(xx, w, b, ws, interpret=False), x)
    _assert_mosaic(txt, 1)


def test_mrf_packed_up_int8_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed_up,
        pack_convpost_weights,
        pack_packed_weights_int8,
        pack_upsample_weights,
    )

    c_in, c_out = 64, 32
    up = mnn.init_conv_transpose1d(jax.random.PRNGKey(9), c_in, c_out, 4)
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c_out, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    post = {"weight": jax.random.normal(jax.random.PRNGKey(3), (7, c_out, 1)),
            "bias": jnp.zeros((1,))}
    wup, bup = pack_upsample_weights(up, dtype=jnp.bfloat16)
    w, b, ws = pack_packed_weights_int8(rbs)
    wpost, bpost, _ = pack_convpost_weights(post, c_out, dtype=jnp.bfloat16)
    x = jax.ShapeDtypeStruct((1, 512, c_in), jnp.bfloat16)
    txt = lower_tpu(
        lambda xx: mrf_packed_up(xx, wup, bup, w, b, ws=ws, wpost=wpost,
                                 bpost=bpost, tile=128, interpret=False), x)
    _assert_mosaic(txt, 1)


def test_mrf_packed_up_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed_up,
        pack_packed_weights,
        pack_upsample_weights,
    )

    c_in = 64
    c_out = c_in // 2
    up = mnn.init_conv_transpose1d(jax.random.PRNGKey(9), c_in, c_out, 4)
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c_out, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    wup, bup = pack_upsample_weights(up)
    w, b = pack_packed_weights(rbs)
    x = jax.ShapeDtypeStruct((1, 512, c_in), jnp.float32)
    txt = lower_tpu(
        lambda xx: mrf_packed_up(xx, wup, bup, w, b, tile=128,
                                 interpret=False), x)
    _assert_mosaic(txt, 1)


def test_mrf_tap_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.mrf import mrf_fused, pack_mrf_weights

    c = 128
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    w1, b1, w2, b2 = pack_mrf_weights(rbs)
    x = jax.ShapeDtypeStruct((1, 2048, c), jnp.float32)
    txt = lower_tpu(
        lambda xx: mrf_fused(xx, w1, b1, w2, b2, interpret=False), x)
    _assert_mosaic(txt, 1)


def test_resnet1d_kernel_lowers_for_tpu():
    from matcha_tts_tpu.models import unet
    from matcha_tts_tpu.ops.pallas.resnet1d import resnet1d_fused

    params = unet.init_resnet_block1d(jax.random.PRNGKey(0), 512, 256, 1024)
    x = jax.ShapeDtypeStruct((2, 768, 512), jnp.bfloat16)
    m = jax.ShapeDtypeStruct((2, 768), jnp.float32)
    temb = jax.ShapeDtypeStruct((2, 256), jnp.bfloat16)
    txt = lower_tpu(
        lambda xx, mm, tt: resnet1d_fused(
            xx, mm, tt, params["block1"], params["block2"],
            params["res_conv"]["weight"][0], params["res_conv"]["bias"],
            interpret=False), x, m, temb)
    _assert_mosaic(txt, 1)


def test_vmem_attention_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.attn_vmem import vmem_mha

    q = jax.ShapeDtypeStruct((4, 768, 2, 64), jnp.bfloat16)
    m = jax.ShapeDtypeStruct((4, 768), jnp.float32)
    txt = lower_tpu(
        lambda qq, mm: vmem_mha(qq, qq, qq, mm, sm_scale=0.125,
                                interpret=False), q, m)
    _assert_mosaic(txt, 1)


def test_flash_attention_lowers_for_tpu():
    from matcha_tts_tpu.ops.pallas.attention import flash_mha

    q = jax.ShapeDtypeStruct((8, 256, 2, 64), jnp.float32)
    m = jax.ShapeDtypeStruct((8, 256), jnp.float32)
    txt = lower_tpu(
        lambda qq, mm: flash_mha(qq, qq, qq, mm, sm_scale=0.125), q, m)
    assert "@tpu_custom_call(" in txt


# ---------------------------------------------------------------------------
# Location-stable payloads
# ---------------------------------------------------------------------------

_KERNEL_SRC = """
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

def f(x):
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
"""


def _payloads(line_offset: int):
    """Exec the same kernel source shifted down by `line_offset` lines and
    return the Mosaic backend_config payloads of its TPU lowering."""
    ns: dict = {}
    exec(compile("\n" * line_offset + textwrap.dedent(_KERNEL_SRC),
                 "<stable_kernel>", "exec"), ns)
    x = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    txt = lower_tpu(ns["f"], x)
    return re.findall(r'backend_config\s*=\s*"([^"]+)"', txt)


def test_mosaic_payload_stable_across_source_moves():
    """Moving kernel source by N lines must not change the serialized
    Mosaic payload (else every persistent-cache entry embedding the
    kernel is invalidated by unrelated edits)."""
    a = _payloads(0)
    b = _payloads(7)
    assert a and a == b
