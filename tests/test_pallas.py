"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.models import nn, unet
from matcha_tts_tpu.ops.pallas.block1d import block1d_fused, block1d_pallas_ok


def test_block1d_fused_matches_xla():
    rng = np.random.default_rng(0)
    b, t, c_in, c_out = 2, 16, 128, 128
    x = rng.standard_normal((b, t, c_in)).astype(np.float32)
    p = unet.init_block1d(jax.random.PRNGKey(0), c_in, c_out)
    mask = np.ones((b, t), np.float32)
    mask[1, 12:] = 0.0
    xm = x * mask[..., None]

    ref = np.asarray(unet.block1d(p, jnp.asarray(x), jnp.asarray(mask)))
    fused = block1d_fused(jnp.asarray(xm), p["conv"]["weight"],
                          p["conv"]["bias"], p["norm"]["gamma"],
                          p["norm"]["beta"], interpret=True)
    fused = np.asarray(fused) * mask[..., None]
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_block1d_shape_gate():
    assert block1d_pallas_ok(512, 256, 256)
    assert block1d_pallas_ok(256, 128, 256)
    assert not block1d_pallas_ok(511, 256, 256)
    assert not block1d_pallas_ok(512, 80, 256)


def test_mrf_fused_matches_xla():
    import jax.numpy as jnp

    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.ops.pallas.mrf import mrf_fused, pack_mrf_weights

    rng = np.random.default_rng(1)
    c = 32
    # small T for interpret mode; override tile via monkeypatched gate
    from matcha_tts_tpu.ops.pallas import mrf as mrf_mod

    orig = mrf_mod._tile_for
    mrf_mod._tile_for = lambda c: 64
    try:
        t = 192
        x = rng.standard_normal((2, t, c)).astype(np.float32)
        rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
               for i, k in enumerate((3, 7, 11))]
        ref = None
        for rb, k in zip(rbs, (3, 7, 11)):
            y = hifigan.resblock1(rb, jnp.asarray(x), k, (1, 3, 5))
            ref = y if ref is None else ref + y
        ref = np.asarray(ref) / 3.0

        w1, b1, w2, b2 = pack_mrf_weights(rbs)
        fused = np.asarray(mrf_fused(jnp.asarray(x), w1, b1, w2, b2,
                                     interpret=True))
        np.testing.assert_allclose(fused, ref, atol=3e-5)
    finally:
        mrf_mod._tile_for = orig


def test_mrf_gate():
    from matcha_tts_tpu.ops.pallas.mrf import mrf_pallas_ok

    assert mrf_pallas_ok(98304, 64)
    assert mrf_pallas_ok(196608, 32)
    assert not mrf_pallas_ok(98304, 128)   # big channels stay on XLA
    assert not mrf_pallas_ok(98300, 64)    # not tile-divisible
    assert not mrf_pallas_ok(512, 64)      # too short to tile


def test_block1d_vjp_gradient_parity():
    """Gradients of the fused kernel (custom rematerializing VJP) must match
    gradients of the XLA composition for all five inputs."""
    from matcha_tts_tpu.ops.pallas.block1d import (_block1d_reference,
                                                   block1d_fused_vjp)

    rng = np.random.default_rng(2)
    b, t, c_in, c_out = 2, 16, 128, 128
    x = jnp.asarray(rng.standard_normal((b, t, c_in)).astype(np.float32))
    p = unet.init_block1d(jax.random.PRNGKey(3), c_in, c_out)
    w, bias = p["conv"]["weight"], p["conv"]["bias"]
    gamma = jnp.asarray(rng.standard_normal(c_out).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(c_out).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, t, c_out)).astype(np.float32))

    def loss_fused(x, w, bias, gamma, beta):
        return jnp.sum(block1d_fused_vjp(x, w, bias, gamma, beta,
                                         8, 1e-5, True) * cot)

    def loss_ref(x, w, bias, gamma, beta):
        return jnp.sum(_block1d_reference(x, w, bias, gamma, beta,
                                          groups=8, eps=1e-5) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, bias,
                                                            gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, bias,
                                                        gamma, beta)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)
    # primal parity too (fwd is the Pallas kernel, not the reference)
    np.testing.assert_allclose(
        np.asarray(block1d_fused_vjp(x, w, bias, gamma, beta, 8, 1e-5, True)),
        np.asarray(_block1d_reference(x, w, bias, gamma, beta, 8, 1e-5)),
        atol=2e-5)


def test_block1d_vjp_trains_through_unet():
    """jax.grad through the decoder with use_pallas=True (interpret mode)
    must run and match the XLA-path gradients."""
    from matcha_tts_tpu.config import DecoderConfig
    from matcha_tts_tpu.ops.pallas import block1d as b1

    # interpret mode for CPU: monkeypatch the fused entry to interpret=True
    orig = b1.block1d_fused
    b1.block1d_fused = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        rng = np.random.default_rng(4)
        cfg_x = DecoderConfig(channels=(128, 128), attention_head_dim=16,
                              num_heads=2, n_blocks=1, num_mid_blocks=1,
                              use_pallas=True)
        cfg_r = DecoderConfig(channels=(128, 128), attention_head_dim=16,
                              num_heads=2, n_blocks=1, num_mid_blocks=1,
                              use_pallas=False)
        params = unet.init_decoder(jax.random.PRNGKey(5), 16, 8, cfg_x)
        xin = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
        mu = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
        mask = jnp.ones((2, 16), jnp.float32)
        tt = jnp.asarray([0.3, 0.7], jnp.float32)

        def loss(p, cfg):
            return jnp.sum(jnp.square(unet.decoder(p, xin, mask, mu, tt, cfg)))

        gx = jax.grad(lambda p: loss(p, cfg_x))(params)
        gr = jax.grad(lambda p: loss(p, cfg_r))(params)
        lx = jax.tree_util.tree_leaves(gx)
        lr = jax.tree_util.tree_leaves(gr)
        assert len(lx) == len(lr)
        for a, c in zip(lx, lr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-4, rtol=1e-3)
    finally:
        b1.block1d_fused = orig


def test_block1d_fused_bf16_inputs():
    """bf16 inputs must trace with DEFAULT matmul precision (Mosaic rejects
    an fp32-precision contract on bf16 operands) and stay close to the
    fp32 reference."""
    rng = np.random.default_rng(5)
    b, t, c = 1, 16, 128
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    p = unet.init_block1d(jax.random.PRNGKey(6), c, c)
    ref = np.asarray(block1d_fused(jnp.asarray(x), p["conv"]["weight"],
                                   p["conv"]["bias"], p["norm"]["gamma"],
                                   p["norm"]["beta"], interpret=True))
    out = block1d_fused(jnp.asarray(x, jnp.bfloat16),
                        p["conv"]["weight"].astype(jnp.bfloat16),
                        p["conv"]["bias"].astype(jnp.bfloat16),
                        p["norm"]["gamma"].astype(jnp.bfloat16),
                        p["norm"]["beta"].astype(jnp.bfloat16),
                        interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=0.1, rtol=0.1)


def test_mrf_packed_matches_xla():
    """Time-in-lanes packed MRF kernel vs the XLA resblock mean, both
    packing factors (R=4 at C=32, R=2 at C=64), multi-tile halo exchange."""
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.ops.pallas.mrf_packed import (mrf_packed,
                                                      pack_packed_weights)

    rng = np.random.default_rng(7)
    for c, t, tile in [(32, 256, 64), (32, 1024, 128), (64, 768, 64),
                       (128, 384, 128)]:
        x = rng.standard_normal((2, t, c)).astype(np.float32)
        rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
               for i, k in enumerate((3, 7, 11))]
        ref = None
        for rb, k in zip(rbs, (3, 7, 11)):
            y = hifigan.resblock1(rb, jnp.asarray(x), k, (1, 3, 5))
            ref = y if ref is None else ref + y
        ref = np.asarray(ref) / 3.0
        w, b = pack_packed_weights(rbs)
        out = np.asarray(mrf_packed(jnp.asarray(x), w, b, tile=tile,
                                    interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-5)


def test_mrf_packed_bf16():
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.ops.pallas.mrf_packed import (mrf_packed,
                                                      pack_packed_weights)

    rng = np.random.default_rng(8)
    c, t = 32, 512
    x = rng.standard_normal((1, t, c)).astype(np.float32)
    rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
           for i, k in enumerate((3, 7, 11))]
    ref = None
    for rb, k in zip(rbs, (3, 7, 11)):
        y = hifigan.resblock1(rb, jnp.asarray(x), k, (1, 3, 5))
        ref = y if ref is None else ref + y
    ref = np.asarray(ref) / 3.0
    w, b = pack_packed_weights(rbs, dtype=jnp.bfloat16)
    out = mrf_packed(jnp.asarray(x, jnp.bfloat16), w, b, tile=64,
                     interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=0.05, rtol=0.05)


def test_mrf_packed_up_matches_xla():
    """Fused LeakyReLU -> ConvTranspose(k=4,s=2) -> MRF level vs the XLA
    three-op chain, both deep-level channel pairs, multi-tile."""
    from matcha_tts_tpu.models import hifigan, nn
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed_up, mrf_packed_up_ok, pack_packed_weights,
        pack_upsample_weights, upsample_meta)

    assert upsample_meta(2, 4, 1, 1) == (-1, 0, 1)
    assert upsample_meta(2, 4, 1, 2) == (-1, 0, 1)
    key = jax.random.PRNGKey(3)
    for bsz, (c_in, t_in) in ((1, (64, 512)), (2, (128, 256))):
        c_out, t_out = c_in // 2, t_in * 2
        assert mrf_packed_up_ok(t_out, c_out, fp32=True)
        up = nn.init_conv_transpose1d(jax.random.PRNGKey(9), c_in, c_out, 4)
        rbs = [hifigan.init_resblock1(k, c_out, kk, (1, 3, 5))
               for k, kk in zip(jax.random.split(key, 3), (3, 7, 11))]
        x = jax.random.normal(jax.random.PRNGKey(c_in), (bsz, t_in, c_in),
                              jnp.float32)
        y = jax.nn.leaky_relu(x, 0.1)
        y = nn.conv_transpose1d(up, y, stride=2, padding=1)
        ref = None
        for rb, k in zip(rbs, (3, 7, 11)):
            z = hifigan.resblock1(rb, y, k, (1, 3, 5))
            ref = z if ref is None else ref + z
        ref = np.asarray(ref) / 3.0
        wup, bup = pack_upsample_weights(up)
        w, b = pack_packed_weights(rbs)
        out = np.asarray(mrf_packed_up(x, wup, bup, w, b, tile=128,
                                       interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-5)
    assert not mrf_packed_up_ok(2048, 128)   # only the two deepest levels
    assert not mrf_packed_up_ok(2048, 32, stride=8, up_k=16)


def test_mrf_packed_up_convpost_epilogue():
    """Last-level variant: the kernel also emits LReLU(0.01) -> conv_post
    -> tanh as a packed second output (one lane per frame)."""
    from matcha_tts_tpu.models import hifigan, nn
    from matcha_tts_tpu.ops.pallas.mrf_packed import (
        mrf_packed_up, pack_packed_weights, pack_upsample_weights,
        pack_convpost_weights)

    key = jax.random.PRNGKey(3)
    c_in, t_in, bsz = 64, 512, 2
    c_out = 32
    up = nn.init_conv_transpose1d(jax.random.PRNGKey(9), c_in, c_out, 4)
    post = {"weight": jax.random.normal(jax.random.PRNGKey(11),
                                        (7, c_out, 1)) * 0.05,
            "bias": jnp.asarray([0.013])}
    rbs = [hifigan.init_resblock1(k, c_out, kk, (1, 3, 5))
           for k, kk in zip(jax.random.split(key, 3), (3, 7, 11))]
    x = jax.random.normal(jax.random.PRNGKey(0), (bsz, t_in, c_in),
                          jnp.float32)
    y = jax.nn.leaky_relu(x, 0.1)
    y = nn.conv_transpose1d(up, y, stride=2, padding=1)
    lvl_ref = None
    for rb, k in zip(rbs, (3, 7, 11)):
        z = hifigan.resblock1(rb, y, k, (1, 3, 5))
        lvl_ref = z if lvl_ref is None else lvl_ref + z
    lvl_ref = lvl_ref / 3.0
    tail = jax.nn.leaky_relu(lvl_ref, 0.01)
    wav_ref = np.asarray(jnp.tanh(nn.conv1d(post, tail, padding=3))[..., 0])

    wup, bup = pack_upsample_weights(up)
    w, b = pack_packed_weights(rbs)
    wpost, bpost, qs = pack_convpost_weights(post, c_out)
    assert qs == (-1, 0, 1)
    lvl, wavp = mrf_packed_up(x, wup, bup, w, b, tile=128,
                              wpost=wpost, bpost=bpost, interpret=True)
    np.testing.assert_allclose(np.asarray(lvl), np.asarray(lvl_ref),
                               atol=3e-5)
    wav = np.asarray(wavp.reshape(bsz, -1, c_out)[..., 0])
    np.testing.assert_allclose(wav, wav_ref, atol=3e-5)


def test_mrf_packed_meta_and_gate():
    from matcha_tts_tpu.ops.pallas.mrf_packed import (mrf_packed_ok,
                                                      packed_meta)

    specs, n, halo = packed_meta((3, 7, 11), ((1, 3, 5),) * 3, 4)
    assert n == 92 and halo == 32           # C=32: 92 dense matmuls on T/4
    specs, n, halo = packed_meta((3, 7, 11), ((1, 3, 5),) * 3, 2)
    assert n == 126 and halo == 48          # C=64: 126 on T/2 = 2x less MXU
    specs, n, halo = packed_meta((3, 7, 11), ((1, 3, 5),) * 3, 1)
    assert n == 126 and halo == 64          # C=128: r_pack=1, pure fusion
    # mat indices are contiguous 0..n-1 in walk order
    seen = [mi for branch in specs for s1, s2 in branch
            for _, mi in (*s1, *s2)]
    assert sorted(seen) == list(range(n))
    assert mrf_packed_ok(196608, 32)        # bench shapes
    assert mrf_packed_ok(98304, 64)
    assert mrf_packed_ok(49152, 128)        # r_pack=1 level, also fused
    assert not mrf_packed_ok(49152, 256)    # >128 channels stay on XLA
    assert not mrf_packed_ok(98306, 64)     # not packing-divisible


def test_generator_packed_matches_xla_generator():
    """Full generator with mrf_kernel='packed' (interpret) vs the XLA
    generator — exercises the level gate + pack-at-call-site wiring."""
    from matcha_tts_tpu.config import HiFiGANConfig
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.ops.pallas import mrf_packed as mp

    orig = mp.mrf_packed
    orig_up = mp.mrf_packed_up
    mp.mrf_packed = lambda *a, **kw: orig(*a, **{**kw, "interpret": True,
                                                 "tile": 64})
    mp.mrf_packed_up = lambda *a, **kw: orig_up(*a, **{**kw,
                                                       "interpret": True,
                                                       "tile": 64})
    try:
        rng = np.random.default_rng(9)
        cfg_x = HiFiGANConfig()
        cfg_p = HiFiGANConfig(mrf_kernel="packed")
        vp = hifigan.init_generator(jax.random.PRNGKey(10), cfg_x)
        mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
        ref = np.asarray(hifigan.generator(vp, mel, cfg_x))
        out = np.asarray(hifigan.generator(vp, mel, cfg_p))
        np.testing.assert_allclose(out, ref, atol=3e-5)
        # jit over params (the synthesizer jits vocoder_params): weight
        # packing must be tracer-safe
        out_jit = np.asarray(jax.jit(
            lambda p, m: hifigan.generator(p, m, cfg_p))(vp, mel))
        np.testing.assert_allclose(out_jit, ref, atol=3e-5)
    finally:
        mp.mrf_packed = orig
        mp.mrf_packed_up = orig_up
