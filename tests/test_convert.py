"""Checkpoint converter tests: the torch<->JAX mapping must round-trip and
must drive a real torch execution of the reference math (via the mirror)
to the same outputs as our JAX graph — i.e. converted checkpoints are
interchangeable."""

import jax
import numpy as np
import torch

import torch_mirror as tm
from matcha_tts_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    HiFiGANConfig,
    MatchaConfig,
)
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.models.matcha import init_matcha, synthesize
from matcha_tts_tpu.params import convert as C


def tiny_cfg():
    return MatchaConfig(
        n_vocab=60,
        encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                              n_heads=2, n_layers=2, p_dropout=0.0),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                              num_heads=2, n_blocks=1, num_mid_blocks=2),
        audio=AudioConfig(n_mels=8),
    )


def assert_tree_equal(a, b, path=""):
    assert type(a) is type(b) or isinstance(a, (dict, list)) == isinstance(b, (dict, list)), path
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), (path, a.keys(), b.keys())
        for k in a:
            assert_tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=path)


def test_roundtrip_export_convert():
    cfg = tiny_cfg()
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    sd = C.export_matcha(params, cfg)
    back = C.convert_matcha(sd, cfg)
    assert_tree_equal(jax.device_get(params), back)


def test_exported_keys_match_reference_schema():
    """Spot-check key names against the reference module tree
    (model.py:1173-1232 and submodules)."""
    cfg = tiny_cfg()
    params = init_matcha(jax.random.PRNGKey(1), cfg)
    sd = C.export_matcha(params, cfg)
    expected = [
        "encoder.emb.weight",
        "encoder.prenet.conv_layers.0.weight",
        "encoder.prenet.norm_layers.2.gamma",
        "encoder.prenet.proj.bias",
        "encoder.encoder.attn_layers.0.conv_q.weight",
        "encoder.encoder.norm_layers_1.1.beta",
        "encoder.encoder.ffn_layers.1.conv_2.bias",
        "encoder.proj_m.weight",
        "encoder.proj_w.norm_2.gamma",
        "decoder.estimator.time_mlp.linear_1.weight",
        "decoder.estimator.down_blocks.0.0.mlp.1.weight",
        "decoder.estimator.down_blocks.0.1.0.attn1.to_q.weight",
        "decoder.estimator.down_blocks.0.1.0.ff.net.0.alpha",
        "decoder.estimator.down_blocks.0.1.0.ff.net.2.weight",
        "decoder.estimator.down_blocks.0.2.conv.weight",  # Downsample1D
        "decoder.estimator.down_blocks.1.2.weight",       # bare Conv1d
        "decoder.estimator.mid_blocks.1.0.block2.block.1.weight",
        "decoder.estimator.up_blocks.0.2.conv.weight",    # Upsample1D (T)
        "decoder.estimator.up_blocks.1.2.weight",
        "decoder.estimator.final_block.block.0.weight",
        "decoder.estimator.final_proj.weight",
        "mel_mean",
        "mel_std",
    ]
    for k in expected:
        assert k in sd, f"missing key {k}"
    # torch-layout shapes
    assert sd["encoder.prenet.conv_layers.0.weight"].shape == (32, 32, 5)
    assert sd["decoder.estimator.time_mlp.linear_1.weight"].shape == (64, 16)
    assert sd["decoder.estimator.up_blocks.0.2.conv.weight"].shape == (16, 16, 4)


def test_converted_weights_drive_torch_to_same_mel():
    """Full-model check: run the converted params through the torch mirror
    of the reference U-Net and our jitted decoder; outputs must agree."""
    from matcha_tts_tpu.models import unet

    cfg = tiny_cfg()
    params = jax.device_get(init_matcha(jax.random.PRNGKey(2), cfg))
    sd = C.export_matcha(params, cfg)
    back = C.convert_matcha(sd, cfg)

    rng = np.random.default_rng(0)
    b, t, nf = 2, 16, cfg.encoder.n_feats
    x = rng.standard_normal((b, t, nf)).astype(np.float32)
    mu = rng.standard_normal((b, t, nf)).astype(np.float32)
    tt = np.array([0.25, 0.75], np.float32)
    mask = np.ones((b, t), np.float32)

    ours = np.asarray(unet.decoder(back["decoder"]["estimator"], x, mask, mu,
                                   tt, cfg.decoder))
    theirs = tm.unet_decoder(
        back["decoder"]["estimator"],
        torch.from_numpy(x).permute(0, 2, 1),
        torch.from_numpy(mask).unsqueeze(1),
        torch.from_numpy(mu).permute(0, 2, 1),
        torch.from_numpy(tt),
        cfg.decoder.num_heads, cfg.decoder.attention_head_dim,
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_hifigan_weight_norm_folding():
    """Build a weight-normed state dict, fold it, and compare against the
    plain-weight path."""
    cfg = HiFiGANConfig(
        upsample_rates=(8,), upsample_kernel_sizes=(16,),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=8,
    )
    gen = hifigan.init_generator(jax.random.PRNGKey(3), cfg)

    # export to torch layout and split weight -> (g, v)
    sd = {}
    sd["conv_pre.weight"] = C.conv_w_inv(np.asarray(gen["conv_pre"]["weight"]))
    sd["conv_pre.bias"] = np.asarray(gen["conv_pre"]["bias"])
    sd["ups.0.weight"] = C.convT_w_inv(np.asarray(gen["ups"][0]["weight"]))
    sd["ups.0.bias"] = np.asarray(gen["ups"][0]["bias"])
    for j in range(2):
        for cname in ("convs1", "convs2"):
            w = C.conv_w_inv(np.asarray(gen["resblocks"][0][cname][j]["weight"]))
            sd[f"resblocks.0.{cname}.{j}.weight"] = w
            sd[f"resblocks.0.{cname}.{j}.bias"] = np.asarray(
                gen["resblocks"][0][cname][j]["bias"])
    sd["conv_post.weight"] = C.conv_w_inv(np.asarray(gen["conv_post"]["weight"]))
    sd["conv_post.bias"] = np.asarray(gen["conv_post"]["bias"])

    # split into weight_g / weight_v like torch weight_norm would
    split = {}
    for k, v in sd.items():
        if k.endswith(".weight"):
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            split[k[:-7] + ".weight_g"] = norm
            split[k[:-7] + ".weight_v"] = v
        else:
            split[k] = v

    back = C.convert_hifigan(split, cfg)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 6, 8)).astype(np.float32)
    w1 = np.asarray(hifigan.generator(gen, mel, cfg))
    w2 = np.asarray(hifigan.generator(back, mel, cfg))
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_synthesize_same_after_roundtrip():
    cfg = tiny_cfg()
    params = init_matcha(jax.random.PRNGKey(4), cfg)
    sd = C.export_matcha(jax.device_get(params), cfg)
    back = C.convert_matcha(sd, cfg)
    x = np.zeros((1, 16), np.int32)
    x[0, :9] = np.arange(1, 10)
    xl = np.asarray([9], np.int32)
    o1 = synthesize(params, jax.random.PRNGKey(5), x, xl, cfg,
                    n_timesteps=2, t_y_max=32)
    o2 = synthesize(back, jax.random.PRNGKey(5), x, xl, cfg,
                    n_timesteps=2, t_y_max=32)
    np.testing.assert_allclose(np.asarray(o1.mel), np.asarray(o2.mel), atol=1e-5)


def test_config_json_roundtrip():
    from matcha_tts_tpu.config import (MatchaConfig, config_from_dict,
                                       config_to_dict)

    cfg = tiny_cfg()
    d = config_to_dict(cfg)
    back = config_from_dict(MatchaConfig, d)
    assert back == cfg
    # default preset round-trips too (incl. tuples and nested configs)
    full = MatchaConfig()
    assert config_from_dict(MatchaConfig, config_to_dict(full)) == full


def test_orbax_io_roundtrip(tmp_path):
    import jax.numpy as jnp

    from matcha_tts_tpu.params.io import load_orbax_matcha
    from matcha_tts_tpu.train.loop import Checkpointer
    from matcha_tts_tpu.train.train_state import TrainState, create_train_state
    from matcha_tts_tpu.config import TrainConfig

    cfg = tiny_cfg()
    params = init_matcha(jax.random.PRNGKey(9), cfg)
    state = create_train_state(params, TrainConfig(batch_size=2))
    ck = Checkpointer(tmp_path / "ckpt", keep=2)
    ck.save(5, jax.device_get(state), cfg)
    params2, cfg2 = load_orbax_matcha(tmp_path)
    assert cfg2 == cfg
    a = jax.tree.leaves(jax.device_get(params))
    b = jax.tree.leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_torch_checkpoint_file_roundtrip(tmp_path):
    """Save a Lightning-style torch checkpoint (model.-prefixed state dict)
    and load it through the real file path (main.py:94-111 semantics)."""
    cfg = tiny_cfg()
    params = jax.device_get(init_matcha(jax.random.PRNGKey(11), cfg))
    sd = C.export_matcha(params, cfg)
    ckpt = {
        "state_dict": {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "epoch": 3,
    }
    path = tmp_path / "matcha.ckpt"
    torch.save(ckpt, path)

    loaded_sd = C.load_torch_state_dict(path)
    assert "encoder.emb.weight" in loaded_sd  # prefix stripped
    back = C.convert_matcha(loaded_sd, cfg)
    assert_tree_equal(params, back)

    from matcha_tts_tpu.params.io import load_matcha_any

    back2, cfg2 = load_matcha_any(path, cfg)
    assert_tree_equal(params, back2)


def test_self_describing_checkpoint_reconstructs_config(tmp_path):
    """A checkpoint whose hyper_parameters embed the full nested
    MatchaConfig (config_to_json layout — what wer_e2e.py --save-artifacts
    writes) must load through `load_models` with NO cfg argument and come
    back with the exact non-default config + identical parameters."""
    import json

    from matcha_tts_tpu.config import config_to_json
    from matcha_tts_tpu.inference.cli import load_models

    cfg = tiny_cfg()
    assert cfg != MatchaConfig()
    params = jax.device_get(init_matcha(jax.random.PRNGKey(3), cfg))
    sd = C.export_matcha(params, cfg)
    ckpt = {
        "state_dict": {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": json.loads(config_to_json(cfg)),
        "epoch": 0,
        "global_step": 1,
    }
    path = tmp_path / "self_describing.ckpt"
    torch.save(ckpt, path)

    mp, cfg2, _, _ = load_models(checkpoint=str(path))
    assert cfg2 == cfg
    assert_tree_equal(params, mp)


def test_fullsize_lightning_checkpoint_file_to_wav(tmp_path):
    """A synthetic FULL-SIZE Lightning-format .ckpt — `model.`-prefixed
    state_dict, `hyper_parameters`, epoch/global_step, mel-stat buffers —
    loaded through the inference CLI's loader (main.py:94-129 surface),
    must yield the identical parameter tree and drive file-to-wav
    synthesis identically to the in-memory tree."""
    from matcha_tts_tpu.inference.cli import load_models
    from matcha_tts_tpu.inference.synthesizer import Synthesizer

    cfg = MatchaConfig()  # full 18M-param LJSpeech preset
    params = jax.device_get(init_matcha(jax.random.PRNGKey(21), cfg))
    sd = C.export_matcha(params, cfg)
    assert "mel_mean" in sd and "mel_std" in sd  # buffers travel in the ckpt
    ckpt = {
        "state_dict": {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        # Lightning's save_hyperparameters() payload (train_standalone.py:595)
        "hyper_parameters": {"n_vocab": 178, "n_feats": 80,
                             "mel_mean": -5.536622, "mel_std": 2.116101},
        "epoch": 117,
        "global_step": 12345,
    }
    path = tmp_path / "matcha_fullsize.ckpt"
    torch.save(ckpt, path)

    mp, cfg2, vp, hcfg = load_models(checkpoint=str(path))
    assert_tree_equal(params, mp)

    # file-to-wav equivalence: same seed, same text -> identical bytes
    text = "The Lightning checkpoint loader round trips."
    w_file = np.asarray(
        Synthesizer(mp, cfg2, vp, hcfg).synthesize(text, n_timesteps=2).wav)
    w_mem = np.asarray(
        Synthesizer(params, cfg, vp, hcfg).synthesize(text, n_timesteps=2).wav)
    np.testing.assert_array_equal(w_file, w_mem)


# ---------------------------------------------------------------------------
# Vocos converter (params/convert.py::convert_vocos / export_vocos)
# ---------------------------------------------------------------------------


def _tiny_vocos_cfg():
    from matcha_tts_tpu.config import VocosConfig

    return VocosConfig(num_mels=8, dim=32, intermediate_dim=64, num_layers=2,
                       n_fft=64, hop_length=16)


def test_vocos_export_convert_roundtrip():
    from matcha_tts_tpu.models import vocos

    cfg = _tiny_vocos_cfg()
    params = vocos.init_vocos(jax.random.PRNGKey(0), cfg)
    sd = C.export_vocos(params)
    back = C.convert_vocos(sd, cfg)
    assert_tree_equal(jax.tree.map(np.asarray, params), back)
    # layer count is also inferable from the key namespace alone
    back2 = C.convert_vocos(sd, type("NoLayers", (), {})())
    assert_tree_equal(back, back2)


def test_vocos_converted_checkpoint_matches_official_forward():
    """A state dict in the official charactr/vocos naming + torch layouts,
    converted through convert_vocos, must produce the same audio as an
    independent torch execution of the official forward consuming the raw
    tensors — converted Vocos checkpoints are interchangeable."""
    from matcha_tts_tpu.models import vocos

    cfg = _tiny_vocos_cfg()
    params = vocos.init_vocos(jax.random.PRNGKey(1), cfg)
    sd = C.export_vocos(params)  # official naming, torch-native layouts

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, cfg.num_mels, 12)).astype(np.float32)

    with torch.no_grad():
        ref = tm.vocos_generate_official(
            sd, torch.from_numpy(mel.copy()), cfg).numpy()
    import jax.numpy as jnp

    ours = np.asarray(vocos.generate(C.convert_vocos(sd, cfg),
                                     jnp.asarray(mel.transpose(0, 2, 1)), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_vocos_config_inferred_from_state_dict():
    """Architecture hyperparameters are recovered from tensor shapes, so
    official checkpoints self-describe (hop/sr stay caller-supplied)."""
    from matcha_tts_tpu.models import vocos

    cfg = _tiny_vocos_cfg()
    sd = C.export_vocos(vocos.init_vocos(jax.random.PRNGKey(0), cfg))
    got = C.vocos_config_from_state_dict(sd, sampling_rate=cfg.sampling_rate,
                                         hop_length=cfg.hop_length)
    assert got == cfg


def test_cli_rejects_mel_count_mismatch_vocos_checkpoint(tmp_path):
    """A 100-mel official-style vocos checkpoint against the 80-mel
    acoustic model fails fast with an actionable error (main.py:139-149
    loader surface, extended to the second family)."""
    import pytest

    from matcha_tts_tpu.config import VocosConfig
    from matcha_tts_tpu.inference.cli import load_models
    from matcha_tts_tpu.models import vocos

    cfg100 = VocosConfig(num_mels=100, dim=32, intermediate_dim=64,
                         num_layers=2, n_fft=64)
    sd = C.export_vocos(vocos.init_vocos(jax.random.PRNGKey(0), cfg100))
    path = tmp_path / "vocos100.pt"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)

    with pytest.raises(ValueError, match="100-mel"):
        load_models(None, str(path), vocoder_family="vocos")


def test_cli_loads_matching_vocos_checkpoint(tmp_path):
    """An 80-mel vocos checkpoint loads through the CLI surface and the
    derived config matches the file's architecture."""
    from matcha_tts_tpu.inference.cli import load_models
    from matcha_tts_tpu.models import vocos

    from matcha_tts_tpu.config import VocosConfig

    cfg80 = VocosConfig(num_mels=80, dim=32, intermediate_dim=64,
                        num_layers=2, n_fft=64)
    sd = C.export_vocos(vocos.init_vocos(jax.random.PRNGKey(0), cfg80))
    path = tmp_path / "vocos80.pt"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)

    _, _, vp, hcfg = load_models(None, str(path), vocoder_family="vocos")
    assert hcfg.num_mels == 80 and hcfg.dim == 32 and hcfg.n_fft == 64
    assert vp["embed"]["weight"].shape == (7, 80, 32)
