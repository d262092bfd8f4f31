"""Inference CLI — the `main.py` equivalent (reference: main.py:155-217).

Usage:
  python -m matcha_tts_tpu.inference.cli \
      --text "Hello world." \
      [--checkpoint matcha.ckpt] [--vocoder generator_v1] \
      [--nfe 10] [--temperature 0.667] [--length-scale 1.0] \
      [--output infer_output.wav] [--denoise 0.00025]

Loads a converted (or PyTorch) Matcha checkpoint and a HiFi-GAN v1
generator; without checkpoints it runs randomly-initialized weights (for
smoke testing / benchmarking shapes).  The alignment heatmap PNG of the
reference (main.py:204-214) is written as a .npy when matplotlib is
unavailable.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np


def load_models(checkpoint=None, vocoder=None, cfg=None, hcfg=None,
                vocoder_family="hifigan"):
    """Load (or randomly initialize) Matcha + vocoder parameter trees.

    Accepts torch .ckpt/.pt checkpoints (Lightning `model.` prefix handled
    by the converter) or http(s) URLs (auto-downloaded once into the local
    cache, main.py:139-142 semantics; see utils/fetch.py) — shared by the
    inference CLI and the HTTP server.

    `vocoder_family` picks the mel->wav family when `hcfg` is not given:
    "hifigan" (reference parity) or "vocos" (frame-rate iSTFT family;
    vocoder checkpoints are then read in the official charactr/vocos
    naming via params.convert.convert_vocos).
    Returns (matcha_params, cfg, vocoder_params, hcfg).
    """
    from matcha_tts_tpu.config import (HiFiGANConfig, MatchaConfig,
                                       VocosConfig, config_from_dict)
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.matcha import init_matcha
    from matcha_tts_tpu.params.convert import (
        convert_hifigan,
        convert_matcha,
        convert_vocos,
        load_torch_checkpoint,
        load_torch_state_dict,
        vocos_config_from_state_dict,
    )

    if hcfg is None:
        hcfg = VocosConfig() if vocoder_family == "vocos" else HiFiGANConfig()

    if checkpoint:
        print(f"Loading Matcha checkpoint from {checkpoint} ...")
        sd, hyper = load_torch_checkpoint(checkpoint)
        if cfg is None and isinstance(hyper, dict) and "encoder" in hyper:
            # our checkpoints embed the full nested MatchaConfig as
            # hyper_parameters (config_to_json layout) — self-describing
            cfg = config_from_dict(MatchaConfig, hyper)
            print("Model config reconstructed from checkpoint "
                  "hyper_parameters.")
        cfg = cfg or MatchaConfig()
        matcha_params = convert_matcha(sd, cfg)
        if "mel_mean" in sd:
            print("Found mel_mean in checkpoint: "
                  f"{np.asarray(sd['mel_mean']).reshape(-1)[0]}")
            print("Found mel_std in checkpoint: "
                  f"{np.asarray(sd['mel_std']).reshape(-1)[0]}")
    else:
        print("No checkpoint given — using randomly initialized weights.")
        cfg = cfg or MatchaConfig()
        matcha_params = init_matcha(jax.random.PRNGKey(0), cfg)

    family = "vocos" if isinstance(hcfg, VocosConfig) else "hifigan"
    if vocoder:
        print(f"Loading {family} vocoder from {vocoder} ...")
        vsd = load_torch_state_dict(vocoder)
        if family == "vocos":
            # the checkpoint's tensor shapes define the architecture;
            # keep the caller's hop/sampling-rate (not stored in the sd)
            hcfg = vocos_config_from_state_dict(
                vsd, sampling_rate=hcfg.sampling_rate,
                hop_length=hcfg.hop_length)
            if hcfg.num_mels != cfg.audio.n_mels:
                raise ValueError(
                    f"vocos checkpoint expects {hcfg.num_mels}-mel input but "
                    f"this acoustic model produces {cfg.audio.n_mels} mels "
                    f"(published charactr/vocos mel checkpoints are 100-mel/"
                    f"24 kHz).  Train or fine-tune a matching vocos vocoder "
                    f"with `python -m matcha_tts_tpu.train.vocoder_cli "
                    f"--family vocos`.")
            vocoder_params = convert_vocos(vsd, hcfg)
        else:
            vocoder_params = convert_hifigan(vsd, hcfg)
    else:
        print(f"No vocoder checkpoint — using randomly initialized {family}.")
        vocoder_params = vocoder_mod.init_vocoder(jax.random.PRNGKey(1), hcfg)
    return matcha_params, cfg, vocoder_params, hcfg


def main(argv=None):
    parser = argparse.ArgumentParser(description="Matcha-TTS (TPU) inference")
    parser.add_argument("--text", type=str,
                        default="Hello! I am running on the TPU-native model.")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Matcha checkpoint (.ckpt torch or orbax dir; "
                             "http(s) URLs are auto-downloaded)")
    parser.add_argument("--vocoder", type=str, default=None,
                        help="HiFi-GAN generator checkpoint (torch path or "
                             "http(s) URL, downloaded once into the cache)")
    parser.add_argument("--nfe", type=int, default=10)
    parser.add_argument("--temperature", type=float, default=0.667)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--denoise", type=float, default=0.0,
                        help="denoiser strength (0.00025 in the reference notebooks)")
    parser.add_argument("--output", type=str, default="infer_output.wav")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--spk", type=int, default=None,
                        help="speaker id (multi-speaker checkpoints)")
    parser.add_argument("--long-form", action="store_true",
                        help="split on sentences/'|' and synthesize chunked")
    parser.add_argument("--vocoder-family", default="hifigan",
                        choices=("hifigan", "vocos"),
                        help="mel->wav vocoder family (vocos expects "
                             "--vocoder checkpoints in the official "
                             "charactr/vocos naming)")
    parser.add_argument("--mrf-kernel", default=None,
                        choices=("xla", "tap", "packed", "int8", "auto"),
                        help="vocoder MRF implementation override "
                             "(HiFiGANConfig.mrf_kernel; 'int8' is the "
                             "opt-in quantized max-throughput mode)")
    args = parser.parse_args(argv)

    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models.denoiser import denoise as run_denoise
    from matcha_tts_tpu.models.denoiser import make_denoiser
    from matcha_tts_tpu.utils.wav import write_wav

    if args.mrf_kernel is not None and args.vocoder_family != "hifigan":
        parser.error("--mrf-kernel only applies to the HiFi-GAN family "
                     f"(got --vocoder-family {args.vocoder_family})")
    matcha_params, cfg, vocoder_params, hcfg = load_models(
        args.checkpoint, args.vocoder, vocoder_family=args.vocoder_family)
    if args.mrf_kernel is not None:
        import dataclasses

        # int8_levels is only valid with mrf_kernel="int8"; clear it when
        # the CLI switches a (possibly int8-gated) config to another kernel
        hcfg = dataclasses.replace(
            hcfg, mrf_kernel=args.mrf_kernel,
            int8_levels=(hcfg.int8_levels
                         if args.mrf_kernel == "int8" else None))

    syn = Synthesizer(matcha_params, cfg, vocoder_params, hcfg)

    print(f"Input Text: {args.text}")
    t0 = time.perf_counter()
    if args.long_form or "|" in args.text:
        result = syn.synthesize_long(args.text, n_timesteps=args.nfe,
                                     temperature=args.temperature,
                                     length_scale=args.length_scale,
                                     seed=args.seed)
    else:
        result = syn.synthesize(args.text, n_timesteps=args.nfe,
                                temperature=args.temperature,
                                length_scale=args.length_scale,
                                seed=args.seed, spk=args.spk)
    dt = time.perf_counter() - t0

    mel = result.mel
    print(f"Mel Shape: {mel.shape}")
    print(f"Mel Min: {mel.min():.4f}, Max: {mel.max():.4f}, Mean: {mel.mean():.4f}")

    wav = result.wav
    if args.denoise > 0:
        state = make_denoiser(vocoder_params, hcfg)
        wav = np.asarray(run_denoise(state, wav[None], strength=args.denoise))[0]

    sr = cfg.audio.sample_rate
    write_wav(args.output, wav, sr)
    audio_sec = len(wav) / sr
    print(f"Done! Saved {audio_sec:.2f}s to {args.output} "
          f"({dt:.3f}s wall, RTF {dt / max(audio_sec, 1e-9):.4f})")

    # alignment plot (reference main.py:204-214)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 4))
        plt.imshow(result.attn, origin="lower", aspect="auto")
        plt.colorbar()
        plt.title("Alignment (Attention)")
        plt.xlabel("Mel Frames")
        plt.ylabel("Text Tokens")
        plt.savefig("alignment.png")
        print("Saved alignment plot to alignment.png")
    except Exception:
        np.save("alignment.npy", result.attn)
        print("matplotlib unavailable — saved alignment.npy")


if __name__ == "__main__":
    main()
