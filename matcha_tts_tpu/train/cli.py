"""Training CLI — the `train_standalone.py` equivalent
(reference: train_standalone.py:757-886).

Usage:
  python -m matcha_tts_tpu.train.cli --data_root LJSpeech-1.1 \
      [--batch_size 64] [--epochs 3000] [--lr 1e-4] [--chips N] \
      [--work_dir runs/matcha] [--max_steps N]

Data-parallel over all local devices by default (`--chips` limits the
mesh), with the LJSpeech v1 model preset.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Matcha-TTS (TPU) training")
    parser.add_argument("--data_root", type=str, default="LJSpeech-1.1")
    parser.add_argument("--train_filelist", type=str, default=None)
    parser.add_argument("--val_filelist", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=64,
                        help="GLOBAL batch size (sharded across chips)")
    parser.add_argument("--epochs", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--chips", type=int, default=None,
                        help="number of chips for the data mesh (default all)")
    parser.add_argument("--work_dir", type=str, default="runs/matcha")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--debug_tiny", action="store_true",
                        help="tiny model config for smoke tests / CI")
    args = parser.parse_args(argv)

    import jax

    from matcha_tts_tpu.config import MatchaConfig, TrainConfig
    from matcha_tts_tpu.data.dataset import create_filelists
    from matcha_tts_tpu.parallel.mesh import make_mesh
    from matcha_tts_tpu.train.loop import fit

    if args.train_filelist and args.val_filelist:
        train_fl, val_fl = args.train_filelist, args.val_filelist
    else:
        train_fl, val_fl = create_filelists(args.data_root)

    if args.debug_tiny:
        from matcha_tts_tpu.config import (DecoderConfig,
                                           DurationPredictorConfig,
                                           EncoderConfig)

        model_cfg = MatchaConfig(
            encoder=EncoderConfig(n_channels=32, filter_channels=64,
                                  n_heads=2, n_layers=1),
            duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
            decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                                  num_heads=2, n_blocks=1, num_mid_blocks=1),
        )
    else:
        model_cfg = MatchaConfig()
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        learning_rate=args.lr,
        max_epochs=args.epochs,
        seed=args.seed,
    )

    n_dev = args.chips or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    print(f"Devices: {jax.devices()[:n_dev]}  (mesh={'data' if mesh else 'single'})")
    print(f"Global batch: {args.batch_size}; lr {args.lr}; epochs {args.epochs}")

    fit(model_cfg, train_cfg, train_fl, val_fl, work_dir=args.work_dir,
        max_steps=args.max_steps, mesh=mesh, resume=not args.no_resume)


if __name__ == "__main__":
    main()
