"""Vocoder GAN training CLI.

The reference vendors HiFi-GAN's models but ships NO vocoder trainer (the
generator is loaded pretrained, /root/reference/main.py:139-149); this CLI
makes the vendored training recipe runnable end to end on TPU for either
vocoder family:

  python -m matcha_tts_tpu.train.vocoder_cli --data_root LJSpeech-1.1 \
      [--family hifigan|vocos] [--discriminators mpd,msd|mpd,mrd] \
      [--segment_size 8192] [--batch_size 16] [--steps 100000] \
      [--work_dir runs/vocoder]

Recipe per the vendored config (hifigan/config.py:4-8): Adam(0.8, 0.99),
lr 2e-4 with exponential decay, random hop-aligned segment crops
(meldataset.py:140-152), LS-GAN + feature-matching + 45x mel-L1 losses.
Defaults: HiFi-GAN trains against MPD+MSD (the HiFi-GAN paper recipe),
Vocos against MPD+MRD (its paper pairing).
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="Vocoder GAN training (TPU)")
    ap.add_argument("--data_root", type=str, default="LJSpeech-1.1")
    ap.add_argument("--train_filelist", type=str, default=None)
    ap.add_argument("--family", default="hifigan",
                    choices=("hifigan", "vocos"))
    ap.add_argument("--discriminators", type=str, default=None,
                    help="comma-separated families (default: mpd,msd for "
                         "hifigan; mpd,mrd for vocos)")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment_size", type=int, default=8192,
                    help="training crop in samples (hifigan/config.py:9)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--grad_clip", type=float, default=0.0,
                    help="> 0: global-norm gradient clipping (stabilizes "
                         "GAN training on silence-heavy corpora)")
    ap.add_argument("--steps", type=int, default=100000)
    ap.add_argument("--work_dir", type=str, default="runs/vocoder")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--weight_norm", action="store_true",
                    help="train in the reference's (v, g) parameterization")
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--no_resume", action="store_true")
    ap.add_argument("--debug_tiny", action="store_true",
                    help="tiny model config for smoke tests / CI")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard the batch over all devices (1-D ICI mesh); "
                         "parameters replicated, gradients all-reduced by "
                         "XLA — the GAN equivalent of the acoustic "
                         "trainer's fit(mesh=...) and of the reference "
                         "recipe's dist_backend (hifigan/config.py:27)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from matcha_tts_tpu.config import AudioConfig, HiFiGANConfig, VocosConfig
    from matcha_tts_tpu.data.dataset import (PrefetchIterator, TextMelDataset,
                                             create_filelists)
    from matcha_tts_tpu.train.loop import (Checkpointer, GracefulShutdown,
                                           MetricsLogger)
    from matcha_tts_tpu.train.vocoder import (create_gan_state, gan_disc_step,
                                              gan_gen_step, random_segment_np)

    acfg = AudioConfig()
    if args.family == "vocos":
        hcfg = (VocosConfig(dim=32, intermediate_dim=64, num_layers=2)
                if args.debug_tiny else VocosConfig())
        discs = ("mpd", "mrd")
    else:
        hcfg = (HiFiGANConfig(upsample_initial_channel=32)
                if args.debug_tiny else HiFiGANConfig())
        discs = ("mpd", "msd")
    if args.discriminators:
        discs = tuple(args.discriminators.split(","))
    assert hcfg.total_upsample == acfg.hop_length, (
        "vocoder hop must match the mel hop")

    if args.train_filelist:
        train_fl = args.train_filelist
    else:
        train_fl, _ = create_filelists(args.data_root)
    ds = TextMelDataset(train_fl, acfg, seed=args.seed)
    print(f"{len(ds)} training utterances; family={args.family} "
          f"discriminators={discs}")

    clip = args.grad_clip or None
    from pathlib import Path

    work = Path(args.work_dir)
    # The opt-state pytree depends on grad_clip (apply_if_finite wrapper)
    # and on the discriminator set / weight-norm parameterization; restoring
    # a checkpoint saved under different settings fails with an opaque
    # Orbax/optax tree-structure error (ADVICE r4).  Record the structure-
    # defining settings beside the checkpoints and fail loudly on mismatch
    # BEFORE building the state.
    import json

    meta_path = work / "gan_meta.json"
    meta = {"family": args.family, "discriminators": sorted(discs),
            "weight_norm": bool(args.weight_norm),
            "grad_clip": clip}
    if not args.no_resume and meta_path.exists():
        saved = json.loads(meta_path.read_text())
        if saved != meta:
            raise SystemExit(
                f"--work_dir {work} holds checkpoints trained with "
                f"{saved}, but this invocation asks for {meta}. Re-run "
                f"with matching flags to resume, or pass --no_resume / a "
                f"fresh --work_dir to start over.")
    state = create_gan_state(jax.random.PRNGKey(args.seed), hcfg,
                             learning_rate=args.lr,
                             use_weight_norm=args.weight_norm,
                             discriminators=discs, grad_clip=clip)
    logger = MetricsLogger(work)
    ckpt = Checkpointer(work / "ckpt", keep=3)
    meta_path.write_text(json.dumps(meta))
    start_step = 0
    if not args.no_resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_step = int(np.asarray(state.step))
            print(f"resumed from step {start_step}")

    mesh = None
    if args.data_parallel:
        from matcha_tts_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        ndev = mesh.devices.size
        if args.batch_size % ndev:
            raise SystemExit(f"--batch_size {args.batch_size} must divide "
                             f"the {ndev}-device mesh")
        state = pmesh.replicate(mesh, state)
        print(f"data-parallel over {ndev} devices "
              f"({args.batch_size // ndev} segments/device)")

    rng = np.random.default_rng(args.seed)

    import functools

    # wav decode is pure host work fully serialized with the device steps
    # (one CPU core) — a bounded LRU keeps the hot set decoded (~300 MB at
    # 512 LJSpeech-length clips) instead of re-reading disk 16x per step
    @functools.lru_cache(maxsize=512)
    def _wav(idx: int) -> np.ndarray:
        return ds.load_audio(idx)

    def batch_stream():
        for _ in range(start_step, args.steps):
            yield np.stack([
                random_segment_np(rng, _wav(int(i)), args.segment_size,
                                  acfg.hop_length)
                for i in rng.integers(0, len(ds), size=args.batch_size)])

    t0 = time.perf_counter()
    last_logged = done = start_step
    # decode+crop runs in a prefetch thread so host data work overlaps the
    # device step; SIGTERM/SIGINT checkpoint before exiting (preemptible
    # TPU slices get a grace period, not a clean stop)
    with GracefulShutdown() as shutdown:
        for step, audio in zip(range(start_step, args.steps),
                               PrefetchIterator(batch_stream(), depth=2)):
            if mesh is not None:
                from matcha_tts_tpu.parallel.mesh import shard_batch

                audio = shard_batch(mesh, audio)
            state, d_loss = gan_disc_step(state, audio, hcfg, acfg,
                                          lr=args.lr,
                                          weight_norm=args.weight_norm,
                                          grad_clip=clip)
            state, metrics = gan_gen_step(state, audio, hcfg, acfg,
                                          lr=args.lr,
                                          weight_norm=args.weight_norm,
                                          grad_clip=clip)
            done = step + 1
            if done % args.log_every == 0 or step == start_step:
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                n = done - last_logged
                last_logged = done
                logger.log(done, "train",
                           {"disc_loss": float(d_loss),
                            **{k: float(v) for k, v in metrics.items()},
                            "sec_per_step": dt / max(n, 1)})
            if done % args.ckpt_every == 0 or done == args.steps:
                ckpt.save(done, state)
            if shutdown.requested:
                break
    if shutdown.requested and ckpt.mngr.latest_step() != done:
        ckpt.save(done, state)
        print(f"[shutdown] checkpointed at step {done}; rerun with the same "
              f"--work_dir to resume", flush=True)
    print(f"done: {done} steps -> {work}")
    return state


if __name__ == "__main__":
    main()
