"""Native batch WAV loader: bit-parity with the Python reader, threading,
error handling, and the collate integration."""

import numpy as np
import pytest

from matcha_tts_tpu.data.dataset import load_wav
from matcha_tts_tpu.native import wavio_native
from matcha_tts_tpu.utils.wav import write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, refs = [], []
    for i, n in enumerate((1000, 4096, 22050)):
        audio = (rng.standard_normal(n) * 0.3).astype(np.float32)
        p = d / f"a{i}.wav"
        write_wav(p, audio, 22050)
        paths.append(str(p))
        refs.append(load_wav(p)[0])
    return d, paths, refs


def test_native_builds():
    assert wavio_native.native_available(), "g++ toolchain expected in image"


def test_header_scan_matches(wav_dir):
    _, paths, refs = wav_dir
    lens, srs = wavio_native.wav_lengths(paths)
    assert list(lens) == [len(r) for r in refs]
    assert (srs == 22050).all()


def test_batch_decode_bit_parity(wav_dir):
    _, paths, refs = wav_dir
    cap = max(len(r) for r in refs) + 64
    out = np.full((len(paths), cap), -7.0, np.float32)
    lens, srs = wavio_native.load_wav_batch_into(paths, out, n_threads=4)
    for i, r in enumerate(refs):
        np.testing.assert_array_equal(out[i, : len(r)], r)
        assert (out[i, len(r):] == 0.0).all()  # zero-padded tail
        assert lens[i] == len(r)


def test_truncation(wav_dir):
    _, paths, refs = wav_dir
    cap = 512
    out = np.zeros((len(paths), cap), np.float32)
    lens, _ = wavio_native.load_wav_batch_into(paths, out)
    np.testing.assert_array_equal(out[0], refs[0][:cap])
    assert lens[0] == len(refs[0])  # true length reported even if truncated


def test_stereo_downmix(wav_dir, tmp_path):
    import wave

    d, _, _ = wav_dir
    rng = np.random.default_rng(1)
    stereo = (rng.standard_normal((500, 2)) * 0.3).astype(np.float32)
    pcm = (np.clip(stereo, -1, 1) * 32767.0).astype(np.int16)
    p = tmp_path / "stereo.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(pcm.reshape(-1).tobytes())
    ref = load_wav(p)[0]  # scipy path: mean over channels
    out = np.zeros((1, 500), np.float32)
    wavio_native.load_wav_batch_into([str(p)], out)
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


def test_error_paths(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not a wav file")
    with pytest.raises(IOError, match="not RIFF/WAVE"):
        wavio_native.load_wav_batch_into(
            [str(bad)], np.zeros((1, 16), np.float32))
    with pytest.raises(IOError, match="open failed"):
        wavio_native.wav_lengths([str(tmp_path / "missing.wav")])


def test_collate_uses_native(wav_dir, tmp_path):
    """BucketBatcher.collate output must be identical with and without the
    native loader."""
    from matcha_tts_tpu.config import AudioConfig, TrainConfig
    from matcha_tts_tpu.data.dataset import BucketBatcher, TextMelDataset

    d, paths, _ = wav_dir
    fl = tmp_path / "list.txt"
    fl.write_text("".join(f"{p}|hello world number {i}\n"
                          for i, p in enumerate(paths)))
    acfg = AudioConfig()
    ds = TextMelDataset(str(fl), acfg, seed=None)
    tcfg = TrainConfig(batch_size=3, text_buckets=(32,),
                       frame_buckets=(32, 64, 128))
    bb = BucketBatcher(ds, tcfg, shuffle=False)
    native_batch = bb.collate([0, 1, 2])

    orig = wavio_native.native_available
    wavio_native.native_available = lambda: False
    try:
        py_batch = bb.collate([0, 1, 2])
    finally:
        wavio_native.native_available = orig
    for k in native_batch:
        np.testing.assert_array_equal(native_batch[k], py_batch[k], err_msg=k)
