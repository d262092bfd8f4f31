"""Data pipeline: filelists, WAV loading, bucketed batching
(reference: /root/reference/train_standalone.py:344-483).

Differences from the reference, by design:
* mel extraction happens ON DEVICE per batch (ops/stft.py), not in 8
  dataloader worker processes on host CPU;
* text is phonemized once up front (the reference re-phonemizes per item
  per epoch — SURVEY.md §3.2 flags this as a hot spot);
* batches are padded to static (text, frame) buckets instead of the
  dynamic per-batch max, so XLA compiles once per bucket pair.

WAV I/O uses scipy.io.wavfile (the exact reader HiFi-GAN's meldataset
uses, hifigan/meldataset.py:12,17-19); torchaudio/librosa/soundfile are
not required.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from matcha_tts_tpu.config import AudioConfig, TrainConfig
from matcha_tts_tpu.ops.masking import fix_len_compatibility
from matcha_tts_tpu.text.tokenizer import encode_text


def parse_filelist(filelist_path, split_char: str = "|") -> List[List[str]]:
    """`wav_path|text` per line (train_standalone.py:346-349)."""
    with open(filelist_path, encoding="utf-8") as f:
        return [line.strip().split(split_char) for line in f if line.strip()]


def load_wav(path) -> Tuple[np.ndarray, int]:
    """Read a WAV file to float32 in [-1, 1] (hifigan/meldataset.py:17-19
    semantics: int16 PCM divided by 32768)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr


def create_filelists(data_root, val_fraction: float = 0.05):
    """LJSpeech-style metadata.csv -> train.txt/val.txt with full wav paths
    (reference: train_standalone.py:714-754, 95/5 split)."""
    data_root = Path(data_root)
    metadata = data_root / "metadata.csv"
    if not metadata.exists():
        raise FileNotFoundError(f"metadata.csv not found in {data_root}")
    lines = []
    for raw in metadata.read_text(encoding="utf-8").splitlines():
        parts = raw.strip().split("|")
        if len(parts) >= 2:
            wav = str(data_root / "wavs" / f"{parts[0]}.wav")
            lines.append("|".join([wav] + parts[1:]) + "\n")
    # NOTE: the reference computes train = lines[:-num_val]
    # (train_standalone.py:737-739), which silently produces an EMPTY train
    # list when num_val rounds to 0; clamp to at least one val item and
    # split with explicit indices instead.
    num_val = max(1, int(len(lines) * val_fraction))
    n_train = max(1, len(lines) - num_val)
    train_path, val_path = data_root / "train.txt", data_root / "val.txt"
    train_path.write_text("".join(lines[:n_train]), encoding="utf-8")
    val_path.write_text("".join(lines[n_train:]) or lines[-1], encoding="utf-8")
    return str(train_path), str(val_path)


@dataclasses.dataclass
class Utterance:
    tokens: np.ndarray      # int32 (2n+1 interspersed)
    audio_path: str
    spk: Optional[int]
    n_frames_hint: int      # estimated frame count for bucketing


class TextMelDataset:
    """Host-side dataset: tokenized text + wav paths; audio is loaded lazily
    and featurized on device by the batcher."""

    def __init__(self, filelist_path, audio: AudioConfig, n_spks: int = 1,
                 add_blank: bool = True, seed: Optional[int] = 42,
                 cleaners: Sequence[str] = ("english_cleaners2",)):
        self.audio = audio
        self.n_spks = n_spks
        entries = parse_filelist(filelist_path)
        if seed is not None:
            random.Random(seed).shuffle(entries)
        self.items: List[Utterance] = []
        for parts in entries:
            if n_spks > 1:
                path, spk, text = parts[0], int(parts[1]), parts[2]
            else:
                path, text = parts[0], parts[-1]
                spk = None
            tokens = encode_text(text, add_blank=add_blank, cleaner_names=cleaners)
            self.items.append(Utterance(tokens, path, spk, 0))

    def __len__(self):
        return len(self.items)

    def load_audio(self, idx: int) -> np.ndarray:
        wav, sr = load_wav(self.items[idx].audio_path)
        assert sr == self.audio.sample_rate, (
            f"Expected {self.audio.sample_rate} Hz, got {sr} Hz"
        )
        return wav

    def n_frames(self, wav_len: int) -> int:
        # center=False with (n_fft - hop)/2 reflect padding on both sides:
        # frames = 1 + (L + 2*pad - n_fft) // hop = L // hop (for the
        # reference's n_fft=1024, hop=256, pad=384)
        a = self.audio
        pad = int((a.n_fft - a.hop_length) / 2)
        return 1 + (wav_len + 2 * pad - a.n_fft) // a.hop_length


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class PrefetchIterator:
    """Background-thread prefetch over an iterable of host batches.

    The reference hides host work behind 8 DataLoader worker processes
    (train_standalone.py:546-554); here one thread with a small queue is
    enough because featurization happens on device — only WAV reads and
    numpy padding stay on host.  Exceptions re-raise in the consumer.
    """

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001 - reraised below
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class BucketBatcher:
    """Yields fixed-shape numpy batches: token ids padded to a text bucket,
    raw audio padded to `frame_bucket * hop` samples, plus true lengths.

    Mirrors TextMelBatchCollate's zero padding (train_standalone.py:440-483)
    but with static shapes; frame buckets are multiples of
    2**num_downsamples like fix_len_compatibility (train_standalone.py:447).
    """

    def __init__(self, dataset: TextMelDataset, cfg: TrainConfig,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        for b in cfg.frame_buckets:
            assert b == fix_len_compatibility(b), (
                f"frame bucket {b} not a multiple of 4"
            )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)
            self.seed += 1
        bs = self.cfg.batch_size
        for start in range(0, len(order), bs):
            idxs = order[start : start + bs]
            if len(idxs) < bs and self.drop_last:
                break
            yield self.collate([int(i) for i in idxs])

    def collate(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        ds, cfg = self.ds, self.cfg
        toks = [ds.items[i].tokens for i in idxs]
        spks = [ds.items[i].spk for i in idxs]

        t_x = pick_bucket(max(len(t) for t in toks), cfg.text_buckets)

        from matcha_tts_tpu.native import wavio_native

        b = len(idxs)
        use_native = wavio_native.native_available()
        if use_native:
            # two-phase native load: header-only scan picks the frame
            # bucket, then C++ threads decode straight into the padded
            # batch buffer (no per-item Python arrays)
            paths = [ds.items[i].audio_path for i in idxs]
            wav_lens, srs = wavio_native.wav_lengths(paths)
            for i, sr in enumerate(srs):
                assert sr == ds.audio.sample_rate, (
                    f"{paths[i]}: expected {ds.audio.sample_rate} Hz, got {sr}")
            n_frames = [ds.n_frames(int(l)) for l in wav_lens]
        else:
            wavs = [ds.load_audio(i) for i in idxs]
            n_frames = [ds.n_frames(len(w)) for w in wavs]
        t_y = pick_bucket(max(n_frames), cfg.frame_buckets)

        hop = ds.audio.hop_length
        # audio length that yields exactly t_y frames
        wav_len = (t_y - 1) * hop + ds.audio.n_fft - 2 * int(
            (ds.audio.n_fft - hop) / 2
        )

        x = np.zeros((b, t_x), np.int32)
        audio = np.zeros((b, wav_len), np.float32)
        x_lengths = np.zeros((b,), np.int32)
        y_lengths = np.zeros((b,), np.int32)
        if use_native:
            wavio_native.load_wav_batch_into(paths, audio)
        for i, (t, nf) in enumerate(zip(toks, n_frames)):
            n = min(len(t), t_x)
            x[i, :n] = t[:n]
            x_lengths[i] = n
            if not use_native:
                w = wavs[i]
                m = min(len(w), wav_len)
                audio[i, :m] = w[:m]
            y_lengths[i] = min(nf, t_y)

        batch = {
            "x": x,
            "x_lengths": x_lengths,
            "audio": audio,
            "y_lengths": y_lengths,
        }
        if ds.n_spks > 1:
            batch["spks"] = np.asarray(spks, np.int32)
        return batch
