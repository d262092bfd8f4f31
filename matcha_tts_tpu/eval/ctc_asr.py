"""Small in-repo CTC speech recognizer (JAX, TPU-first).

The reference's intelligibility metric transcribes synthesized audio with
Whisper-medium and scores WER with jiwer (MOS_audiou_generator.ipynb cells
13-14).  Whisper weights cannot be downloaded in this environment, so this
module provides a self-contained recognizer with the same *evaluation
surface*: log-mel in, text out, pluggable into `eval.wer.evaluate_wer`.

It is deliberately tiny — a dilated-conv CTC model over the exact log-mel
features the rest of the framework produces (ops/stft.py, the reference's
train_standalone.py:164-201 numerics) — so it can be trained from scratch
on an in-repo corpus in seconds and used to close the synthesize ->
transcribe -> WER loop on hardware (benchmarks/wer_e2e.py).

TPU notes: channels-last (B, T, C), static shapes, one fused jit train
step; the convs ride the MXU, CTC's alpha recursion is optax's
lax.scan implementation.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tts_tpu.models import nn
from matcha_tts_tpu.ops.masking import sequence_mask

# Character alphabet: CTC blank = 0, 'a'..'z' = 1..26, space = 27.
BLANK_ID = 0
SPACE_ID = 27
ALPHABET = "abcdefghijklmnopqrstuvwxyz "
VOCAB_SIZE = 1 + len(ALPHABET)

# log(1e-5): the mel floor of the canonical log-mel transform — what
# "silence" looks like in feature space, used to pad beyond mel_lengths.
MEL_PAD_VALUE = -11.512925


def encode_chars(text: str) -> np.ndarray:
    """Lowercased a-z/space text -> label ids (no blanks)."""
    ids = []
    for ch in text.lower():
        if ch == " ":
            ids.append(SPACE_ID)
        elif "a" <= ch <= "z":
            ids.append(ord(ch) - ord("a") + 1)
    return np.asarray(ids, np.int32)


def decode_chars(ids: Sequence[int]) -> str:
    out = []
    for i in ids:
        if i == SPACE_ID:
            out.append(" ")
        elif 1 <= i <= 26:
            out.append(chr(ord("a") + i - 1))
    return "".join(out)


@dataclasses.dataclass(frozen=True)
class CTCASRConfig:
    n_mels: int = 80
    vocab_size: int = VOCAB_SIZE
    hidden: int = 192
    kernel: int = 5
    stride: int = 2                      # stem time reduction
    dilations: Tuple[int, ...] = (1, 2, 4, 1)


def init_ctc_asr(key, cfg: CTCASRConfig) -> Dict:
    keys = jax.random.split(key, 2 + len(cfg.dilations))
    params = {
        "in_norm": nn.init_norm(cfg.n_mels),
        "stem": nn.init_conv1d(keys[0], cfg.n_mels, cfg.hidden, cfg.kernel),
        "blocks": [],
        "head": nn.init_linear(keys[1], cfg.hidden, cfg.vocab_size),
    }
    for i, _ in enumerate(cfg.dilations):
        params["blocks"].append({
            "conv": nn.init_conv1d(keys[2 + i], cfg.hidden, cfg.hidden,
                                   cfg.kernel),
            "norm": nn.init_norm(cfg.hidden),
        })
    return params


def out_lengths(mel_lengths: jnp.ndarray, cfg: CTCASRConfig) -> jnp.ndarray:
    """Frame count after the strided stem (SAME-style pad, ceil division)."""
    return (mel_lengths + cfg.stride - 1) // cfg.stride


def ctc_logits(params: Dict, mel: jnp.ndarray, mel_lengths: jnp.ndarray,
               cfg: CTCASRConfig) -> jnp.ndarray:
    """(B, T, n_mels) log-mel -> (B, ceil(T/stride), vocab) logits.

    Padding frames are forced to the mel floor before the convs so the
    batch bucket size never changes the valid-region activations.
    """
    mask = sequence_mask(mel_lengths, mel.shape[1])[..., None]
    mel = jnp.where(mask, mel, MEL_PAD_VALUE)
    x = nn.layer_norm(params["in_norm"], mel)
    pad = (cfg.kernel - 1) // 2
    x = jax.nn.gelu(nn.conv1d(params["stem"], x, stride=cfg.stride,
                              padding=pad))
    for blk, dil in zip(params["blocks"], cfg.dilations):
        h = nn.layer_norm(blk["norm"], x)
        h = jax.nn.gelu(nn.conv1d(blk["conv"], h, padding=pad * dil,
                                  dilation=dil))
        x = x + h
    return nn.linear(params["head"], x)


def ctc_asr_loss(params: Dict, mel: jnp.ndarray, mel_lengths: jnp.ndarray,
                 labels: jnp.ndarray, label_lengths: jnp.ndarray,
                 cfg: CTCASRConfig) -> jnp.ndarray:
    logits = ctc_logits(params, mel, mel_lengths, cfg)
    t_out = logits.shape[1]
    logit_pad = 1.0 - sequence_mask(out_lengths(mel_lengths, cfg),
                                    t_out).astype(jnp.float32)
    label_pad = 1.0 - sequence_mask(label_lengths,
                                    labels.shape[1]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                             blank_id=BLANK_ID)
    return jnp.mean(per_seq / jnp.maximum(label_lengths, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def _train_step(params, opt_state, mel, mel_lengths, labels, label_lengths,
                cfg: CTCASRConfig, optimizer):
    loss, grads = jax.value_and_grad(ctc_asr_loss)(
        params, mel, mel_lengths, labels, label_lengths, cfg)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_ctc_asr(key, mels: np.ndarray, mel_lengths: np.ndarray,
                  labels: np.ndarray, label_lengths: np.ndarray,
                  cfg: CTCASRConfig, steps: int = 400, lr: float = 3e-4,
                  log_every: int = 0) -> Dict:
    """Full-batch Adam training (corpora here are tens of utterances).

    Returns the trained params; `log_every > 0` prints loss progress.
    """
    params = init_ctc_asr(key, cfg)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    mel = jnp.asarray(mels)
    mel_lengths = jnp.asarray(mel_lengths)
    labels = jnp.asarray(labels)
    label_lengths = jnp.asarray(label_lengths)
    for step in range(1, steps + 1):
        params, opt_state, loss = _train_step(
            params, opt_state, mel, mel_lengths, labels, label_lengths,
            cfg, optimizer)
        if log_every and (step % log_every == 0 or step == 1):
            print(f"  asr step {step}: ctc_loss/char {float(loss):.4f}")
    return params


def greedy_decode(logits: np.ndarray, lengths: np.ndarray) -> List[str]:
    """Best-path CTC decode: argmax, collapse repeats, drop blanks.

    (A minimum-run-length filter was tried and reverted: CTC emission is
    PEAKY — real characters routinely occupy a single argmax frame with
    blanks elsewhere, so run length cannot separate glide artifacts from
    genuine characters.  Spurious peaks are suppressed by an ensemble
    decode-then-vote instead — pass a LIST of param trees to
    `transcribe_mels`/`wav_asr_callable`; see `vote_hypotheses`.)"""
    best = np.asarray(jnp.argmax(logits, axis=-1))
    lengths = np.asarray(lengths)
    texts = []
    for b in range(best.shape[0]):
        seq = best[b, : int(lengths[b])]
        collapsed = [int(s) for i, s in enumerate(seq)
                     if s != BLANK_ID and (i == 0 or s != seq[i - 1])]
        texts.append(decode_chars(collapsed))
    return texts


def _edit_distance(a: str, b: str) -> int:
    """Plain character Levenshtein (strings here are <= ~50 chars)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def vote_hypotheses(member_hyps: List[List[str]]) -> List[str]:
    """ROVER-style ensemble vote: per row, the medoid hypothesis.

    `member_hyps[m][b]` is member m's decode of row b.  Spurious
    emissions (e.g. a coarticulatory glide frame whose instantaneous
    chord matches some other character) are SEED-DEPENDENT — members
    trained from different inits make them on different sentences — so
    the hypothesis minimizing total edit distance to the other members'
    is the artifact-free one whenever any majority agrees.  (Frame-wise
    logit averaging was tried and fails catastrophically: CTC peaks are
    one frame wide and members place them on DIFFERENT frames, so the
    average favors blank everywhere and deletes real characters.)"""
    n_rows = len(member_hyps[0])
    out = []
    for b in range(n_rows):
        cands = [h[b] for h in member_hyps]
        costs = [sum(_edit_distance(c, o) for o in cands) for c in cands]
        out.append(cands[int(np.argmin(costs))])
    return out


def transcribe_mels(params, mels: np.ndarray, mel_lengths: np.ndarray,
                    cfg: CTCASRConfig) -> List[str]:
    """(B, T, n_mels) log-mel batch -> hypothesis strings.

    `params` is one trained tree or a LIST of trees (an ensemble: each
    member decodes independently, then a medoid vote per row — see
    `vote_hypotheses`).

    Works on either ground-truth features (ops/stft.py) or the acoustic
    model's synthesized mels — both live in the same denormalized log-mel
    space, exactly the features a mel-input ASR like Whisper consumes.
    """
    if isinstance(params, list):
        return vote_hypotheses([
            transcribe_mels(p, mels, mel_lengths, cfg) for p in params])
    logits = jax.jit(ctc_logits, static_argnames="cfg")(
        params, jnp.asarray(mels), jnp.asarray(mel_lengths), cfg)
    return greedy_decode(np.asarray(jax.device_get(logits)),
                         np.asarray(out_lengths(jnp.asarray(mel_lengths),
                                                cfg)))


def wav_asr_callable(params: Dict, cfg: CTCASRConfig, audio,
                     frame_bucket: int):
    """Build the `evaluate_wer` judge surface: wav16k -> hypothesis string.

    Mirrors what a mel-input ASR (Whisper) does internally: resample to
    the judge's rate, log-mel (the canonical ops/stft.py transform with
    the model's AudioConfig), CTC decode.  Audio is padded to one fixed
    bucket so the whole path is a single compiled graph.
    """
    from matcha_tts_tpu.ops.stft import log_mel_spectrogram

    pad = int((audio.n_fft - audio.hop_length) / 2)
    wav_bucket = ((frame_bucket - 1) * audio.hop_length + audio.n_fft
                  - 2 * pad)

    @jax.jit
    def _logmel(batch):
        return log_mel_spectrogram(batch, audio.sample_rate, audio.n_fft,
                                   audio.n_mels, audio.hop_length,
                                   audio.win_length, audio.f_min,
                                   audio.f_max)

    def asr(wav16k: np.ndarray) -> str:
        from matcha_tts_tpu.eval.wer import resample

        # anti-aliased 16k -> judge-rate resample: the linear-interp
        # version attenuated near-Nyquist tones by sinc^2 (see
        # eval/wer.py::resample), corrupting high-frequency content the
        # log-mel front end then reads
        wav = resample(wav16k, 16000, audio.sample_rate)
        wav = wav[:wav_bucket]
        batch = np.zeros((1, wav_bucket), np.float32)
        batch[0, : len(wav)] = wav
        mel = np.array(_logmel(jnp.asarray(batch)))
        mel = np.ascontiguousarray(mel.transpose(0, 2, 1), np.float32)
        n = min(1 + (len(wav) + 2 * pad - audio.n_fft) // audio.hop_length,
                frame_bucket)
        mel[0, n:] = MEL_PAD_VALUE
        return transcribe_mels(params, mel, np.asarray([n], np.int32), cfg)[0]

    return asr


# ---------------------------------------------------------------------------
# persistence: a trained judge is a framework artifact (.npz) usable by
# benchmarks/evaluate.py --ctc-asr without retraining
# ---------------------------------------------------------------------------


def save_ctc_asr(path, params: Dict, cfg: CTCASRConfig) -> None:
    """Write params + config to a single .npz file."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in kp)
        flat[key] = np.asarray(leaf)
    cfg_json = json.dumps(dataclasses.asdict(cfg))
    flat["__config__"] = np.frombuffer(cfg_json.encode(), np.uint8)
    np.savez(path, **flat)


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)

    def finalize(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [finalize(node[str(i)]) for i in range(len(node))]
        return {k: finalize(v) for k, v in node.items()}

    return finalize(root)


def load_ctc_asr(path):
    """Read a judge saved by `save_ctc_asr` -> (params, CTCASRConfig)."""
    data = dict(np.load(path))
    raw = json.loads(bytes(data.pop("__config__")).decode())
    raw["dilations"] = tuple(raw["dilations"])
    return _unflatten(data), CTCASRConfig(**raw)
