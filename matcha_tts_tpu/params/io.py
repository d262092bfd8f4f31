"""Parameter-tree IO: load inference params from an Orbax training run or
a converted PyTorch checkpoint — one entry point for the CLI/Synthesizer."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

from matcha_tts_tpu.config import MatchaConfig, config_from_dict


def load_orbax_matcha(work_or_ckpt_dir,
                      step: Optional[int] = None) -> Tuple[dict, MatchaConfig]:
    """Load (params, config) from a training run directory produced by
    `matcha_tts_tpu.train.loop.fit` (Orbax CheckpointManager layout)."""
    import orbax.checkpoint as ocp

    d = Path(work_or_ckpt_dir).absolute()
    if (d / "ckpt").exists():
        d = d / "ckpt"
    mngr = ocp.CheckpointManager(d)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {d}")
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            config=ocp.args.JsonRestore(),
        ),
    )
    cfg = config_from_dict(MatchaConfig, restored["config"])
    return restored["state"]["params"], cfg


def load_matcha_any(path, cfg: Optional[MatchaConfig] = None):
    """Dispatch on checkpoint type: Orbax run dir vs torch .ckpt file."""
    p = Path(path)
    if p.is_dir():
        return load_orbax_matcha(p)
    from matcha_tts_tpu.params.convert import convert_matcha, load_torch_state_dict

    cfg = cfg or MatchaConfig()
    return convert_matcha(load_torch_state_dict(p), cfg), cfg
