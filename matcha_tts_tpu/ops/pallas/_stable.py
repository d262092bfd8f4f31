"""Location-stable Mosaic payloads: strip debug info before serialization.

JAX's persistent compilation cache canonicalizes StableHLO with
``strip-debuginfo`` before hashing, so ordinary source edits do not
invalidate cached executables.  Pallas TPU kernels break that property:
the Mosaic module is serialized into the ``tpu_custom_call``
``backend_config`` *with its MLIR locations still embedded*, and the
cache key cannot reach inside an opaque payload.  The observed effect
(docs/RESULTS.md, CLAUDE.md hazards): moving a kernel's source by one
line changes every cache key that embeds it, forcing a full recompile
sweep (~25-40 min of remote compiles for the serving bucket grid).

Fix: run ``strip-debuginfo`` on the Mosaic module right before
``mosaic-serde`` serializes it.  Locations are debug metadata only —
Mosaic compiles the stripped module identically; compile-error messages
lose their Python source pointers, which is the (small) cost.

Measured effect: with the patch, shifting a kernel's source lines leaves
the jitted graph's compilation-cache key bit-identical; without it the
key changes (tests/test_tpu_lowering.py::test_cache_key_stability).

Applied automatically on ``import matcha_tts_tpu``.  Opt out (restoring
source locations in Mosaic error messages) with
``MATCHA_MOSAIC_LOCATIONS=1``.
"""

from __future__ import annotations

import logging
import os

_log = logging.getLogger(__name__)
_installed = False


def install() -> bool:
    """Patch jax's Mosaic serialization to strip debug info. Idempotent.

    Returns True if the patch is active (or already was)."""
    global _installed
    if _installed:
        return True
    if os.environ.get("MATCHA_MOSAIC_LOCATIONS") == "1":
        return False
    try:
        from jax._src import tpu_custom_call as tcc
        from jax._src.lib.mlir import passmanager as pm

        orig = tcc._lower_mosaic_module_to_asm

        def _stripped(module, *, ir_version=None):
            try:
                with module.context:
                    pm.PassManager.parse(
                        "builtin.module(strip-debuginfo)"
                    ).run(module.operation)
            except Exception:  # pragma: no cover - strip is best-effort
                _log.warning("mosaic strip-debuginfo failed; payloads "
                             "will embed source locations", exc_info=True)
            return orig(module, ir_version=ir_version)

        _stripped._matcha_stable = True  # marker for tests
        tcc._lower_mosaic_module_to_asm = _stripped
        _installed = True
        return True
    except Exception:  # pragma: no cover - jax internals moved
        _log.warning(
            "could not install location-stable Mosaic serialization; "
            "Pallas cache keys will vary with kernel source locations",
            exc_info=True)
        return False
