"""Matmul precision policy for the `tpu.bf16` config knob.

On TPU, fp32 matmuls are executed on the MXU either as single-pass
bfloat16 (fast, ~3 decimal digits) or as multi-pass fp32 emulation
(3-6x slower, full fp32 accuracy). The reference's analogous knob is
AMP autocast (reference: pipeline/modules/trainer.py:45-48); on TPU the
equivalent lever is `jax_default_matmul_precision`:

  tpu.bf16: true   -> "bfloat16"  single-pass MXU (default, fastest)
  tpu.bf16: false  -> "highest"   multi-pass fp32 (precision escape hatch)

Applied process-globally at engine/trainer construction; parity tests
force `highest` themselves when comparing against the fp64 torch oracle.
"""

from __future__ import annotations

import jax


def apply_matmul_precision(tpu_cfg) -> str:
    """Set the process-wide default matmul precision from the `tpu:` tree.

    Returns the precision string applied ("bfloat16", "highest", or
    "unchanged"). The bf16 fast path only applies on the TPU backend:
    on CPU (tests, virtual meshes) the knob must not silently downgrade
    the precision that parity tests pin globally."""
    bf16 = True if tpu_cfg is None else bool(tpu_cfg.get("bf16", True))
    if not bf16:
        jax.config.update("jax_default_matmul_precision", "highest")
        return "highest"
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        return "bfloat16"
    return "unchanged"
