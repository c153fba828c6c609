"""Shared kernel infrastructure: interpret-mode switching and tile helpers."""
from __future__ import annotations

import jax

_FORCE_INTERPRET = None


def set_interpret(value):
    """Force Pallas interpret mode on/off (None = auto: interpret off-TPU)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value


def use_interpret() -> bool:
    """Pallas kernels compile with Mosaic only on TPU; elsewhere interpret.

    This is what lets the full test-suite run on a CPU host (including the
    8-device simulated mesh) while the same code JITs to real TPU kernels.
    """
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def pick_tile(n: int, preferred=(512, 256, 128, 64, 32, 16, 8)) -> int:
    """Largest preferred tile that divides n."""
    for t in preferred:
        if n % t == 0:
            return t
    return n
