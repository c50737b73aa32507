"""Numerical sanitizers (opt-in).

The reference permanently enables torch autograd anomaly detection in both
trainers (/root/reference/training/coarse.py:237, training/fine.py:196) — a
NaN/inf tracer that costs real throughput in production. The TPU-native
equivalents are opt-in flags (SURVEY.md section 5.2): jax debug_nans (retraces
and pinpoints the op producing a NaN) and checkify for in-kernel assertions.
"""

from __future__ import annotations

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise (with op provenance) whenever any jitted computation makes a NaN."""
    jax.config.update("jax_debug_nans", enable)


def enable_disable_jit(disable: bool = True) -> None:
    """Run everything op-by-op for printf-style debugging."""
    jax.config.update("jax_disable_jit", disable)
