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


def checkify_step(step_fn, errors=None):
    """Wrap a (jittable) step function with checkify sanitizers.

    The compiled-mode equivalent of the reference's always-on autograd anomaly
    tracer: float (NaN/inf), index out-of-bounds, and div-by-zero checks run
    INSIDE the compiled program and surface as Python exceptions with the
    failing check's provenance — usable where `jax_debug_nans` retracing is
    too slow (e.g. inside a long-running training loop on a remote chip).

    Returns a wrapped, already-jitted function with the same signature (do
    not jit it again — the error throw runs host-side):

        step = checkify_step(make_coarse_train_step(...))
        state, metrics = step(state, batch, rng)   # raises on NaN/OOB
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks | checkify.div_checks
    # jit INSIDE the wrapper: err.throw() must run outside staging (a staged
    # throw cannot be abstractly evaluated).
    checked = jax.jit(checkify.checkify(step_fn, errors=errors))

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
