"""Opt-in numeric/OOB guards (SURVEY.md §4/§5 debugging discipline).

The production path keeps XLA's clamp-mode gathers and ghost-padding
conventions (fast, branch-free). When chasing a NaN or a bad index,
enable `debug_checks` (CLI `--debug_checks`): jittable functions get
checkify instrumentation (NaN/Inf float checks + out-of-bounds index
checks), and the runners assert per-epoch loss finiteness with a
clear error instead of silently training on garbage.
"""

from __future__ import annotations

import jax.numpy as jnp


def checkified(fn):
    """Wrap a jittable function with checkify float+index checks.
    The wrapped function raises JaxRuntimeError on NaN/Inf arithmetic
    or out-of-bounds gather/scatter indices instead of clamping."""
    import jax
    from jax.experimental import checkify

    errs = checkify.float_checks | checkify.index_checks
    cfn = jax.jit(checkify.checkify(fn, errors=errs))

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped


def assert_finite_loss(loss, epoch: int, where: str) -> None:
    """Host-side guard on a fetched per-epoch loss scalar."""
    if not bool(jnp.isfinite(loss)):
        raise FloatingPointError(
            f"non-finite loss {float(loss)} at epoch {epoch} in {where}; "
            f"rerun with --debug_checks for the originating op"
        )
