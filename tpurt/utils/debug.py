"""Debug / sanitizer utilities (SURVEY.md §5).

The reference leans on Vulkan validation layers toggled by a debug flag
[RECALL]; the JAX-native equivalents wired here:

- ``checked_traverse``: the pure-JAX traversal run under
  ``jax.experimental.checkify`` with index/NaN/user checks discharged to a
  host-inspectable error value (the in-kernel assertion story).
- ``profile_trace``: context manager around ``jax.profiler.trace`` for
  kernel-level xprof traces (CLI ``--xprof DIR``), complementing the
  wall-clock pass HUD in utils/metrics.py.
"""

from __future__ import annotations

import contextlib

import jax


def checked_traverse(bvh, origins, dirs, t_min: float = 0.0, t_max=None,
                     any_hit: bool = False):
    """Traverse, then discharge checkify assertions over the results (NaN
    t, in-range triangle ids, t >= t_min). Returns (err, (t, tri_id));
    callers raise with ``err.throw()`` or inspect ``err.get()``.

    The checks run as a separate checkified program over the traversal
    outputs: checkify cannot functionalize through the traversal's vmapped
    while-loop (checkify-of-vmap-of-while is unsupported in JAX), and the
    boundary invariants are what the sanitizer mode needs.
    """
    import jax.numpy as jnp
    from jax.experimental import checkify

    from ..bvh.traverse import traverse

    kw = {} if t_max is None else {"t_max": t_max}
    t, tid = traverse(bvh, origins, dirs, t_min=t_min, any_hit=any_hit, **kw)
    ntri = bvh.tri_id.shape[0]

    def checks(t, tid):
        checkify.check(jnp.logical_not(jnp.any(jnp.isnan(t))),
                       "traversal produced NaN t")
        checkify.check(jnp.all((tid >= -1) & (tid < ntri)),
                       "triangle id out of range")
        checkify.check(jnp.all(jnp.where(tid >= 0, t, t_min) >= t_min),
                       "hit distance below t_min")
        return t, tid

    checked = checkify.checkify(checks, errors=checkify.user_checks)
    return jax.jit(checked)(t, tid)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Kernel-level trace (xprof/TensorBoard format) around a code region."""
    with jax.profiler.trace(log_dir):
        yield
