"""Fast 1-D prefix sums for TPU.

``jnp.cumsum`` lowers to XLA reduce-window on TPU, measured at
0.195 ns/el (int32) and 1.246 ns/el (int64) at n=1.5M on v5e —
reduce_window_sum was a top-traffic instruction of every sparse-fold /
merge-search query program (Q15/Q17/Q18).  A manual log-sweep
(ceil(log2 n) shifted adds, which XLA fuses into wide elementwise
passes) measures 0.075 / 0.112 ns/el — 2.6x / 11x faster
(tools/probe_cumsum.py, r4).  ``lax.associative_scan`` is slower than
both (1.3 / 2.6 ns/el).

The sweep is exact for integer dtypes (plain adds).  Callers with 0/1
flag inputs that need an int64 result still benefit from sweeping in
int32 when the total provably fits (n < 2^31) — see ``cumsum_flags``.
"""

from __future__ import annotations

from .. import jaxcfg  # noqa: F401  (x64 — int64 sweeps must not truncate)

import jax.numpy as jnp

INT32_MAX = 2**31 - 1


def _logsweep(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    shift = 1
    while shift < n:
        pad = jnp.zeros((shift,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-shift]], axis=0)
        shift *= 2
    return x


def cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0.

    Same result as ``jnp.cumsum(x, axis=0)`` (wraparound semantics
    included).  This wrapper stays on reduce-window: isolated, the
    log-sweep (``_logsweep``) is 11x faster for int64 — but end-to-end
    its materialized add chain can regress large programs (Q18 +12%)
    while transforming others (Q15 -37%), so call sites opt in
    explicitly where the A/B won (lower.py FSUM, gated on domain)."""
    n = x.shape[0]
    if n <= 1:
        return x
    return jnp.cumsum(x, axis=0)


def cumsum_flags(flags: jnp.ndarray) -> jnp.ndarray:
    """Prefix sum of a 0/1 flag vector, returned as int64.

    Accumulates in int32 when the total provably fits (n <= INT32_MAX):
    the int32 reduce-window is ~6x faster than the int64 one and the
    widening happens once on the result."""
    n = flags.shape[0]
    if n <= INT32_MAX:
        return cumsum(flags.astype(jnp.int32)).astype(jnp.int64)
    return cumsum(flags.astype(jnp.int64))
