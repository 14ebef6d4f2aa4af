"""Batched on-device branch-length optimization (TPU compute path).

Maximizes the appendProbNode score in the appending branch length t for a
whole batch of (upper, child) pairs inside one jitted loop — the device
counterpart of the reference's one-branch-at-a-time
``estimateBranchLengthWithDerivative`` (MAPLEv0.7.5.4.py:5040-5358).

The reference extracts per-site coefficients so the derivative of the
log-likelihood is ``-c1 + sum_i 1/(a_i + t)`` and bisects t.  That
derivative is strictly decreasing, i.e. the log-likelihood is strictly
concave in t, and the appendProbNode score differs from it only by
t-independent terms (append skips exactly the shared contributions that
do not involve the appending branch) — so ``argmax_t append_score(t)``
equals the reference optimum.  On TPU we therefore golden-section the
batched scorer itself instead of materializing variable-length
coefficient lists: every iteration is two fused VPU passes over the
padded entry tensors, the canonical trade of cheap recompute for
data-dependent control flow (which the MXU/VPU pipeline cannot tile).
Verified property (tests/test_blen_batch.py): the device optimum and the
host kernel's bisection agree to bracket tolerance, or the device point
scores at least as well.

Boundary semantics match the host kernel: an optimum within ``sens`` of 0
means "length zero" (the host returns False), and t is capped at 0.1
(reference :5300-region cap).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .append_batch import DeviceModel, _append_scores_impl

_INVPHI = (math.sqrt(5.0) - 1.0) / 2.0
T_MAX = 0.1


def _iters_for(sens: float, t_max: float = T_MAX) -> int:
    """Golden-section iterations to shrink [0, t_max] below sens."""
    return max(1, int(math.ceil(math.log(sens / t_max) / math.log(_INVPHI))))


@partial(jax.jit, static_argnames=("uer", "iters"))
def _gss_impl(P, C, tips, mm, root_freqs, site_rates, error_rates,
              global_tot_rate, tot_error, uer, iters):
    dtype = mm.dtype
    N = P["types"].shape[0]

    def f(t):
        return _append_scores_impl.__wrapped__(
            P, C, t, tips, mm, root_freqs, site_rates, error_rates,
            global_tot_rate, tot_error, uer)

    a0 = jnp.zeros((N,), dtype=dtype)
    b0 = jnp.full((N,), T_MAX, dtype=dtype)

    def body(_, ab):
        a, b = ab
        c = b - _INVPHI * (b - a)
        d = a + _INVPHI * (b - a)
        left = f(c) > f(d)
        return jnp.where(left, a, c), jnp.where(left, d, b)

    a, b = jax.lax.fori_loop(0, iters, body, (a0, b0))
    t = 0.5 * (a + b)
    return t, f(t)


def batched_optimize_blen(P: dict, C: dict, tips, dm: DeviceModel,
                          sens: float):
    """ML appending branch length for N (upper, child) pairs at once.

    P fields [N,B1] (candidate upper vectors), C fields [N,B2] (child
    lower vectors), ``tips`` scalar or [N] child-is-tip flags, ``sens`` =
    DerivedConfig.minBLenSensitivity (the host bisection's bracket
    precision).  Returns ``(t, score)``: per-pair optimal length (0.0
    where the host kernel would return False, T_MAX at the cap) and the
    append score at that length.
    """
    t, score = _gss_impl(
        P, C, jnp.asarray(tips), dm.mut_matrix, dm.root_freqs,
        dm.site_rates, dm.error_rates, dm.global_tot_rate, dm.tot_error,
        dm.using_error_rate, _iters_for(sens))
    dtype = dm.mut_matrix.dtype
    t = jnp.where(t < sens, jnp.zeros_like(t),
                  jnp.where(t > T_MAX - sens,
                            jnp.full_like(t, jnp.asarray(T_MAX, dtype)), t))
    return t, score
