"""Point matching: mutual NN + Sinkhorn optimal transport.

The optimal-transport solver mirrors the one the reference exposes from
its vendored SuperGlue (point2d/superglue/superglue.py) and is reused by
the endpoint line matchers; implemented as a fixed-iteration batched
log-domain Sinkhorn, jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(2,))
def log_sinkhorn(scores: jnp.ndarray, bin_score: jnp.ndarray,
                 iters: int = 50) -> jnp.ndarray:
    """Log-domain Sinkhorn with dustbins (SuperGlue's
    _solve_optimal_transport).

    scores: [M, N] similarity matrix.  Returns log assignment [M+1, N+1].
    """
    M, N = scores.shape
    one = jnp.asarray(1.0)
    ms, ns = jnp.asarray(float(M)), jnp.asarray(float(N))

    bins0 = jnp.full((M, 1), bin_score)
    bins1 = jnp.full((1, N), bin_score)
    alpha = jnp.full((1, 1), bin_score)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], 1),
         jnp.concatenate([bins1, alpha], 1)], 0)  # [M+1, N+1]

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((M,), norm),
                              jnp.asarray([jnp.log(ns) + norm])])
    log_nu = jnp.concatenate([jnp.full((N,), norm),
                              jnp.asarray([jnp.log(ms) + norm])])

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body,
                             (jnp.zeros(M + 1), jnp.zeros(N + 1)))
    return couplings + u[:, None] + v[None, :] - norm


def mutual_nn_match(desc1: np.ndarray, desc2: np.ndarray,
                    min_score: float = 0.7) -> np.ndarray:
    """Mutual nearest-neighbor matching on L2-normalized descriptors."""
    if len(desc1) == 0 or len(desc2) == 0:
        return np.zeros((0, 2), np.int64)
    s = np.asarray(desc1) @ np.asarray(desc2).T
    b2 = s.argmax(1)
    b1 = s.argmax(0)
    i = np.arange(len(desc1))
    mutual = b1[b2[i]] == i
    good = mutual & (s[i, b2[i]] >= min_score)
    return np.stack([i[good], b2[i][good]], axis=1)


def sinkhorn_match(desc1: np.ndarray, desc2: np.ndarray,
                   bin_score: float = 0.5, match_threshold: float = 0.2,
                   iters: int = 50,
                   temperature: float = 0.1) -> np.ndarray:
    """OT-based matching with dustbins (SuperGlue-style selection).

    ``temperature`` sharpens cosine similarities into usable logits
    (SuperGlue's learned descriptors produce larger-scale scores)."""
    if len(desc1) == 0 or len(desc2) == 0:
        return np.zeros((0, 2), np.int64)
    scores = jnp.asarray(np.asarray(desc1) @ np.asarray(desc2).T
                         / temperature)
    Z = np.asarray(log_sinkhorn(scores, jnp.asarray(bin_score), iters))
    P = np.exp(Z[:-1, :-1])
    b2 = P.argmax(1)
    b1 = P.argmax(0)
    i = np.arange(P.shape[0])
    mutual = b1[b2[i]] == i
    good = mutual & (P[i, b2[i]] >= match_threshold)
    return np.stack([i[good], b2[i][good]], axis=1)
