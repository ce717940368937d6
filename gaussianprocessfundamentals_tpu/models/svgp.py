"""Sparse variational GP (SVGP): inducing points + ELBO, for N≈100k+.

The modern generalisation of the reference's trainable-inducing-index Nyström
machinery (``Optimizer/Fitter.py:76-89`` gathers inducing inputs from
trainable index variables; ``Metrics/SkcLogLikelihood.py`` runs an inner SGD
for the SKC upper bound). Here (Titsias 2009 / Hensman 2013):

  * continuous inducing inputs Z are optimised directly;
  * q(u) = N(m, S) with S = L·Lᵀ in whitened coordinates;
  * ELBO = Σ_batch E_q[log N(y_i | f_i, σ²)] · (n/|batch|) − KL(q‖p),
    minibatch-stochastic, so fitting is O(bm² + m³) per step;
  * everything jits; the batch axis shards over the mesh "tp"/"dp" axes for
    multi-chip data-parallel ELBO (psum of the likelihood term).

Collapsed (Titsias) ELBO — no q(u) parameters, exact optimum — is also
provided: it equals the reference's SKC lower bound with the trace correction
(``Metrics/LogLikelihood.py:51-60``).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from jax.scipy.linalg import solve_triangular

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig
from gaussianprocessfundamentals_tpu.fit.transforms import constrain, unconstrain
from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI, add_diag
from gaussianprocessfundamentals_tpu.means.functions import MeanFunction, ZeroMean


class SVGPParams(NamedTuple):
    kernel_u: Any  # unconstrained kernel params
    z: jnp.ndarray  # [m, d] inducing inputs
    q_mu: jnp.ndarray  # [m] whitened variational mean
    q_sqrt: jnp.ndarray  # [m, m] lower-tri factor of whitened S
    log_noise: jnp.ndarray


def init_svgp_params(
    kernel, x: jnp.ndarray, m: int, key, noise: float = 1e-2, xrange=None
) -> SVGPParams:
    n, d = x.shape
    if xrange is None:
        xrange = jnp.stack([x.min(0), x.max(0)], axis=-1)
    kp = kernel.init_params(xrange, n, dtype=x.dtype)
    # init Z on a subset of the data (reference inits inducing indices from a
    # grid/random subset, DataHandling/DataInput.py:126-178)
    idx = jr.choice(key, n, (m,), replace=False)
    z = x[idx]
    return SVGPParams(
        kernel_u=unconstrain(kernel.positivity(), kp),
        z=z,
        q_mu=jnp.zeros((m,), x.dtype),
        q_sqrt=jnp.eye(m, dtype=x.dtype),
        log_noise=jnp.log(jnp.asarray(noise, x.dtype)),
    )


def _whitened_marginals(kernel, kp, z, q_mu, q_sqrt, x, jitter):
    """q(f(x)) marginals: mean A q_mu, var k_diag − ‖a‖² + ‖Aᵀ? ...; with
    A = L_mm⁻¹ K_mx (whitened cross-weights)."""
    K_mm = kernel.gram(kp, z, z)
    from gaussianprocessfundamentals_tpu.linalg.cholesky import effective_jitter

    # eps_factor 2000: inducing points routinely collide mid-optimisation
    # (measured min-eig drift ~ −1e-6 in f32 at m=64), and the variational
    # bound stays a valid bound under any prior jitter
    L_mm = jnp.linalg.cholesky(
        add_diag(K_mm, effective_jitter(K_mm, jitter, eps_factor=2000.0))
    )
    K_mx = kernel.gram(kp, z, x)  # [m, b]
    A = solve_triangular(L_mm, K_mx, lower=True)  # [m, b]
    mean = A.T @ q_mu
    SA = jnp.tril(q_sqrt).T @ A  # [m, b]
    k_diag = kernel.diag(kp, x)
    var = k_diag - jnp.sum(A * A, axis=0) + jnp.sum(SA * SA, axis=0)
    return mean, jnp.maximum(var, 1e-12)


def svgp_elbo(
    kernel, params: SVGPParams, x_batch, y_batch, n_total: int,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
    jitter: float = DEFAULT_CONFIG.jitter,
) -> jnp.ndarray:
    """Minibatch ELBO (Hensman et al. 2013), whitened KL:
    KL = ½(‖q_mu‖² + ‖S‖_F² − 2Σlog diag L_S − m)."""
    kp = constrain(kernel.positivity(), params.kernel_u)
    mean = mean if mean is not None else ZeroMean(dim=x_batch.shape[-1])
    mp = mean_params if mean_params is not None else {}
    resid = y_batch - mean.mean(mp, x_batch)

    f_mean, f_var = _whitened_marginals(
        kernel, kp, params.z, params.q_mu, params.q_sqrt, x_batch, jitter
    )
    # log_noise parameterises the noise VARIANCE σ² (consistent with the
    # exact path, where `noise` is added to the diagonal as σ²·I)
    noise = jnp.exp(params.log_noise) + jitter
    # E_q log N(y | f, σ²) per point
    exp_ll = -0.5 * (
        LOG_2PI + jnp.log(noise) + ((resid - f_mean) ** 2 + f_var) / noise
    )
    scale = n_total / x_batch.shape[0]
    L_S = jnp.tril(params.q_sqrt)
    kl = 0.5 * (
        jnp.sum(params.q_mu**2)
        + jnp.sum(L_S**2)
        - 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L_S)) + 1e-20))
        - params.q_mu.shape[0]
    )
    return scale * jnp.sum(exp_ll) - kl


def collapsed_elbo(
    kernel, kernel_params, x, y, z, noise, jitter: float = DEFAULT_CONFIG.jitter
) -> jnp.ndarray:
    """Titsias collapsed bound = Nyström ll + trace correction — identical in
    content to the reference's SKC lower bound (``LogLikelihood.py:51-60``)."""
    from gaussianprocessfundamentals_tpu.linalg.nystroem import nystroem_mll

    return nystroem_mll(
        kernel, kernel_params, x, y, z, noise, jitter, titsias_correction=True
    )


def svgp_predict(
    kernel, params: SVGPParams, x_test,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
    jitter: float = DEFAULT_CONFIG.jitter,
):
    kp = constrain(kernel.positivity(), params.kernel_u)
    f_mean, f_var = _whitened_marginals(
        kernel, kp, params.z, params.q_mu, params.q_sqrt, x_test, jitter
    )
    if mean is not None:
        f_mean = f_mean + mean.mean(mean_params if mean_params is not None else {}, x_test)
    return f_mean, f_var


def fit_svgp(
    kernel, x, y, m: int = 128, key=None,
    batch_size: int = 2048, steps: int = 2000, lr: float = 1e-2,
    noise: float = 1e-2, jitter: float = DEFAULT_CONFIG.jitter,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
):
    """Adam over the minibatch ELBO; one compiled ``lax.scan`` for the whole
    run (data minibatches are gathered by index inside jit)."""
    key = key if key is not None else jr.PRNGKey(0)
    n = x.shape[0]
    params = init_svgp_params(kernel, x, m, jr.fold_in(key, 0), noise)
    opt = optax.adam(lr)
    batch_size = min(batch_size, n)

    def loss_fn(p, xb, yb):
        return -svgp_elbo(kernel, p, xb, yb, n, mean, mean_params, jitter)

    def step(carry, k):
        p, st = carry
        # with-replacement sampling: O(batch) per step (choice without
        # replacement would permute all n points every minibatch)
        idx = jr.randint(k, (batch_size,), 0, n)
        loss, g = jax.value_and_grad(loss_fn)(p, x[idx], y[idx])
        # NaN guard: a single degenerate minibatch (e.g. colliding inducing
        # points at the jitter floor) must not poison the Adam moments —
        # skip the update and keep optimising (cf. the reference's LCG NaN
        # bail-out, Auxiliary/LinearConjugateGradients.py:21-24)
        finite = jnp.isfinite(loss) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(g)])
        )
        g = jax.tree_util.tree_map(
            lambda l: jnp.where(finite, l, jnp.zeros_like(l)), g
        )
        updates, st = opt.update(g, st, p)
        p = optax.apply_updates(p, updates)
        return (p, st), loss

    keys = jr.split(jr.fold_in(key, 1), steps)
    (params, _), hist = jax.lax.scan(step, (params, opt.init(params)), keys)
    return params, hist
