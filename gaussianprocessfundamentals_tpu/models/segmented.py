"""Segmented GPs: blockwise (change-point) and partitioned models.

Reference: ``main/gpbasics/Statistics/GaussianProcess.py:140-201``
(``BlockwiseGaussianProcess`` builds one constituent GP per CP child and a
``SegmentedCovarianceMatrix``; ``PartitionedGaussianProcess`` does the same for
PART kernels) and ``Statistics/CovarianceMatrix.py:289-565`` (block-diagonal
per-block chol/solve lists).

This is the reference's "scalability by independence": t segments of size n/t
cost Σ O((n/t)³) = O(n³/t²) (SURVEY.md §3.5). It is also the natural unit of
multi-chip data parallelism: when all segments are padded to a common size the
per-segment NLLs/posteriors run as ONE batched (vmapped) Cholesky whose batch
axis shards over the mesh "dp" axis — the TPU-native EP analogue (segments =
local experts, SURVEY.md §2.9).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.means.functions import MeanFunction
from gaussianprocessfundamentals_tpu.models.exact import GaussianProcess


def pad_segments(
    xs: Sequence[jnp.ndarray], ys: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad variable-length segments to a common static length.

    Returns (x [S, L, d], y [S, L], mask [S, L]). Padded rows repeat the
    segment's first point with mask 0; the masked NLL/posterior below makes
    them exactly inert (soft analogue of the reference's "dead" block padding,
    ``Auxiliary/NonSquareBlockMatrices.py:72-103``).
    """
    L = max(int(x.shape[0]) for x in xs)
    xb, yb, mb = [], [], []
    for x, y in zip(xs, ys):
        n = int(x.shape[0])
        pad = L - n
        xb.append(jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)]) if pad else x)
        yb.append(jnp.concatenate([y, jnp.zeros((pad,), y.dtype)]) if pad else y)
        mb.append(jnp.concatenate([jnp.ones((n,), x.dtype), jnp.zeros((pad,), x.dtype)]))
    return jnp.stack(xb), jnp.stack(yb), jnp.stack(mb)


def masked_nll(K, y, mask, noise, jitter) -> jnp.ndarray:
    """NLL over the valid prefix only: padded rows are replaced by decoupled
    diagonal rows (zero off-diagonal, zero target). Each padded row then
    contributes 0 to yᵀα, log(c+σ²+jitter) to the logdet, and ½log2π to the
    norm constant — both subtracted exactly.

    Two f32 subtleties make this *exactly* equal to the unpadded NLL:

      * the padded diagonal value c is the mean of the REAL rows' diagonal,
        so ``mean(diag(K_pad)) == mean(diag(K_real))`` and the dtype-aware
        jitter floor (:func:`~..linalg.cholesky.effective_jitter`) resolves to
        the same value the unpadded factorisation would use;
      * the correction is computed with that same *effective* jitter — the
        raw ``jitter`` argument can be below the f32 eps floor actually
        applied inside ``chol.nll``, which previously left the blockwise NLL
        off by n_pad·Δ on the TPU dtype.
    """
    m2 = mask[..., :, None] * mask[..., None, :]
    n_real = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    diag_K = jnp.diagonal(K, axis1=-2, axis2=-1)
    c = jnp.sum(diag_K * mask, axis=-1) / n_real  # mean real diagonal
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K_pad = K * m2 + (1.0 - mask[..., :, None]) * c[..., None, None] * eye
    y_pad = y * mask
    raw = chol.nll(K_pad, y_pad, noise, jitter)
    n_pad = K.shape[-1] - jnp.sum(mask, axis=-1)
    sigma2 = jnp.asarray(noise, K.dtype) + chol.effective_jitter(K_pad, jitter)
    return raw - 0.5 * n_pad * (chol.LOG_2PI + jnp.log(c + sigma2))


def segmented_nll(
    kernel_segments: Sequence,
    params_segments: Any,  # pytree stacked on leading axis OR list of pytrees
    x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
    noise, jitter: float,
) -> jnp.ndarray:
    """Σ of per-segment NLLs as one vmapped batched Cholesky (all segments
    share a kernel type; heterogeneous types fall back to a Python loop in
    :class:`BlockwiseGP`)."""
    k = kernel_segments[0]

    def one(p, xs, ys, ms):
        K = k.gram(p, xs, xs)
        return masked_nll(K, ys, ms, noise, jitter)

    return jnp.sum(jax.vmap(one)(params_segments, x, y, mask))


def fit_segments_vmapped(
    kernel,
    segments: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    config: GPConfig = DEFAULT_CONFIG,
    steps: int = 300,
    lr: float = 0.05,
    optimize_noise: bool = True,
    init_noise: float = 1e-3,
    key=None,
):
    """Fit all segments (shared kernel TYPE, independent hyperparameters) as
    ONE vmapped Adam program over padded masked blocks — the batched-Cholesky
    fast path for the reference's per-segment loop; the segment axis shards
    over "dp" on a mesh. Returns (stacked kernel_params, noises [S],
    final masked NLLs [S])."""
    import jax.random as jr
    import optax

    from gaussianprocessfundamentals_tpu.fit.transforms import (
        constrain,
        unconstrain,
    )

    xs = [s[0] for s in segments]
    ys = [s[1] for s in segments]
    xb, yb, mb = pad_segments(xs, ys)
    S = xb.shape[0]
    pos = kernel.positivity()

    keys = [None] * S if key is None else list(jr.split(key, S))
    inits = []
    for i in range(S):
        xr = jnp.stack([xs[i].min(0), xs[i].max(0)], -1)
        u = {
            "kernel": unconstrain(
                pos, kernel.init_params(xr, xs[i].shape[0], keys[i], xb.dtype)
            ),
            "log_noise": jnp.log(jnp.asarray(init_noise, xb.dtype)),
        }
        inits.append(u)
    u0 = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *inits)
    opt = optax.adam(lr)

    def nll_one(u, x, y, m):
        kp = constrain(pos, u["kernel"])
        noise = (
            jnp.exp(u["log_noise"]) if optimize_noise
            else jnp.asarray(init_noise, x.dtype)
        )
        return masked_nll(kernel.gram(kp, x, x), y, m, noise, config.jitter)

    @jax.jit
    def run(u0):
        def one(u0, x, y, m):
            def step(carry, _):
                u, st = carry
                loss, g = jax.value_and_grad(nll_one)(u, x, y, m)
                upd, st = opt.update(g, st, u)
                return (optax.apply_updates(u, upd), st), loss

            (u, _), hist = jax.lax.scan(step, (u0, opt.init(u0)), None, length=steps)
            return u, hist[-1]

        return jax.vmap(one)(u0, xb, yb, mb)

    u, final = run(u0)
    kp = constrain(pos, u["kernel"])
    noises = (
        jnp.exp(u["log_noise"]) if optimize_noise
        else jnp.full((S,), init_noise, xb.dtype)
    )
    return kp, noises, final


@dataclasses.dataclass
class BlockwiseGP:
    """Change-point segmented GP (reference ``BlockwiseGaussianProcess``,
    ``GaussianProcess.py:140-169``): one constituent GP per segment, block
    boundaries from the CP kernel's locations."""

    kernels: List[Any]
    locations: Any = None  # sorted interior boundaries on x[:, 0]
    mean: Optional[MeanFunction] = None
    config: GPConfig = DEFAULT_CONFIG
    gps: Optional[List[GaussianProcess]] = None

    def __post_init__(self):
        assert self.locations is not None
        assert len(self.kernels) == len(np.atleast_1d(self.locations)) + 1
        self.gps = [
            GaussianProcess(k, mean=self.mean, config=self.config)
            for k in self.kernels
        ]

    def _segment(self, x, y):
        edges = [-np.inf] + list(np.atleast_1d(self.locations)) + [np.inf]
        x0 = np.asarray(x[:, 0])
        out = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = (x0 >= lo) & (x0 < hi)
            out.append((x[np.where(m)[0]], y[np.where(m)[0]]))
        return out

    def fit(self, x, y, **kw):
        """Independent per-segment fits (reference fits segments via the
        blockwise metric sum; independence makes per-segment fits equivalent
        for segment-local hyperparameters)."""
        results = []
        for gp, (xs, ys) in zip(self.gps, self._segment(x, y)):
            results.append(gp.fit(xs, ys, **kw))
        return results

    def predict(self, x_test):
        """Per-segment posterior, reassembled in input order (reference
        ``predict`` per-segment dispatch, ``GaussianProcess.py:66-79``)."""
        x0 = np.asarray(x_test[:, 0])
        edges = [-np.inf] + list(np.atleast_1d(self.locations)) + [np.inf]
        mu = np.zeros(x_test.shape[0])
        mean_mu = np.zeros_like(mu)
        post_mu = np.zeros_like(mu)
        var = np.zeros_like(mu)
        for gp, lo, hi in zip(self.gps, edges[:-1], edges[1:]):
            sel = np.where((x0 >= lo) & (x0 < hi))[0]
            if sel.size == 0:
                continue
            post = gp.posterior(x_test[sel])
            mu[sel] = np.asarray(post.mean)
            mean_mu[sel] = np.asarray(post.mean_fn_mu)
            post_mu[sel] = np.asarray(post.posterior_mu)
            var[sel] = np.asarray(post.var)
        return mu, mean_mu, post_mu, var

    def log_marginal_likelihood(self) -> float:
        return float(sum(float(gp.log_marginal_likelihood()) for gp in self.gps))


@dataclasses.dataclass
class PartitionedGP(BlockwiseGP):
    """Partitioned GP (reference ``PartitionedGaussianProcess``,
    ``GaussianProcess.py:172-201``): like blockwise but segments come from a
    :class:`~gaussianprocessfundamentals_tpu.kernels.partition.PartitioningModel`."""

    model: Any = None

    def __post_init__(self):
        assert self.model is not None
        assert len(self.kernels) == self.model.num_partitions()
        self.gps = [
            GaussianProcess(k, mean=self.mean, config=self.config)
            for k in self.kernels
        ]

    def _segment(self, x, y):
        ids = np.asarray(self.model.assign(jnp.asarray(x)))
        return [
            (x[np.where(ids == p)[0]], y[np.where(ids == p)[0]])
            for p in range(self.model.num_partitions())
        ]

    def predict(self, x_test):
        ids = np.asarray(self.model.assign(jnp.asarray(x_test)))
        mu = np.zeros(x_test.shape[0])
        mean_mu = np.zeros_like(mu)
        post_mu = np.zeros_like(mu)
        var = np.zeros_like(mu)
        for p, gp in enumerate(self.gps):
            sel = np.where(ids == p)[0]
            if sel.size == 0:
                continue
            post = gp.posterior(x_test[sel])
            mu[sel] = np.asarray(post.mean)
            mean_mu[sel] = np.asarray(post.mean_fn_mu)
            post_mu[sel] = np.asarray(post.posterior_mu)
            var[sel] = np.asarray(post.var)
        return mu, mean_mu, post_mu, var
