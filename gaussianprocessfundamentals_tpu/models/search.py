"""Greedy compositional kernel search (CKS-style) over the kernel grammar.

The reference is the substrate for its author's model-selection frameworks —
``global_parameters.py:51-56`` reserves hooks (``p_used_base_kernel``,
``p_split_kernel``, …) for a downstream searcher that composes base kernels
with ADD/MUL/CP and scores candidates by LL/BIC/CV. That searcher lives
outside the reference repo; this module provides the capability in-tree
(Duvenaud et al. 2013 "Structure discovery in nonparametric regression"):

  greedily expand the current best expression with {best + b, best · b} for
  each base kernel b, fit each candidate, keep the best by BIC (penalising
  hyperparameter count, reference ``BayesianInformationCriterion.py:25-39``).

Candidate fits are independent — under a "dp" mesh they dispatch one per
chip (the EP-style axis of SURVEY.md §2.9).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig
from gaussianprocessfundamentals_tpu.fit.fit import fit
from gaussianprocessfundamentals_tpu.kernels.leaves import (
    LinearKernel,
    Matern52Kernel,
    PeriodicKernel,
    SquaredExponentialKernel,
)


@dataclasses.dataclass
class SearchResult:
    kernel: Any
    params: Any
    noise: Any
    score: float
    history: List[Tuple[str, float]]


def default_base_kernels():
    return (
        SquaredExponentialKernel(scaled=True),
        PeriodicKernel(scaled=True),
        LinearKernel(),
        Matern52Kernel(scaled=True),
    )


def _bic_of(res, kernel, n: int) -> float:
    k = kernel.num_params(res.kernel_params) + 1  # + noise
    return float(2.0 * res.nll_post + k * np.log(n))


def greedy_kernel_search(
    x: jnp.ndarray,
    y: jnp.ndarray,
    base_kernels: Optional[Sequence] = None,
    max_depth: int = 2,
    key=None,
    config: GPConfig = DEFAULT_CONFIG,
    fit_kwargs: Optional[dict] = None,
    verbose: bool = False,
) -> SearchResult:
    """Greedy BIC-guided search; returns the best expression found.

    ``max_depth`` counts expansion rounds: depth 0 evaluates the base kernels,
    each further round tries best+b and best·b for every base b.
    """
    base_kernels = base_kernels or default_base_kernels()
    key = key if key is not None else jr.PRNGKey(0)
    fk = dict(method="adam", steps=200, lr=0.05, optimize_noise=True)
    fk.update(fit_kwargs or {})
    n = x.shape[0]
    history: List[Tuple[str, float]] = []

    def evaluate(kernel, i):
        res = fit(kernel, x, y, config=config, key=jr.fold_in(key, i), **fk)
        score = _bic_of(res, kernel, n)
        history.append((str(kernel), score))
        if verbose:
            print(f"  {score:10.1f}  {kernel}")
        return res, score

    seen = set()
    best = None
    for i, b in enumerate(base_kernels):
        seen.add(b.canonical_str())
        res, score = evaluate(b, i)
        if best is None or score < best[3]:
            best = (b, res.kernel_params, res.noise, score)

    for depth in range(1, max_depth + 1):
        improved = False
        current = best[0]
        for j, b in enumerate(base_kernels):
            for cand in (current + b, current * b):
                # canonical-form dedup: skip candidates equal up to ADD/MUL
                # argument order (reference canonical string sorting,
                # Operators.py:128-135)
                cs = cand.canonical_str()
                if cs in seen:
                    continue
                seen.add(cs)
                res, score = evaluate(cand, 1000 * depth + j)
                if score < best[3] - 1e-6:
                    best = (cand, res.kernel_params, res.noise, score)
                    improved = True
        if not improved:
            break

    return SearchResult(best[0], best[1], best[2], best[3], history)
