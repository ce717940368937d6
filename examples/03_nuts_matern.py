"""BASELINE config 3: Matérn-5/2 GP with NUTS over hyperparameters, chains
sharded one-per-chip over the device mesh.
"""
import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.fit.fit import init_uparams, make_nll
from gaussianprocessfundamentals_tpu.mcmc.hmc import (
    effective_sample_size,
    potential_scale_reduction,
)


def main(n=400, chains=None, num_samples=300, num_warmup=300):
    x, y = gpf.synth_se(n=n, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    chains = chains or max(2, len(jax.devices()))

    kern = gpf.Matern52Kernel(scaled=True)
    nll = make_nll(kern, gpf.ZeroMean(), x, y, optimize_noise=True)
    # log N(0, 3²) prior on the unconstrained (log) hyperparameters
    logprob = lambda u: -nll(u) - 0.5 * sum(
        jnp.sum(l**2) for l in jax.tree_util.tree_leaves(u)
    ) / 9.0

    q0s = jax.tree_util.tree_map(
        lambda *l: jnp.stack(l),
        *[
            init_uparams(kern, gpf.ZeroMean(), [[0.0, 1.0]], n,
                         key=jr.PRNGKey(i), optimize_noise=True, dtype=x.dtype)
            for i in range(chains)
        ],
    )
    keys = jr.split(jr.PRNGKey(7), chains)

    # shard the chain axis over the devices (dp)
    if len(jax.devices()) > 1 and chains % len(jax.devices()) == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gaussianprocessfundamentals_tpu.parallel.meshes import single_axis_mesh

        mesh = single_axis_mesh("dp")
        q0s = jax.device_put(
            q0s, NamedSharding(mesh, P("dp"))
        )
        keys = jax.device_put(keys, NamedSharding(mesh, P("dp")))

    t0 = time.perf_counter()
    res = gpf.nuts_chains(
        logprob, q0s, keys, num_samples=num_samples, num_warmup=num_warmup,
        max_depth=7,
    )
    jax.block_until_ready(res.samples)
    dt = time.perf_counter() - t0
    total = chains * num_samples
    print(f"{chains} chains x {num_samples} draws in {dt:.1f}s "
          f"({total/dt:.1f} samples/s)")
    ls = np.exp(np.asarray(res.samples["kernel"]["lengthscale"]))
    noise = np.exp(np.asarray(res.samples["log_noise"]))
    print(f"accept={float(res.accept_stat.mean()):.2f} "
          f"divergences={int(np.asarray(res.diverging).sum())} "
          f"mean leapfrogs/draw={float(res.num_steps.mean()):.1f}")
    print(f"lengthscale: {ls.mean():.3f} ± {ls.std():.3f} "
          f"(truth 0.2), rhat={float(potential_scale_reduction(np.log(ls))):.3f}")
    print(f"noise var: {noise.mean():.4f} ± {noise.std():.4f} (truth 0.01)")
    print(f"ESS(log ls): {float(effective_sample_size(np.log(ls))):.0f}")


if __name__ == "__main__":
    main()
