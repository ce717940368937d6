"""Greedy compositional kernel search on Mauna-Loa-shaped data.

The workflow the reference was built to serve (its downstream model-selection
frameworks): discover the kernel structure, not just the hyperparameters.
"""
import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.models.search import greedy_kernel_search


def main():
    import jax.random as jr

    di = gpf.load_named("mauna_loa")
    res = greedy_kernel_search(
        di.x_train, di.y_train, max_depth=2, key=jr.PRNGKey(0), verbose=True,
        fit_kwargs={"steps": 150},
    )
    print(f"\nbest structure: {res.kernel}")
    print(f"BIC: {res.score:.1f}  ({len(res.history)} candidates evaluated)")


if __name__ == "__main__":
    main()
