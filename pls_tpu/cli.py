"""Command-line interface mirroring the reference executable.

Reference analogue: /root/reference/src/main.cpp:10-44.  Contract:

    pls X.csv Y.csv num_components

- argc != 4 → usage on stderr, exit 100 (main.cpp:12-16; extra *optional*
  flags are accepted here but the three positionals are required).
- read CSVs (ragged rows → reference's exact error message, exit 1).
- z-score both X and Y (main.cpp:24-25).
- fit KERNEL_TYPE1 with the user's component count (main.cpp:29).
- print model state, explained variance per 1..A components, LOO
  validation (RMSE), then LSO validation (frac 0.3, trials = 10·N) with a
  default-seeded mt19937-compatible RNG → output deterministic and
  numerically identical to the reference CLI (main.cpp:31-41).
- all report output on stderr; stdout stays empty (pls.h:158,245,248).

Deviation (DEVIATIONS.md): matrices print as real numbers, not Eigen's
complex "(re,0)" tuples — our TPU-native state is real by construction.
"""

from __future__ import annotations

import argparse
import os
import sys


USAGE = (
    "Usage: ./pls X_data.csv Y_data.csv num_components\n"
    "NB: X and Y csvs must be comma delimited, square numerical data, "
    "with no headers."
)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv

    class _QuietParser(argparse.ArgumentParser):
        # reference behavior: bad argv prints only the usage block and
        # exits 100 (main.cpp:12-16) — suppress argparse's own error text
        def error(self, message):
            raise SystemExit(2)

    parser = _QuietParser(prog="pls", add_help=True, usage=USAGE)
    parser.add_argument("x_file")
    parser.add_argument("y_file")
    parser.add_argument("num_components", type=int)
    parser.add_argument(
        "--method", choices=["kernel1", "kernel2", "nipals", "simpls"],
        default="kernel1",
    )
    parser.add_argument(
        "--dtype", choices=["float64", "float32", "bfloat16"], default=None,
        help="working precision (default: float64 on CPU, float32 on TPU)",
    )
    parser.add_argument("--lso-frac", type=float, default=0.3)
    parser.add_argument(
        "--lso-trials", type=int, default=None, help="default: 10 * n_rows"
    )
    parser.add_argument(
        "--rng", choices=["gcc", "jax"], default="gcc",
        help="gcc = bit-exact std::mt19937 reference partitions (default)",
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--skip-loo", action="store_true")
    parser.add_argument("--skip-lso", action="store_true")
    parser.add_argument("--json", metavar="PATH", default=None,
                        help="also write a structured JSON report")

    try:
        args = parser.parse_args(argv)
    except SystemExit as e:
        if e.code == 0:  # --help
            return 0
        # mirror the reference's bad-argv behavior (main.cpp:12-16)
        print(USAGE, file=sys.stderr)
        return 100

    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # precision policy: float64 parity on CPU, float32 on accelerators
    import jax

    from pls_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    platform = jax.default_backend()
    dtype_name = args.dtype or ("float64" if platform == "cpu" else "float32")
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from pls_tpu import (
        KERNEL_TYPE1, KERNEL_TYPE2, MSE, NIPALS, SIMPLS,
        PLSModel, colwise_z_scores, print_validation, read_matrix_file,
    )
    from pls_tpu.cv.validation import optimal_num_components, validation
    from pls_tpu.utils.gcc_rng import GccRng
    from pls_tpu.utils.io import RaggedMatrixError

    method = {
        "kernel1": KERNEL_TYPE1, "kernel2": KERNEL_TYPE2,
        "nipals": NIPALS, "simpls": SIMPLS,
    }[args.method]
    dtype = jnp.dtype(dtype_name)

    try:
        X_orig = read_matrix_file(args.x_file)
        Y_orig = read_matrix_file(args.y_file)
    except RaggedMatrixError as e:
        print(str(e), file=sys.stderr)
        return e.exit_code
    except (OSError, ValueError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1

    X = colwise_z_scores(jnp.asarray(X_orig, dtype))
    Y = colwise_z_scores(jnp.asarray(Y_orig, dtype))

    model = PLSModel(X, Y, method, args.num_components)
    model.print_state()
    model.print_explained_variance(X, Y)

    report: dict = {
        "method": args.method,
        "num_components": model.A,
        "dtype": dtype_name,
        "explained_variance": {
            str(c): np.asarray(model.explained_variance(comp=c)).tolist()
            for c in range(1, model.A + 1)
        },
    }

    if not args.skip_loo:
        loo = model.cv_LOO()
        print_validation(loo, MSE)
        report["loo_rmse"] = np.sqrt(np.asarray(validation(loo, MSE))).tolist()
        report["loo_optimal_components"] = (
            np.asarray(optimal_num_components(loo)).tolist()
        )

    if not args.skip_lso:
        n = X.shape[0]
        trials = args.lso_trials if args.lso_trials is not None else 10 * n
        if args.rng == "gcc":
            rng = GccRng(args.seed if args.seed is not None else 5489)
        else:
            rng = jax.random.key(args.seed if args.seed is not None else 0)
        lso = model.cv_LSO(args.lso_frac, trials, rng)
        print_validation(lso, MSE)
        report["lso_rmse"] = np.sqrt(np.asarray(validation(lso, MSE))).tolist()
        report["lso_optimal_components"] = (
            np.asarray(optimal_num_components(lso)).tolist()
        )

    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)

    return 0


if __name__ == "__main__":
    sys.exit(main())
