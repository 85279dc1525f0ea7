"""CLI: python -m ubpl_tpu <regime> [--key=value ...]

Regimes: supervised | mt | mt_ubpl | dualpose | dualpose_ubpl | exec |
classification | bench | preview
(`exec` runs the reference's full sweep grid, projects/exec.py equivalent;
`classification` drives the CIFAR branch, `--mode=supervised|mt|mt_ubpl`;
`bench` prints the one-line throughput JSON).

`--platform=cpu|tpu` pins the JAX backend (the TPU plugin otherwise
overrides JAX_PLATFORMS; cpu is useful for smoke runs while the chip is
owned by a long job).  Other keys map to ubpl_tpu.config.Config fields
(or reference argparse aliases), e.g.:
    python -m ubpl_tpu mt_ubpl --data_source=Mouse --train_count=100 \
        --label_ratio=0.3 --epochs=100 --mesh_shape=2,4 --mesh_axes=model,data
"""
import sys


def parse_overrides(argv):
    params = {}
    for arg in argv:
        if not arg.startswith("--"):
            continue
        key, _, val = arg[2:].partition("=")
        for cast in (int, float):
            try:
                val = cast(val)
                break
            except (ValueError, TypeError):
                continue
        params[key] = val
    return params


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    regime = sys.argv[1]
    params = parse_overrides(sys.argv[2:])
    # --platform=cpu|tpu|axon: pin the JAX backend before anything traces.
    # The TPU plugin overrides JAX_PLATFORMS from the environment, so a
    # config update after import is the only reliable way to force CPU
    # (e.g. smoke-testing while the chip is owned by a long run).
    platform = params.pop("platform", None)
    if platform:
        import jax
        jax.config.update("jax_platforms", str(platform))
    if regime == "supervised":
        from ubpl_tpu.train.supervised import exec_regime
        exec_regime("Supervised", params)
    elif regime == "mt":
        from ubpl_tpu.train.mean_teacher import exec_regime
        exec_regime("MT", params)
    elif regime == "mt_ubpl":
        from ubpl_tpu.train.mt_ubpl import exec_regime
        exec_regime("MT_UBPL", params)
    elif regime == "dualpose":
        from ubpl_tpu.train.dualpose_ubpl import exec_regime
        exec_regime("DualPose", {**params, "fdl_weight_max": 0.0,
                                 "fdl_weight_min": 0.0,
                                 "use_ensemble_pseudo": False})
    elif regime == "dualpose_ubpl":
        from ubpl_tpu.train.dualpose_ubpl import exec_regime
        exec_regime("DualPose_UBPL", params)
    elif regime == "exec":
        from ubpl_tpu.train.exec import exec_home
        exec_home(extra=params)
    elif regime == "classification":
        from ubpl_tpu.train.classification import exec_regime
        exec_regime("Classification", params)
    elif regime == "bench":
        import os
        import runpy
        bench = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
        if not os.path.exists(bench):
            print(f"bench.py not found at {bench}")
            return 1
        sys.argv = [bench]
        runpy.run_path(bench, run_name="__main__")
    elif regime == "preview":
        from ubpl_tpu.data.preview import main as preview_main
        preview_main(params)
    else:
        print(f"unknown regime {regime!r}\n{__doc__}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
