"""CLI driver: execute NeRF-VO-TPU, render results, calculate metrics.

Interface parity with the reference ``run.py`` (same flags, config files,
prediction-directory layout, per-scene overrides — reference run.py:96-174);
the execution backend is the single-process JAX pipeline
(nerf_vo_tpu/runtime/pipeline.py) and the evaluation layer is
nerf_vo_tpu/evaluation.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import random

import numpy as np


def _set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def execute_render_and_evaluate(args: argparse.Namespace, config: dict) -> dict:
    from nerf_vo_tpu.evaluation.runner import render_and_evaluate
    from nerf_vo_tpu.runtime.pipeline import execute
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()

    mapping = execute(args)
    return render_and_evaluate(args, config, mapping)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Execute NeRF-VO-TPU, render results and calculate metrics."
    )
    parser.add_argument("--config", type=str, default="nerf_vo_replica",
                        help="name of the config")
    parser.add_argument("--experiment", type=str, default="1st_commit",
                        help="experiment name to identify execution")
    parser.add_argument("--first_scene", type=int, default=0,
                        help="first scene to process")
    parser.add_argument("--last_scene", type=int, default=7,
                        help="last scene to process")
    cli = parser.parse_args()

    import yaml

    with open(f"configs/{cli.config}.yaml", "r") as f:
        config = yaml.safe_load(f)

    dir_dataset = config["dir_dataset"]
    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    suffix = "" if cli.experiment == "" else f"_{cli.experiment}"
    dir_prediction = config["dir_prediction"] + f"/{cli.config}_{stamp}{suffix}"
    experiment = (
        f"/{cli.config}_{stamp}" if cli.experiment == "" else cli.experiment
    )
    os.makedirs(dir_prediction, exist_ok=True)
    dir_result = dir_prediction + "/results"
    os.makedirs(dir_result, exist_ok=True)

    with open(dir_prediction + "/config.json", "w") as f:
        json.dump(config, f)

    _set_random_seed(42)

    for index, scene_name in enumerate(config["scene_names"]):
        if index < cli.first_scene:
            continue
        if index > cli.last_scene:
            break

        config["dir_dataset"] = dir_dataset + f"/{scene_name}"
        config["dir_prediction"] = dir_prediction + f"/{scene_name}"
        os.makedirs(config["dir_prediction"], exist_ok=True)
        config["dir_result"] = dir_result + f"/{scene_name}"
        os.makedirs(config["dir_result"], exist_ok=True)
        config["experiment"] = experiment
        config["scene_name"] = scene_name
        # per-scene overrides (reference run.py:156-161)
        if "depth_supervision_lambdas" in config:
            config["depth_supervision_lambda"] = config[
                "depth_supervision_lambdas"
            ][index]
        if "extrinsic_learning_rates" in config:
            config["extrinsic_learning_rate"] = config[
                "extrinsic_learning_rates"
            ][index]
        args = argparse.Namespace(**config)
        execute_render_and_evaluate(args=args, config=config)


if __name__ == "__main__":
    main()
