"""Glue: execute -> render -> evaluate for one scene (reference
run.py:29-91's ``execute_render_and_evaluate`` back half)."""

from __future__ import annotations

import argparse
from typing import Dict, Optional

from nerf_vo_tpu.evaluation.datasets import EVAL_DATASETS
from nerf_vo_tpu.evaluation.evaluator import Evaluator
from nerf_vo_tpu.evaluation.nerf_renderer import MapRenderer
from nerf_vo_tpu.evaluation.renderer import Renderer


def render_and_evaluate(args: argparse.Namespace, config: dict,
                        mapping_stage) -> Dict[str, Dict]:
    nerf = MapRenderer(mapping_stage)

    cls = EVAL_DATASETS[config["dataset_name"]]
    dataset = cls(
        dir_dataset=config["dir_dataset"],
        num_evaluation_frames=config["num_evaluation_frames"],
        frame_height=config.get("evaluation_frame_height", 0),
        frame_width=config.get("evaluation_frame_width", 0),
    )

    renderer = Renderer(config=config, dataset=dataset, nerf=nerf)
    renderer.render_camera_extrinsics_keyframes()
    renderer.render_frames()
    renderer.render_mesh(source="frames")
    if config.get("render_poisson_mesh", False):
        # opt-in Poisson surface reconstruction (reference
        # nerf_renderer.py:170-209 offers Poisson export alongside TSDF)
        renderer.render_mesh(source="poisson")

    evaluator = Evaluator(config=config, dataset=dataset)
    metrics = {
        "trajectory": evaluator.calculate_metrics_trajectory(),
        "2d": evaluator.calculate_metrics_2d(),
        "3d": evaluator.calculate_metrics_3d(),
    }
    print(metrics["trajectory"])
    print(metrics["2d"])
    print(metrics["3d"])
    return metrics
