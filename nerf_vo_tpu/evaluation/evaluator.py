"""Metric computation: trajectory / 2D / 3D CSVs and JSONs.

Behavior-parity rewrite of evaluation/evaluator.py (reference): sim(3)
Umeyama-aligned ATE for the tracking and mapping keyframe trajectories
(evaluator.py:55-83 -> metrics_trajectory.csv), per-evaluation-frame depth
metrics + PSNR/MSSIM(/LPIPS gated) (evaluator.py:85-146 -> csv + json), and
point-sampled mesh accuracy/completion/precision/recall/F1 at 5 cm with
voxel downsampling + ICP refinement (evaluator.py:148-174).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import cv2
import numpy as np
import pandas as pd

from nerf_vo_tpu.evaluation import meshio, metrics
from nerf_vo_tpu.evaluation.datasets import EVAL_DATASETS, EvaluationDataset


class Evaluator:
    def __init__(self, config: dict, dataset: Optional[EvaluationDataset] = None):
        self.config = config
        self.dir_prediction = config["dir_prediction"]
        self.dir_result = config.get("dir_result", self.dir_prediction)
        os.makedirs(self.dir_result, exist_ok=True)
        if dataset is None:
            cls = EVAL_DATASETS[config["dataset_name"]]
            dataset = cls(
                dir_dataset=config["dir_dataset"],
                num_evaluation_frames=config["num_evaluation_frames"],
                frame_height=config.get("evaluation_frame_height", 0),
                frame_width=config.get("evaluation_frame_width", 0),
            )
        self.dataset = dataset
        with open(self.dir_prediction + "/mapping_keyframe2frame.json") as f:
            self.keyframes = json.load(f)

    # -- trajectory ------------------------------------------------------

    def calculate_metrics_trajectory(self) -> Dict[str, float]:
        kf_frames = [self.keyframes[k] for k in sorted(self.keyframes,
                                                       key=int)]
        gt = np.stack(
            [self.dataset.camera_extrinsics[min(i, self.dataset.num_frames - 1)]
             for i in kf_frames]
        )[:, :3, 3]
        out = {}
        for name in ("keyframes_tracking", "keyframes_mapping"):
            path = (self.dir_prediction
                    + f"/matrices/matrices_origin2frame_{name}.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                data = json.load(f)
            mats = (np.asarray(data) if isinstance(data, list)
                    else np.stack([np.asarray(data[k])
                                   for k in sorted(data, key=int)]))
            n = min(len(mats), len(gt))
            m = metrics.absolute_trajectory_error(gt[:n], mats[:n, :3, 3])
            out.update({f"{name}/{k}": v for k, v in m.items()})
        pd.DataFrame([out]).to_csv(
            os.path.join(self.dir_result, "metrics_trajectory.csv"),
            index=False,
        )
        return out

    # -- 2D --------------------------------------------------------------

    def calculate_metrics_2d(self) -> Dict[str, float]:
        folder = self.dir_prediction + "/evaluation_frames"
        rows = []
        for index in self.dataset.evaluation_frames:
            fc = f"{folder}/color/{index:06d}.jpg"
            fd = f"{folder}/depth/{index:06d}.png"
            if not (os.path.exists(fc) and os.path.exists(fd)):
                continue
            pred_color = cv2.cvtColor(cv2.imread(fc), cv2.COLOR_BGR2RGB
                                      ).astype(np.float64) / 255.0
            pred_depth = cv2.imread(fd, cv2.IMREAD_ANYDEPTH).astype(
                np.float64
            ) / self.dataset.camera_intrinsics["depth_scale"]
            gt_color = self.dataset._load_frame_color(index).astype(
                np.float64
            ) / 255.0
            gt_depth = self.dataset._load_frame_depth(index)
            row = {"frame": index}
            row["psnr"] = metrics.psnr(pred_color, gt_color)
            row["mssim"] = metrics.mssim(pred_color, gt_color)
            # Always emit the lpips column (reference CSV schema,
            # evaluation/evaluator.py:128-136): NaN when the pretrained
            # AlexNet weights are unavailable (NERF_VO_LPIPS_WEIGHTS unset)
            # so the gap is an explicit N/A, never a silently absent column.
            lp = metrics.lpips_distance(pred_color, gt_color)
            row["lpips"] = np.nan if lp is None else lp
            row.update(metrics.depth_metrics(pred_depth, gt_depth))
            rows.append(row)
        if not rows:
            return {}
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(self.dir_result, "metrics_2d_frames.csv"),
                  index=False)
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN mean
                agg = {
                    k: float(np.nanmean(
                        df[k].replace([np.inf, -np.inf], np.nan)
                    ))
                    for k in df.columns if k != "frame"
                }
        pd.DataFrame([agg]).to_csv(
            os.path.join(self.dir_result, "metrics_2d.csv"), index=False
        )
        # JSON: NaN is not valid JSON — emit null for unavailable metrics
        # (e.g. lpips without NERF_VO_LPIPS_WEIGHTS).
        agg_json = {k: (None if np.isnan(v) else v) for k, v in agg.items()}
        with open(os.path.join(self.dir_result, "metrics_2d.json"), "w") as f:
            json.dump(agg_json, f)
        return agg

    # -- 3D --------------------------------------------------------------

    def calculate_metrics_3d(self, n_points: int = 200_000,
                             threshold: float = 0.05
                             ) -> Optional[Dict[str, float]]:
        pred_path = None
        for cand in ("mesh_from_nerf.ply", "mesh_from_evaluation_frames.ply"):
            p = self.dir_prediction + f"/mesh/{cand}"
            if os.path.exists(p):
                pred_path = p
                break
        if pred_path is None:
            return None
        (gt_verts, gt_faces), _ = self.dataset.mesh()
        pv, pf = meshio.read_ply(pred_path)
        if len(pv) == 0:
            return None
        pred_pts = meshio.sample_mesh_points(pv, pf, n_points)
        gt_pts = meshio.sample_mesh_points(gt_verts, gt_faces, n_points)
        pred_pts = meshio.voxel_downsample(pred_pts, 1.0 / 64.0)
        gt_pts = meshio.voxel_downsample(gt_pts, 1.0 / 64.0)
        out = metrics.mesh_3d_metrics(pred_pts, gt_pts, threshold=threshold)
        pd.DataFrame([out]).to_csv(
            os.path.join(self.dir_result, "metrics_3d.csv"), index=False
        )
        return out
