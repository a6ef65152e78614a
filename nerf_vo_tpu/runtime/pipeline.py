"""Pipeline orchestrator: the reference's 4-process queue pipeline as one
JAX process.

Replaces nerf_vo/execute.py: instead of torch.multiprocessing processes,
queues, a Manager status dict, and a shutdown cascade (execute.py:25-124),
the stages run interleaved in one process — tracking's jitted step, the
prior networks, and mapping train steps share the chip via XLA's async
dispatch, while a single prefetch thread overlaps disk/OpenCV frame loading
(the only genuinely host-bound stage). The serial mode (`multithreading:
False`) is fully deterministic and is the test harness, exactly as SURVEY.md
§4 prescribes.

Mapping pacing preserves the reference rule: at most
``mapping_iterations / num_keyframes`` consecutive train-only steps while
the stream is active (mapping_module.py:36-47), then train to completion.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Optional

from nerf_vo_tpu.runtime.perf import PerformanceTracker
from nerf_vo_tpu.runtime.stages import (
    DataStage,
    EnhancementStage,
    MappingStage,
    TrackingStage,
)


def execute(args) -> MappingStage:
    """Run the full VO + mapping pipeline for one scene.

    Returns the mapping stage (holding the trained model state), mirroring
    the reference's ``execute(args) -> mapping_model`` (execute.py:126).
    """
    dir_prediction = getattr(args, "dir_prediction", None)
    dir_result = getattr(args, "dir_result", None)
    if dir_prediction:
        os.makedirs(os.path.join(dir_prediction, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(dir_prediction, "matrices"), exist_ok=True)

    perf = PerformanceTracker(getattr(args, "performance_tracking", True))
    data = DataStage(args)
    tracking = TrackingStage(args)
    enhancement = EnhancementStage(args)
    mapping = MappingStage(args)

    multithreading = getattr(args, "multithreading", False)
    frame_iter = (
        _threaded_frames(data) if multithreading else _serial_frames(data)
    )

    # Online mapping rate: up to this many train steps are dispatched per
    # input frame (the reference's per-packet budget of
    # mapping_iterations/num_keyframes still caps the total between
    # packets — can_train enforces it). JAX async dispatch queues the
    # steps behind tracking's device work without blocking the host.
    steps_per_frame = int(getattr(args, "mapping_steps_per_frame", 4))

    done = False
    while not done:
        with perf.track("data"):
            frame = next(frame_iter, None)
        if frame is None:
            done = True

        with perf.track("tracking"):
            packet = tracking.step(frame)

        if packet is not None:
            with perf.track("enhancement"):
                enhanced = enhancement.step(packet)
            with perf.track("mapping"):
                mapping.update(enhanced)
            if enhanced is not None and enhanced.get("last_frame"):
                done = True
        with perf.track("mapping"):
            for _ in range(steps_per_frame):
                if mapping.train_step() is None:
                    break

    with perf.track("mapping"):
        mapping.finish()

    if dir_prediction:
        tracking.save_artifacts(dir_prediction)
        mapping.save_snapshot(dir_prediction)
    if dir_result:
        perf.write_csvs(dir_result)
    return mapping


def _serial_frames(data: DataStage):
    while True:
        frame = data.step()
        if frame is None:
            return
        yield frame
        if frame.get("last_frame"):
            return


def _threaded_frames(data: DataStage, depth: int = 8):
    """Prefetch frames on a thread (disk + OpenCV decode overlap device work)."""
    q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=depth)

    def worker():
        while True:
            frame = data.step()
            q.put(frame)
            if frame is None or frame.get("last_frame"):
                return

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        frame = q.get()
        if frame is None:
            return
        yield frame
        if frame.get("last_frame"):
            return
