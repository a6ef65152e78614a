"""Multi-seed calibration of the instant-ngp accuracy gate (VERDICT r4
item 9: the gate traps only catastrophe — 17.6 dB measured vs 14 dB
gated). Runs the exact tests/test_accuracy_ngp.py fixture across N seeds
and prints per-seed PSNR / median-rel-depth so the thresholds can be set
at measured-minus-noise. CPU-runnable (tiny fixture).

Usage: python scripts/exp_ngp_gate_seeds.py [n_seeds]
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tiny fixture — always run on CPU (the sitecustomize bakes
# JAX_PLATFORMS=axon; the env var alone is not enough, see
# .claude/skills/verify)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def load_fixture_module():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_accuracy_ngp.py")
    spec = importlib.util.spec_from_file_location("t_ngp", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t = load_fixture_module()
    H, W, FX = t.H, t.W, t.FX
    psnrs, meds = [], []
    for seed in range(n_seeds):
        trainer, state, buf, colors, depths = t.fit_ngp(seed)
        out = trainer.render_image(state, buf.c2w[0], buf.intrinsics[0], H, W)
        rgb = np.asarray(out["rgb"])
        mse = float(np.mean((rgb - colors[0]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        pred = np.asarray(out["depth"])
        ys, xs = np.mgrid[0:H, 0:W]
        dirlen = np.sqrt(
            ((xs - W / 2) / FX) ** 2 + ((ys - H / 2) / FX) ** 2 + 1
        )
        gt = depths[0] * dirlen
        med = float(np.median(np.abs(pred - gt) / gt))
        psnrs.append(psnr)
        meds.append(med)
        print(f"seed {seed}: psnr={psnr:6.2f} dB  med-rel-depth={med:6.3f}",
              flush=True)
    print(f"psnr  mean={np.mean(psnrs):6.2f} min={min(psnrs):6.2f} "
          f"max={max(psnrs):6.2f} std={np.std(psnrs):5.2f}")
    print(f"depth mean={np.mean(meds):6.3f} min={min(meds):6.3f} "
          f"max={max(meds):6.3f} std={np.std(meds):5.3f}")
    print("suggested gates: psnr > "
          f"{min(psnrs) - 2 * np.std(psnrs) - 0.5:.1f}, "
          f"med-rel-depth < {max(meds) + 2 * np.std(meds) + 0.02:.3f}")


if __name__ == "__main__":
    main()
