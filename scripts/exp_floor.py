"""Bisect the mapping step's non-scatter FLOOR (TPU).

exp_step_cuts.py pinned the production step at 29.4 ms with ~8.5 ms of
backward table scatter and an 11.9 ms "everything-off" floor — the scatter
is at the chip's per-descriptor floor (tpu_runs/exp_scatter4.log), so the
FLOOR is now half the remaining budget and has never been attributed below
the config level. This script times each stage of the step in isolation at
production shapes (isolated jits lose fusion, so treat the parts as an
upper bound on their in-step cost) plus targeted in-step arms:

  * ray-batch sampling from the keyframe buffer
  * the PDF sampler chain (uniform bins -> 2x inverse-CDF resamples)
  * each distilled dense proposal's density eval
  * the frozen field forward (density + rgb)
  * compositing + losses given field outputs
  * the optimizer: full-tree Adam vs the masked Adam that skips the
    gradient-free distilled proposal tables (mapping/trainer.py)

Usage: python scripts/exp_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax

# must flip the platform BEFORE the package imports below: module-level
# array constants would otherwise initialize the (possibly dead) axon
# backend (see exp_samples.py; the sitecustomize pins JAX_PLATFORMS=axon)
if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from exp_step_cuts import make_buf, time_variant
from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.ops import rendering as R


def timeit(name, fn, n=30):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    for _ in range(12):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)
    return best


def main():
    smoke = "--cpu-smoke" in sys.argv
    if smoke:
        K, H, W, rays = 32, 48, 64, 256  # make_buf inserts 32 keyframes
    else:
        K, H, W = 192, 360, 640
        rays = 4096
    rng = np.random.default_rng(0)
    buf = make_buf(rng, K, H, W)
    tc = TrainerConfig(rays_per_batch=rays, max_iterations=8192)
    base = NerfactoConfig(num_images=K)
    model = NerfactoModel(base)
    trainer = MappingTrainer(model, tc, K)
    state = trainer.init(jax.random.PRNGKey(0))
    params = state.params

    print("== isolated stages (production shapes, upper bounds) ==",
          flush=True)

    # 1. ray batch sampling from the keyframe buffer. NOTE: every jit
    # here takes its big operands as ARGUMENTS — a closure constant is
    # serialized into the remote-compile request body on this backend
    # (the 1.3 GB keyframe buffer gets HTTP 413'd).
    k0 = jax.random.PRNGKey(1)
    sample = jax.jit(lambda b, pd, k: kb.sample_ray_batch(b, pd, k, rays))
    timeit("ray-batch sample (buffer gathers + pose chain)",
           lambda: sample(buf, state.pose_deltas, k0))
    batch = sample(buf, state.pose_deltas, k0)
    o, d = batch["origins"], batch["directions"]

    # 2. the PDF sampler chain alone (proposal densities faked)
    s2t = R.SPACINGS[base.spacing][0]

    def sampler_chain(k):
        ks = jax.random.split(k, 3)
        e0 = R.uniform_bins(ks[0], rays, base.num_proposal_samples[0], True)
        w0 = jax.random.uniform(ks[0], e0[..., 1:].shape)
        e1 = R.sample_pdf(ks[1], e0, w0, base.num_proposal_samples[1], True)
        w1 = jax.random.uniform(ks[1], e1[..., 1:].shape)
        e2 = R.sample_pdf(ks[2], e1, w1, base.num_nerf_samples, True)
        return s2t(e2, base.near, base.far)

    sampler_jit = jax.jit(sampler_chain)
    timeit("sampler chain (bins + 2x inverse-CDF + s->t)",
           lambda: sampler_jit(k0))

    # 3/4. distilled dense proposal density evals
    for i, (pf, S) in enumerate(zip(model.proposal_fields,
                                    base.num_proposal_samples)):
        pos = o[:, None, :] + d[:, None, :] * jnp.linspace(
            0.5, 4.0, S)[None, :, None]
        fn = jax.jit(lambda w, p, pp=pf: pp.apply({"params": w}, p))
        timeit(f"proposal L{i} density eval [{rays},{S}]",
               lambda: fn(params[f"proposal_{i}"], pos))

    # 5/6. frozen field forward: density+geo, then rgb
    S = base.num_nerf_samples
    pos = o[:, None, :] + d[:, None, :] * jnp.linspace(
        0.5, 4.0, S)[None, :, None]
    fw = params["field"]
    dens_fn = jax.jit(lambda w, p: model.field.apply(
        {"params": w}, p, method=model.field.density))
    timeit(f"field density fwd [{rays},{S}] (frozen)",
           lambda: dens_fn(fw, pos))
    density, geo = dens_fn(fw, pos)
    dirs_b = jnp.broadcast_to(d[..., None, :], pos.shape)
    cam = jnp.zeros((rays,), jnp.int32)
    rgb_fn = jax.jit(lambda w, g, db, c: model.field.apply(
        {"params": w}, g, db, c, method=model.field.rgb))
    timeit("field rgb fwd (dir enc + appearance + MLP)",
           lambda: rgb_fn(fw, geo, dirs_b, cam))
    rgb_s = rgb_fn(fw, geo, dirs_b, cam)

    # 7. compositing + the loss block given field outputs
    deltas_t = jnp.full((rays, S), 0.05)
    t_mid = jnp.cumsum(deltas_t, axis=-1)

    def render_tail(dens, rgbs, gt_rgb, gt_depth):
        w, _ = R.render_weights(dens, deltas_t)
        rgb = R.composite(w, rgbs, background=rgbs[..., -1, :])
        depth = R.render_depth(w, t_mid)
        acc = R.render_accumulation(w)
        err = jnp.mean((rgb - gt_rgb) ** 2)
        dl = jnp.mean((depth - gt_depth) ** 2)
        dist = R.distortion_loss(
            jnp.concatenate([t_mid, t_mid[..., -1:] + 0.05], -1) / 10.0, w)
        return err + dl + 0.002 * dist + 0.0 * jnp.sum(acc)

    tail_jit = jax.jit(render_tail)
    timeit("composite + losses tail", lambda: tail_jit(
        density, rgb_s, batch["rgb"], batch["depth"]))

    # 8. optimizer cost: full-tree Adam vs the masked one (trainer default)
    import optax

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    full_tx = optax.adam(tc.learning_rate, eps=tc.eps)
    full_opt = full_tx.init(params)

    def full_step(p, g, s):
        u, s2 = full_tx.update(g, s)
        return optax.apply_updates(p, u), s2

    full_jit = jax.jit(full_step)
    timeit("adam full tree (incl. frozen proposals)",
           lambda: full_jit(params, grads, full_opt))

    masked_opt = trainer.tx.init(params)

    def masked_step(p, g, s):
        u, s2 = trainer.tx.update(g, s)
        return optax.apply_updates(p, u), s2

    masked_jit = jax.jit(masked_step)
    timeit("adam masked (trainer: frozen proposals skipped)",
           lambda: masked_jit(params, grads, masked_opt))

    # == in-step arms ==
    print("== in-step ==", flush=True)
    time_variant("baseline (masked adam)", base, tc, buf, K)
    time_variant(
        "occupancy sampler (NGP path, no proposals)",
        dataclasses.replace(base, sampler="occupancy"), tc, buf, K,
    )
    # phased table-grad backward: halves the dominant backward-scatter
    # descriptor count (quality gate lives in exp_gradphase.py; THIS arm
    # is the in-step speed reading at full production geometry)
    time_variant(
        "phased table grads (1 scattered level/step)",
        dataclasses.replace(base, table_grad_phase=True), tc, buf, K,
    )
    # the whole ray-batch sampler replaced by a precomputed constant batch:
    # bounds the TRUE in-step cost of sampling + the pose-delta chain (the
    # isolated arm above pays per-op launch floors the fused step may not —
    # the packed-buffer rewrite left the isolated reading at 5.28 ms
    # exactly, so the gathers were never what that arm measured). Pose
    # gradients vanish with the patch (the batch no longer depends on
    # pose_deltas), so this arm removes sampler + pose chain together.
    fixed_batch = jax.tree_util.tree_map(
        jnp.asarray,
        kb.sample_ray_batch(buf, state.pose_deltas, jax.random.PRNGKey(3),
                            rays),
    )
    orig_sample = kb.sample_ray_batch
    kb.sample_ray_batch = lambda *a, **k: fixed_batch
    try:
        time_variant(
            "fixed ray batch (sampler + pose chain off)", base, tc, buf, K,
        )
    finally:
        kb.sample_ray_batch = orig_sample
    # TPU-native operating point probe: the reference's 4096-ray batch is a
    # GPU-era choice; rays/s at 4x the batch with phased grads shows how
    # much of the step is per-op floor vs per-descriptor work (a default
    # move would additionally need an equal-ray-budget quality gate)
    time_variant(
        "phased + 16384-ray batch",
        dataclasses.replace(base, table_grad_phase=True),
        dataclasses.replace(tc, rays_per_batch=rays * 4), buf, K,
    )


if __name__ == "__main__":
    main()
