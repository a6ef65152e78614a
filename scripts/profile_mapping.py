"""Per-part timing breakdown of one mapping train step (TPU).

Forces device sync via scalar fetch (block_until_ready does not block on
this backend).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.ops import hash_grid as hg
from nerf_vo_tpu.ops import rendering as R


def timeit(name, fn, n=10):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms")
    return out


def main():
    K, H, W = 192, 360, 640
    rays = 4096
    model = NerfactoModel(NerfactoConfig(num_images=K))
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=rays, max_iterations=8192), K
    )
    state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    buf = kb.create(K, H, W)
    n_kf = 32
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.5, 0.5, (n_kf, 3))
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([320.0, 320.0, W / 2, H / 2]), (n_kf, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (n_kf, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (n_kf, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_kf, H, W, 1)),
    }
    buf = kb.insert(buf, jnp.arange(n_kf), packet)
    key = jax.random.PRNGKey(1)

    # 1. full train step
    def full():
        nonlocal state
        state, m = trainer.train_step(state, buf, key)
        return m

    timeit("full train_step", full)

    params = state.params

    # 2. loss fwd only (no grads)
    loss_fwd = jax.jit(
        lambda p, pd, b: trainer._loss_fn(p, pd, b, key)[0]
    )
    timeit("loss fwd only", lambda: loss_fwd(params, state.pose_deltas, buf))

    # 3. loss fwd+bwd (no optimizer)
    loss_grad = jax.jit(
        lambda p, pd, b: jax.grad(
            lambda a, c: trainer._loss_fn(a, c, b, key)[0], argnums=(0, 1)
        )(p, pd)
    )
    timeit("loss fwd+bwd",
           lambda: loss_grad(params, state.pose_deltas, buf))

    # 4. ray sampling from buffer only
    samp = jax.jit(
        lambda pd, b: kb.sample_ray_batch(b, pd, key, rays)
    )
    batch = timeit("sample_ray_batch", lambda: samp(state.pose_deltas, buf))

    origins, dirs = batch["origins"], batch["directions"]
    cidx = batch.get("camera_indices")

    # 5. render fwd only (train mode, with grad normals like the loss path)
    rend = jax.jit(
        lambda p: model.render(p, origins, dirs, cidx, key=key, train=True,
                               compute_grad_normals=True)["rgb"]
    )
    timeit("render fwd (train, grad_normals)", lambda: rend(params))

    rend2 = jax.jit(
        lambda p: model.render(p, origins, dirs, cidx, key=key, train=True,
                               compute_grad_normals=False)["rgb"]
    )
    timeit("render fwd (train, no grad_normals)", lambda: rend2(params))

    # 6. encode microbench per field at the step's sample counts
    for name, cfgs, n_samples in [
        ("proposal_0 encode (128 smp)", model.proposal_fields[0].grid, rays * 128),
        ("proposal_1 encode (64 smp)", model.proposal_fields[1].grid, rays * 64),
        ("field encode (48 smp)", model.field.grid, rays * 48),
    ]:
        tbl = hg.init_tables(jax.random.PRNGKey(2), cfgs)
        pts = jnp.asarray(rng.uniform(0, 1, (n_samples, 3)), jnp.float32)
        enc = jax.jit(lambda t, x, c=cfgs: hg.hash_encode(t, x, c))
        timeit(name, lambda: enc(tbl, pts))
        encg = jax.jit(
            lambda t, x, c=cfgs: jax.grad(
                lambda tt: jnp.sum(hg.hash_encode(tt, x, c))
            )(t)
        )
        timeit(name + " +bwd", lambda: encg(tbl, pts))

    # 7. sample_pdf costs
    w0 = jnp.asarray(rng.uniform(0, 1, (rays, 128)), jnp.float32)
    e0 = R.uniform_bins(None, rays, 128, stratified=False)
    pdf1 = jax.jit(lambda w: R.sample_pdf(key, e0, w, 64))
    timeit("sample_pdf 128->64", lambda: pdf1(w0))
    w1 = jnp.asarray(rng.uniform(0, 1, (rays, 64)), jnp.float32)
    e1 = R.uniform_bins(None, rays, 64, stratified=False)
    pdf2 = jax.jit(lambda w: R.sample_pdf(key, e1, w, 48))
    timeit("sample_pdf 64->48", lambda: pdf2(w1))

    # 8. interlevel loss
    ef = R.uniform_bins(None, rays, 48, stratified=False)
    wf = jnp.asarray(rng.uniform(0, 1, (rays, 48)), jnp.float32)
    il = jax.jit(lambda a, b: R.interlevel_loss(e0, a, ef, b))
    timeit("interlevel 128 vs 48", lambda: il(w0, wf))


if __name__ == "__main__":
    main()
