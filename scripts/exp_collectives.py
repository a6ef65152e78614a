"""Count the multi-chip train step's collective traffic (VERDICT r4
missing #3: keep the DP-scaling extrapolation honest).

Real multi-chip hardware is unavailable here (one tunneled chip), so the
8-chip 1M rays/s extrapolation (BASELINE.md) rests on arithmetic. This
script compiles the ACTUAL sharded train steps (production table/sample
shapes) on the virtual 8-device CPU mesh, walks the optimized HLO, and
sums the collective payload bytes per step — then states the implied ICI
time at an ASSUMED per-chip interconnect bandwidth so the extrapolation's
communication term is explicit instead of hand-waved.

Assumption knob: --ici-gbps GB/s of usable per-chip ICI bandwidth
(default 100 — deliberately conservative for a v5e 2D-torus ring
all-reduce; the public v5e spec sheet quotes 1600 Gbps/chip aggregate).

Modes compiled: DP8 (pure data parallel), DP4xTP2 replicated-descriptor,
DP4xTP2 descriptor-sharded (a2a routing).
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEV = 8

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
               "collective-permute")
DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "s16": 2,
               "u16": 2}


def respawn_on_cpu_mesh():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    xla = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{xla} --xla_force_host_platform_device_count={N_DEV}".strip()
    )
    env["_EXP_COLLECTIVES_CHILD"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; sys.argv = ['exp_collectives.py'] + "
        f"{sys.argv[1:]!r}; "
        f"runpy.run_path({os.path.abspath(__file__)!r}, run_name='__main__')"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env)
    raise SystemExit(r.returncode)


def collective_bytes(hlo_text: str):
    """Sum payload bytes per collective kind from optimized HLO text.

    Matches instruction lines like
      %all-reduce.1 = (f32[64]{0}, /*index=5*/f32[64,3]{1,0}, ...) all-reduce(
    summing every dtype[dims] shape on the RESULT side (before the op
    name). Tuple all-reduces carry /*index=N*/ comments between shapes,
    which is why this walks lines instead of one shapes-then-op regex.
    """
    out = {k: 0 for k in COLLECTIVES}
    counts = {k: 0 for k in COLLECTIVES}
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        for kind in COLLECTIVES:
            idx = line.find(f" {kind}(")
            if idx < 0:
                continue
            eq = line.find("=")
            if eq < 0 or eq > idx:
                continue
            total = 0
            for sm in shape_pat.finditer(line[eq + 1: idx]):
                dt, dims = sm.group(1), sm.group(2)
                if dt not in DTYPE_BYTES:
                    continue
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * DTYPE_BYTES[dt]
            out[kind] += total
            counts[kind] += 1
            break
    return out, counts


def analyze(label, step_fn, args, ici_gbps):
    import jax

    # make_dp_tp_train_step returns a caching wrapper, not a jitted fn —
    # re-jit uniformly (inner jits inline during tracing)
    lowered = jax.jit(lambda s, b, k: step_fn(s, b, k)).lower(*args)
    text = lowered.compile().as_text()
    by, counts = collective_bytes(text)
    total_payload = sum(by.values())
    # ring cost per device: all-reduce moves ~2(n-1)/n of payload,
    # all-gather/reduce-scatter/all-to-all ~(n-1)/n
    n = N_DEV
    wire = (by["all-reduce"] * 2 * (n - 1) / n
            + (by["all-gather"] + by["reduce-scatter"]
               + by["all-to-all"]) * (n - 1) / n
            + by["collective-permute"])
    ici_ms = wire / (ici_gbps * 1e9) * 1e3
    print(f"\n[{label}]")
    for k in COLLECTIVES:
        if counts[k]:
            print(f"  {k:20s} x{counts[k]:3d}  payload "
                  f"{by[k] / 1e6:9.2f} MB")
    print(f"  total payload {total_payload / 1e6:.2f} MB; ring wire/device "
          f"~{wire / 1e6:.2f} MB; at {ici_gbps} GB/s ICI ~= "
          f"{ici_ms:.3f} ms/step")
    print(f"  vs the measured 26.6 ms single-chip step: collectives are "
          f"{100 * ici_ms / 26.6:.1f}% of a step "
          f"(assumed-ICI; v5e spec-sheet aggregate is 1600 Gbps/chip)")
    return {"bytes": by, "wire": wire, "ici_ms": ici_ms}


def main():
    if "_EXP_COLLECTIVES_CHILD" not in os.environ:
        respawn_on_cpu_mesh()

    import jax

    if jax.device_count() < N_DEV:
        print(f"need {N_DEV} devices, have {jax.device_count()}")
        raise SystemExit(1)

    import numpy as np
    import jax.numpy as jnp

    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
    from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
    from nerf_vo_tpu.parallel import sharding

    ici_gbps = 100.0
    if "--ici-gbps" in sys.argv:
        ici_gbps = float(sys.argv[sys.argv.index("--ici-gbps") + 1])

    # production table/sample shapes (default NerfactoConfig), tiny frames
    K, H, W = 8, 24, 32
    model = NerfactoModel(NerfactoConfig(num_images=K))
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=4096, max_iterations=8), K
    )
    rng = np.random.default_rng(0)
    buf = kb.create(K, H, W)
    c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.3, 0.3, (K, 3))
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([20.0, 20.0, W / 2, H / 2]),
                               (K, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (K, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (K, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (K, H, W, 1)),
    }
    buf = kb.insert(buf, jnp.arange(K), packet)
    key = jax.random.PRNGKey(1)

    # DP8
    mesh1 = sharding.make_mesh(N_DEV)
    st = sharding.replicate(trainer.init(jax.random.PRNGKey(0)), mesh1)
    step = sharding.make_dp_train_step(trainer, mesh1)
    analyze("DP8 (pure data parallel)", step,
            (st, sharding.replicate(buf, mesh1), key), ici_gbps)

    # DP4 x TP2 replicated descriptors
    mesh2 = sharding.make_mesh_2d(4, 2)
    st = sharding.shard_state_tp(trainer.init(jax.random.PRNGKey(0)), mesh2)
    step = sharding.make_dp_tp_train_step(trainer, mesh2)
    analyze("DP4 x TP2 (replicated descriptors)", step,
            (st, sharding.replicate(buf, mesh2), key), ici_gbps)

    # DP4 x TP2 descriptor-sharded (a2a)
    st = sharding.shard_state_tp(trainer.init(jax.random.PRNGKey(0)), mesh2)
    step = sharding.make_dp_tp_train_step(trainer, mesh2,
                                          descriptor_sharding=True)
    analyze("DP4 x TP2 (descriptor-sharded a2a)", step,
            (st, sharding.replicate(buf, mesh2), key), ici_gbps)


if __name__ == "__main__":
    main()
