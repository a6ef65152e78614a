"""nerf_vo_tpu — TPU-native (JAX/XLA/Pallas) visual-odometry + NeRF mapping framework.

A from-scratch rebuild of the capabilities of NeRF-VO (RA-L 2024,
reference: jens-nau/NeRF-VO): a sparse deep-patch VO tracking frontend, dense
depth/normal priors, and an online hash-grid NeRF mapper with joint pose
refinement — all designed TPU-first (static shapes, fused XLA/Pallas compute,
jax.sharding for multi-chip scale) rather than translated from the reference's
CUDA/torch architecture.

Subpackages
-----------
core         SE3/SO3 Lie algebra, cameras, coordinate conventions
ops          Pallas/XLA kernels: hash-grid encoding, correlation, BA, rendering
models       Flax networks: NeRF fields, DPT priors, VO update nets
mapping      online NeRF training (keyframe buffer, trainer, mapping methods)
tracking     DPVO-style patch-graph visual odometry
enhancement  dense prior inference + sparse-depth alignment
data         dataset ingest (Replica / ScanNet / TUM-RGBD / 7-Scenes / ETH3D)
runtime      single-process concurrent pipeline (replaces torch.multiprocessing)
parallel     jax.sharding meshes and sharded train steps
evaluation   trajectory / 2D / 3D metrics + rendering
"""

__version__ = "0.1.0"
