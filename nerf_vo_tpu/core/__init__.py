from nerf_vo_tpu.core import lie, cameras, conventions  # noqa: F401
