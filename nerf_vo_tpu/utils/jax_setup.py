"""Process-level JAX configuration: persistent compilation cache.

Remote XLA compiles on the TPU tunnel cost 1–10 minutes per program; the
persistent cache makes every entry point (run.py, bench.py, tests on TPU)
reuse compilations across processes.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str = os.path.expanduser("~/.cache/nerf_vo_tpu_xla")):
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
