"""LSPS-TPU: a TPU-native framework for 3D hand-pose estimation with a
shared latent space (capabilities of masabdi/LSPS, BMVC 2018, re-designed
for JAX/XLA/Pallas/pjit).

Layer map (bottom-up):
  data/      geometry, cameras, importers, detector, augmentation, loaders
  ops/       functional NN building blocks + Pallas TPU kernels
  models/    poseVAE, SharedResGen/SharedResXGen, SharedDis, Mapping
  train/     optimizers, jitted update steps, checkpointing
  eval/      hand-pose metrics and plots
  parallel/  device mesh + sharding rules (DP over ICI, optional model axis)
  serve/     fused single-program depth->pose inference
  cli/       pose_train / depth_train entry points
"""

__version__ = "0.1.0"

import os as _os


def _enable_xla_cache():
    """Persistent XLA compilation cache (opt-out: LSPS_XLA_CACHE=0).

    Full-size programs take minutes to compile on a 1-core host; the
    on-disk cache makes every repeat run (CLI restarts, bench reruns,
    resume-after-preemption) start in seconds.  Cache keys include
    platform/topology, so TPU and CPU entries coexist.  Failures are
    non-fatal — an unwritable dir or an older jax just skips caching.
    """
    path = _os.environ.get("LSPS_XLA_CACHE",
                           _os.path.expanduser("~/.cache/lsps_xla"))
    if path in ("", "0"):
        return
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast-compiling programs: dispatch-level latency on
        # this platform makes a 0.5 s recompile worth skipping too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass


_enable_xla_cache()

from lsps_tpu.config import NetConfig, load_config  # noqa: F401
