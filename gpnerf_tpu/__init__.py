"""gpnerf_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
sail-sg/GP-Nerf (GP-NeRF, ECCV 2022): generalizable, geometry-guided neural
human rendering from 3 posed source views and an SMPL body prior.

Built from scratch for TPUs:
  * all compute-path kernels are JAX/XLA (+ Pallas for hot ops),
  * static shapes throughout (padded capacities + masks instead of the
    reference's dynamic boolean indexing),
  * data parallelism via `jax.sharding.Mesh` + `shard_map` with `psum`
    gradient reduction over ICI (replacing NCCL/DDP),
  * the geometry volume is built once per step (the reference rebuilds it
    per ray chunk: /root/reference/libs/nerfheads/trainhead.py:48-56).

The public extension API mirrors the reference's config-driven builder
registry (cfg.render.file / cfg.encoder.file / cfg.head.file / ...,
see /root/reference/tools/train.py:143,167,174-179).
"""

__version__ = "0.1.0"
