"""sgcdet_tpu: a TPU-native (JAX / Flax / Pallas) multi-view indoor 3D object
detection framework.

This is a ground-up rebuild of the capabilities of SGCDet (ICCV 2025,
"Boosting Multi-View Indoor 3D Object Detection via Adaptive 3D Volume
Construction") designed for TPU hardware: static shapes, masked-dense sparse
compute, fused Pallas sampling kernels, pjit/shard_map parallelism and an
orbax-checkpointed optax train loop.

Layout:
  configs/    declarative dataclass configs (mirrors the reference's 4 configs)
  geometry/   voxel grids, camera projection, 3D box structures, rotated IoU
  ops/        compute kernels: deformable sampling (jnp reference + Pallas), NMS
  models/     flax modules: backbone, FPN, depth net, view transformer, heads
  data/       dataset readers, view samplers, fixed-shape batching
  train/      optimizer, schedules, train step, checkpointing
  eval/       indoor mAP evaluation (host-side NumPy)
  parallel/   device mesh + sharding helpers
"""

__version__ = "0.1.0"
