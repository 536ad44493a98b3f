"""rtw_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
OptiX/CUDA reference `safes/RayTracing-Weekend` (Peter Shirley's *Ray Tracing
in One Weekend* series through *The Rest of Your Life*), built wavefront-style
for TPU:

- SoA ray state in HBM, lockstep bounce loop (`lax.while_loop` / `lax.scan`)
  with alive-masking instead of OptiX's megakernel + SER reordering
  (reference: RestOfLife/raygen/raygen.cu:28-87).
- Vectorized brute-force primitive sweep with per-tile AABB block culling
  instead of hardware BVH `optixTraverse` — measured to beat a per-ray BVH
  walk on this hardware (docs/QUIRKS.md "TPU acceleration-structure note";
  reference: RestOfLife/geometry/*.cu).
- Branch-free masked material shading instead of direct-callable function
  tables (reference: RestOfLife/shaders/closehit.cu, material/*.cu).
- Counter-based threefry RNG keyed by (pixel, sample, bounce) so images are
  independent of device mesh shape (reference: tea<64> + LCG, lib/random.cuh).
- Differentiable forward render (gradients w.r.t. albedo / emission / camera)
  and multi-host sharding via `jax.sharding.Mesh` + `shard_map` — both new
  capabilities absent from the single-GPU reference.

Package layout:
  models/    scene/world model: cameras, materials, textures, lights, scenes 0-4
  ops/       compute kernels: intersection sweeps, Pallas trace kernels,
             shading, sampling, textures
  parallel/  device mesh, sharded rendering, distributed bootstrap
  utils/     config, RNG, image I/O, metrics, logging
"""

from rtw_tpu.utils.config import RenderConfig
from rtw_tpu.render import render, render_image
from rtw_tpu.models.registry import build_scene, SCENE_NAMES

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "render",
    "render_image",
    "build_scene",
    "SCENE_NAMES",
]
