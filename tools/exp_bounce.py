"""Throwaway: per-component timing of one wavefront bounce at full width."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SID = int(sys.argv[1]) if len(sys.argv) > 1 else 4

import jax
import jax.numpy as jnp
import dataclasses
from rtw_tpu import RenderConfig, build_scene
from rtw_tpu import integrator as IG
from rtw_tpu.ops import trace_kernel as TK
from rtw_tpu.utils import rng as R
from rtw_tpu.ops.vec import Vec3

W = {4: (800, 400), 2: (800, 400), 0: (800, 800)}
nx, ny = W[SID]
cfg = RenderConfig(nx=nx, ny=ny, spp=8, max_depth=20, scene_id=SID)
scene = build_scene(SID, nx, ny)
N = nx * ny
pix = jnp.arange(N, dtype=jnp.int32)
key = R.base_key(0)
pk = R.make_path_keys(key, pix, jnp.zeros((N,), jnp.int32), cfg.rng)
state = IG.generate_camera_rays(scene, cfg, pix, pk)
bounce = jnp.zeros((N,), jnp.int32)

scene_nolight = dataclasses.replace(scene, num_lights=0)

nv = max(scene.n_vol, 1)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    REPS = 10
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print({"name": name, "ms": round(dt, 2)}, flush=True)
    return out


@jax.jit
def full_bounce(st):
    return IG.bounce_step(scene, cfg, pk, st, bounce)


@jax.jit
def bounce_no_nee(st):
    return IG.bounce_step(scene_nolight, cfg, pk, st, bounce)


@jax.jit
def trace_only(st):
    U = R.bounce_uniforms(pk, bounce + 1, R.NUM_FIXED_SLOTS + 2 * nv, cfg.rng)
    vol_u = U[R.NUM_FIXED_SLOTS: R.NUM_FIXED_SLOTS + nv]
    h, sh = TK.trace_pallas(scene, st.origin, st.direction, cfg.t_min,
                            jnp.full((N,), 1e27, jnp.float32), st.time, vol_u)
    return h.t, sh.mat_type


@jax.jit
def occl_only(st):
    U = R.bounce_uniforms(pk, bounce + 1, R.NUM_FIXED_SLOTS + 2 * nv, cfg.rng)
    occ_u = U[R.NUM_FIXED_SLOTS + nv: R.NUM_FIXED_SLOTS + 2 * nv]
    return TK.occluded_pallas(scene, st.origin, st.direction, cfg.shadow_eps,
                              jnp.full((N,), 100.0, jnp.float32), st.time,
                              occ_u)


@jax.jit
def regen(st):
    fresh = IG.generate_camera_rays(scene, cfg, pix, pk)
    return fresh.origin.x + st.origin.x


@jax.jit
def uniforms_only(st):
    return R.bounce_uniforms(pk, bounce + 1, R.NUM_FIXED_SLOTS + 2 * nv,
                             cfg.rng)


timeit("trace_only", trace_only, state)
timeit("occl_only", occl_only, state)
timeit("uniforms", uniforms_only, state)
timeit("regen_camera", regen, state)
timeit("bounce_no_nee", bounce_no_nee, state)
timeit("full_bounce", full_bounce, state)
