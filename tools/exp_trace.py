"""Microbench: trace/occlusion kernel throughput in isolation (throwaway).

Usage: python tools/exp_trace.py [scene_id] [mode]
mode: dyn (default) | static
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SID = int(sys.argv[1]) if len(sys.argv) > 1 else 4
MODE = sys.argv[2] if len(sys.argv) > 2 else "dyn"

from rtw_tpu.ops import trace_kernel as TK

if MODE == "static":
    TK._is_dynamic = lambda e: False

import jax
import jax.numpy as jnp
from rtw_tpu import build_scene
from rtw_tpu.ops.vec import Vec3
from rtw_tpu.models.registry import SCENE_NAMES

scene = build_scene(SID, 800, 400)
N = 320 * 1024
rng = np.random.default_rng(0)

cam = scene.camera
cam_o = np.asarray(cam.origin)

cases = {}
# primary-like rays: camera origin, directions through the image plane
s = rng.uniform(0, 1, N).astype(np.float32)
t = rng.uniform(0, 1, N).astype(np.float32)
ll, hz, vt = (np.asarray(cam.lower_left), np.asarray(cam.horizontal),
              np.asarray(cam.vertical))
d_pri = ll[None] + s[:, None] * hz[None] + t[:, None] * vt[None] - cam_o[None]
cases["primary"] = (np.broadcast_to(cam_o, (N, 3)).copy(), d_pri)
# incoherent bounce-like rays: origins in scene bounds, random dirs
lo = scene.block_aabbs[:, 0:3].min(axis=0)
hi = scene.block_aabbs[:, 3:6].max(axis=0)
lo, hi = np.asarray(lo), np.asarray(hi)
o_b = (rng.uniform(0, 1, (N, 3)) * (hi - lo) + lo).astype(np.float32)
d_b = rng.normal(size=(N, 3)).astype(np.float32)
cases["bounce"] = (o_b, d_b)

tm = jnp.zeros((N,), jnp.float32)
vu = jnp.full((max(scene.n_vol, 1), N), 0.5, jnp.float32)

@jax.jit
def run_trace(o, d):
    h, sh = TK.trace_pallas(scene, Vec3(o[:, 0], o[:, 1], o[:, 2]),
                            Vec3(d[:, 0], d[:, 1], d[:, 2]),
                            1e-6, 1e27, tm, vu)
    return h.t, h.prim_idx

for name, (o_np, d_np) in cases.items():
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    t_, p_ = run_trace(o, d)            # compile+warm
    jax.block_until_ready((t_, p_))
    t0 = time.perf_counter()
    REPS = 5
    for _ in range(REPS):
        t_, p_ = run_trace(o, d)
    jax.block_until_ready((t_, p_))
    dt = (time.perf_counter() - t0) / REPS
    hits = float((np.asarray(p_) >= 0).mean())
    print({"scene": SID, "mode": MODE, "rays": name,
           "mrays": round(N / dt / 1e6, 1), "hit_frac": round(hits, 3)},
          flush=True)
