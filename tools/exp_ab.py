"""Quick A/B harness for traversal experiments on scene 4 (throwaway)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "dyn64"
SID = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from rtw_tpu.ops import trace_kernel as TK

if MODE.startswith("static"):
    TK._is_dynamic = lambda e: False

import rtw_tpu.models.registry as registry
from rtw_tpu.models.builder import SceneBuilder

chunk = int(MODE[-3:]) if MODE[-3:].isdigit() else 64
_orig_build = SceneBuilder.build
SceneBuilder.build = lambda self, chunk_size=chunk: _orig_build(self, chunk)

from rtw_tpu import RenderConfig, build_scene, render

W = {4: (800, 400, 8), 2: (800, 400, 16), 1: (800, 400, 16), 0: (800, 800, 64)}
nx, ny, spp = W[SID]
cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=20, scene_id=SID)
scene = build_scene(SID, nx, ny)
t0 = time.perf_counter()
render(scene, cfg)
t_compile = time.perf_counter() - t0
m = {}
img = render(scene, cfg, metrics=m)
assert np.isfinite(np.asarray(img)).all()
print({"mode": MODE, "scene": SID, "mrays": round(m["mrays_per_sec"], 3),
       "wall": round(m["wall_seconds"], 2),
       "first_run_s": round(t_compile, 1)}, flush=True)
