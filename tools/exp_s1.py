"""Throwaway: isolate scene-1 regression. Probes: tile permutation on/off x
chunk size x traversal, under the regen scheduler."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODE = sys.argv[1]          # e.g. "noperm_static256" / "perm_static256" ...
SID = int(sys.argv[2]) if len(sys.argv) > 2 else 1

import rtw_tpu.render as RD

if MODE.startswith("noperm"):
    RD.tile_permutation = lambda nx, ny, tile=32: np.arange(nx * ny,
                                                            dtype=np.int32)

from rtw_tpu.ops import trace_kernel as TK

if "static" in MODE:
    TK._is_dynamic = lambda e: False

chunk = 256 if "256" in MODE else 64
from rtw_tpu.models.builder import SceneBuilder
_orig_build = SceneBuilder.build
SceneBuilder.build = lambda self, chunk_size=chunk: _orig_build(self, chunk)

from rtw_tpu import RenderConfig, build_scene, render

W = {4: (800, 400, 8), 1: (800, 400, 16), 2: (800, 400, 16)}
nx, ny, spp = W[SID]
cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=20, scene_id=SID,
                   scheduler="regen")
scene = build_scene(SID, nx, ny)
render(scene, cfg)
best = 0.0
for _ in range(3):
    m = {}
    render(scene, cfg, metrics=m)
    best = max(best, m["mrays_per_sec"])
print({"mode": MODE, "scene": SID, "mrays": round(best, 3)}, flush=True)
