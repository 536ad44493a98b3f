"""Throwaway: isolate shading/texture cost — render scene with
resolve_albedo stubbed to the constant-color path."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SID = int(sys.argv[1]) if len(sys.argv) > 1 else 4
MODE = sys.argv[2] if len(sys.argv) > 2 else "const"

import rtw_tpu.ops.shading as SH
import rtw_tpu.integrator as IG

if MODE == "const":
    def _const_albedo(scene, shade, point, u, v, tex_filter):
        return shade.rgb
    SH.resolve_albedo = _const_albedo
    IG.resolve_albedo = _const_albedo

from rtw_tpu import RenderConfig, build_scene, render

W = {4: (800, 400, 8), 2: (800, 400, 16)}
nx, ny, spp = W[SID]
cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=20, scene_id=SID)
scene = build_scene(SID, nx, ny)
render(scene, cfg)
m = {}
render(scene, cfg, metrics=m)
print({"scene": SID, "mode": MODE, "mrays": round(m["mrays_per_sec"], 3),
       "msamples": round(m["samples_per_sec"] / 1e6, 3)}, flush=True)
