"""Per-scene throughput measurement on the current backend.

Workloads mirror the BASELINE.md all-scenes table so numbers are comparable
across rounds.  Each config renders once for warm-up (compiles + first
tunnel transfer) and once timed.

Usage: python tools/bench_scenes.py [scene_id ...]   (default: all)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# scene_id -> (nx, ny, spp)
WORKLOADS = {
    0: (800, 800, 64),
    1: (800, 400, 16),
    2: (800, 400, 16),
    3: (400, 400, 32),
    4: (800, 400, 8),
    5: (400, 224, 64),
}


REPS = 3   # timed repeats; report the best (tunnel dispatch jitter is real)


def bench_scene(sid: int, overrides: dict | None = None):
    from rtw_tpu import RenderConfig, build_scene, render

    nx, ny, spp = WORKLOADS[sid]
    cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=20, scene_id=sid,
                       **(overrides or {}))
    scene = build_scene(sid, nx, ny)
    render(scene, cfg)                       # warm-up (identical config)
    best = None
    for _ in range(REPS):
        metrics = {}
        img = render(scene, cfg, metrics=metrics)
        assert np.isfinite(np.asarray(img)).all()
        if best is None or metrics["mrays_per_sec"] > best["mrays_per_sec"]:
            best = metrics
    return best


def _coerce(v: str):
    """k=v override values arrive as strings; RenderConfig fields are typed
    (int/float/bool/str), so parse literals where possible."""
    import ast

    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def main(argv):
    overrides = {}
    ids = []
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _coerce(v)
        else:
            ids.append(int(a))
    ids = ids or sorted(WORKLOADS)
    for sid in ids:
        m = bench_scene(sid, overrides or None)
        print(json.dumps({
            "scene": sid, **overrides,
            "mrays_per_sec": round(m["mrays_per_sec"], 3),
            "msamples_per_sec": round(m["samples_per_sec"] / 1e6, 3),
            "wall_seconds": round(m["wall_seconds"], 3),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
