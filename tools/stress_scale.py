"""Scale-ceiling probe: Mrays/s vs primitive count (VERDICT r3 item 4).

Builds synthetic N-sphere scenes (uniform in a 400-unit cube, the same
shape as tests/test_trace_kernel._huge_prim_scene) far beyond the largest
reference scene (TNW ~3.4k prims) and measures one-chip throughput with
the two-level (super-group) traversal vs the flat per-block walk.

The flat walk's per-tile reduce work is O(B^2 * lanes) in the group's
block count B — the QUIRKS scale-ceiling analysis predicts it dies around
10^4-10^5 prims; the two-level walk bounds it at O(S^2) + O(reached *
_GROUP^2).  Reference capability: optixAccelBuild's log-N BVH traversal
at any primitive count (ioGeometryGroup.h:160-225).

Usage:
  python tools/stress_scale.py                 # sweep, two-level (default)
  python tools/stress_scale.py --flat          # force the flat walk
  python tools/stress_scale.py --counts 4096 16384
Run --flat in a separate process (kernel caches key on the chunk plan,
not the traversal mode).  Writes one JSON line per config to stdout.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_stress_scene(n_spheres: int):
    from rtw_tpu.models.builder import SceneBuilder

    b = SceneBuilder()
    rng = np.random.default_rng(5)
    mat = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
    centers = rng.uniform(-200, 200, (n_spheres, 3))
    radii = rng.uniform(1.0, 5.0, n_spheres)
    for c, r in zip(centers, radii):
        b.sphere(c, float(r), mat)
    b.set_camera(lookfrom=(0, 0, -500), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov=40.0, aspect=1.0, aperture=0.0, focus_dist=10.0)
    return b.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true",
                    help="disable the two-level super-group traversal")
    ap.add_argument("--counts", type=int, nargs="*",
                    default=[4096, 16384, 65536])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    from rtw_tpu.ops import trace_kernel as TK
    if args.flat:
        TK._TWO_LEVEL_MIN = 10 ** 9    # before any kernel is built

    from rtw_tpu import RenderConfig, build_scene, render  # noqa: F401

    for n in args.counts:
        t0 = time.time()
        scene = build_stress_scene(n)
        build_s = time.time() - t0
        two_level = any(TK._two_level(e) for e in scene.chunk_plan)
        cfg = RenderConfig(nx=args.size, ny=args.size, spp=args.spp,
                           max_depth=8, scene_id=0)
        render(scene, cfg)               # warm-up / compile
        best = None
        for _ in range(3):
            m = {}
            render(scene, cfg, metrics=m)
            best = m if best is None or m["mrays_per_sec"] > best[
                "mrays_per_sec"] else best
        print(json.dumps({
            "n_prims": n,
            "mode": "two_level" if two_level else "flat",
            "mrays_per_sec": round(best["mrays_per_sec"], 3),
            "wall_seconds": round(best["wall_seconds"], 3),
            "build_seconds": round(build_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
