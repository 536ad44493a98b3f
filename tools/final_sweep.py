"""End-of-round measurement sweep: all scenes (best-of-3) + the stated
1000-spp Cornell headline.  Prints one JSON line per measurement."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_scenes import WORKLOADS, bench_scene  # noqa: E402


def main():
    only = [int(a) for a in sys.argv[1:]] or None
    from rtw_tpu import RenderConfig, build_scene, render

    for sid in sorted(WORKLOADS):
        if only and sid not in only:
            continue
        m = bench_scene(sid)
        print(json.dumps({"scene": sid,
                          "mrays": round(m["mrays_per_sec"], 2),
                          "msamples": round(m["samples_per_sec"] / 1e6, 2)}),
              flush=True)

    if only and 0 not in only:
        return
    # stated metric: Cornell 800^2 @ 1000 spp (VERDICT r1 item 9)
    cfg = RenderConfig(nx=800, ny=800, spp=1000, max_depth=20, scene_id=0)
    scene = build_scene(0, 800, 800)
    warm = RenderConfig(nx=800, ny=800, spp=1000, max_depth=20, scene_id=0)
    render(scene, warm)
    m = {}
    img = render(scene, cfg, metrics=m)
    assert np.isfinite(np.asarray(img)).all()
    print(json.dumps({"headline": "cornell_800x800_1000spp",
                      "mrays": round(m["mrays_per_sec"], 2),
                      "msamples": round(m["samples_per_sec"] / 1e6, 2),
                      "wall_s": round(m["wall_seconds"], 1)}), flush=True)


if __name__ == "__main__":
    main()
