"""On-chip kernel-equivalence artifact (VERDICT r3 item 3).

The suite's interpret-mode equivalence tests (tests/test_trace_kernel.py)
run the kernels through the Pallas TPU *interpreter*, which QUIRKS
documents as more permissive than the real Mosaic compiler.  This tool
runs the SAME trace / occlusion comparisons against the pure-JAX
reference sweep COMPILED ON THE REAL CHIP, for every scene (0-5) plus the
synthetic dynamic-traversal and two-level stress scenes, and writes a
JSON report of max deviations per hit-record field.

Run:  python tools/kernel_check.py [out.json]
Commit the output (KERNEL_CHECK_r{N}.json) as the round's on-chip
evidence; BASELINE.md references it.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check_scene(label, scene, scale, shift, n=4096, seed=7):
    import rtw_tpu  # noqa: F401
    from rtw_tpu.ops import trace_kernel as TK
    from rtw_tpu.ops.intersect import intersect_scene, occluded
    from rtw_tpu.ops.shading import gather_shade
    from rtw_tpu.ops.vec import v3

    rng = np.random.default_rng(seed)
    o = v3(jnp.asarray(rng.uniform(-1, 1, (n, 3)) * scale + shift,
                       jnp.float32))
    d = v3(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    tm = jnp.zeros((n,), jnp.float32)
    vu = jnp.asarray(rng.uniform(0.05, 0.95,
                                 (max(scene.n_vol, 1), n)), jnp.float32)

    @jax.jit
    def both():
        h_r = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
        s_r = gather_shade(scene, h_r.prim_idx, h_r.prim_idx >= 0)
        h_k, s_k = TK.trace_pallas(scene, o, d, 1e-6, 1e27, tm, vu)
        occ_r = occluded(scene, o, d, 1e-4, 1e4, tm, vu)
        occ_k = TK.occluded_pallas(scene, o, d, 1e-4, 1e4, tm, vu)
        return h_r, s_r, h_k, s_k, occ_r, occ_k

    h_r, s_r, h_k, s_k, occ_r, occ_k = jax.tree_util.tree_map(
        np.asarray, jax.block_until_ready(both()))

    hit = h_r.prim_idx >= 0
    nh = max(int(hit.sum()), 1)

    # Winner disagreements: on real hardware the compiled kernel and the
    # XLA sweep contract FMAs differently (and approximate log ~1e-6 in the
    # volume free-flight), so a ray passing within fp noise of two surfaces
    # can legitimately report either.  Such NEAR-TIE flips (both backends'
    # accepted t within 0.1% of each other) are fp-indeterminate geometry,
    # not kernel bugs; a flip with materially different t IS a bug.
    mism = (h_r.prim_idx != h_k.prim_idx)
    tie = mism & (np.abs(h_r.t - h_k.t)
                  <= 1e-3 * np.maximum(np.abs(h_r.t), 1e-3))
    real_mism = mism & ~tie
    agree = hit & ~mism      # field comparisons on agreed winners

    def rel(a, b):
        m = np.abs(a[agree] - b[agree])
        s = np.maximum(np.abs(a[agree]), 1e-6)
        return float((m / s).max()) if agree.any() else 0.0

    def absd(a, b):
        return float(np.abs(a[agree] - b[agree]).max()) if agree.any() else 0.0

    rep = {
        "scene": label,
        "n_rays": n,
        "n_hits": int(hit.sum()),
        "winner_near_tie_flips": int(tie.sum()),
        "prim_idx_mismatches": int(real_mism.sum()),
        "mat_id_mismatches": int((h_r.mat_id != h_k.mat_id)[agree].sum()),
        "mat_type_mismatches": int(
            (s_r.mat_type != s_k.mat_type)[agree].sum()),
        "occluded_mismatches": int((occ_r != occ_k).sum()),
        "t_max_rel": rel(h_r.t, h_k.t),
        "point_max_abs": max(absd(np.asarray(a), np.asarray(b))
                             for a, b in zip(h_r.point, h_k.point)),
        "normal_max_abs": max(absd(np.asarray(a), np.asarray(b))
                              for a, b in zip(h_r.normal, h_k.normal)),
        "uv_max_abs": max(absd(h_r.u, h_k.u), absd(h_r.v, h_k.v)),
        "rgb_max_abs": max(absd(np.asarray(a), np.asarray(b))
                           for a, b in zip(s_r.rgb, s_k.rgb)),
        "fuzz_eta_max_abs": max(absd(s_r.fuzz, s_k.fuzz),
                                absd(s_r.eta, s_k.eta)),
    }
    # pass criteria mirror the interpret-mode suite tolerances; near-tie
    # winner flips are reported but bounded, not failed (<= 1% of hits)
    rep["pass"] = bool(
        rep["prim_idx_mismatches"] == 0 and rep["mat_id_mismatches"] == 0
        and rep["mat_type_mismatches"] == 0
        and rep["occluded_mismatches"] <= 0.01 * nh
        and rep["winner_near_tie_flips"] <= 0.01 * nh
        and rep["t_max_rel"] < 2e-4 and rep["normal_max_abs"] < 1e-3
        and rep["uv_max_abs"] < 2e-3 and rep["rgb_max_abs"] < 1e-5)
    return rep


def main():
    import rtw_tpu as rt
    sys.path.insert(0, os.path.dirname(__file__))
    from stress_scale import build_stress_scene

    backend = jax.default_backend()
    cases = [
        ("scene0_cornell", rt.build_scene(0, 64, 64), 600.0,
         (278.0, 278.0, -400.0)),
        ("scene1_moving_spheres", rt.build_scene(1, 64, 64), 12.0,
         (0.0, 2.0, 0.0)),
        ("scene2_iow_light", rt.build_scene(2, 64, 64), 12.0,
         (0.0, 2.0, 0.0)),
        ("scene3_volumes", rt.build_scene(3, 64, 64), 600.0,
         (278.0, 278.0, -400.0)),
        ("scene4_tnw_final", rt.build_scene(4, 64, 64), 600.0,
         (278.0, 278.0, -400.0)),
        ("scene5_three_spheres", rt.build_scene(5, 64, 64), 4.0,
         (0.0, 1.0, 1.0)),
        ("stress_16384_two_level", build_stress_scene(16384), 250.0,
         (0.0, 0.0, 0.0)),
        # round 5: HBM props streaming tier (table > _PROPS_STREAM_BYTES
        # -> per-super DMA path) checked against the same jnp reference
        ("stress_131072_streamed", build_stress_scene(131072), 250.0,
         (0.0, 0.0, 0.0)),
    ]
    reports = []
    for label, scene, scale, shift in cases:
        rep = check_scene(label, scene, scale, shift)
        print(json.dumps(rep), flush=True)
        reports.append(rep)

    out = {"backend": backend,
           "all_pass": all(r["pass"] for r in reports),
           "cases": reports}
    path = sys.argv[1] if len(sys.argv) > 1 else "KERNEL_CHECK.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; all_pass={out['all_pass']}", file=sys.stderr)


if __name__ == "__main__":
    main()
