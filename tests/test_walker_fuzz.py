"""Randomized-scene fuzz of the kernels' dynamic traversal (SURVEY §5
sanitizers row; VERDICT r4 item 9).

Two layers:
1. `validate_walk_layout` — host-side enumeration of every dynamic read the
   two-level walk can issue (super-row offsets, refinement overhang into
   the guard tail, scratch-row bounds) against the augmented AABB table's
   actual layout.  Pure index arithmetic, checked exactly.
2. Equivalence fuzz — random scenes (group sizes chosen to hit partial
   supers, exact-multiple supers, and single-block tails) traced three
   ways in interpret mode: pure-JAX sweep, flat walk (two-level disabled),
   and two-level walk (threshold forced down to 4 blocks).  All three must
   agree on winner identity, t, and occlusion for every lane.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import rtw_tpu as rt
from rtw_tpu.models.builder import SceneBuilder
import rtw_tpu.models.scene as S
from rtw_tpu.ops.intersect import intersect_scene, occluded
from rtw_tpu.ops.vec import v3

try:
    from jax.experimental.pallas import tpu as pltpu
    from rtw_tpu.ops import trace_kernel as TK
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _fuzz_scene(seed: int):
    """Random sphere/box/rect groups with adversarial block counts.

    Block size is 64 (builder.PRIM_BLOCK); counts are drawn to land group
    block counts on {multiple-of-_GROUP, one-over, one-under} so partial
    supers, full supers and guard-tail overhang all occur across seeds."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.lambertian(b.constant_texture((0.6, 0.6, 0.6)))
    metal = b.metal(b.constant_texture((0.9, 0.8, 0.6)), 0.1)

    # counts around block-count edges: 64*k + {-1, 0, +1} prims
    k_s = int(rng.integers(3, 9))
    n_sph = 64 * k_s + int(rng.integers(-1, 2))
    for _ in range(n_sph):
        c = rng.uniform(-120, 120, 3)
        b.sphere(c, rng.uniform(1.0, 5.0), mat if rng.random() < 0.7
                 else metal)
    k_b = int(rng.integers(3, 7))
    n_box = 64 * k_b + int(rng.integers(-1, 2))
    for _ in range(n_box):
        lo = rng.uniform(-120, 120, 3)
        b.box(lo, lo + rng.uniform(2.0, 8.0, 3), mat)
    n_rect = int(rng.integers(190, 260))
    for _ in range(n_rect):
        a0, b0 = rng.uniform(-120, 110, 2)
        b.rect(a0, a0 + rng.uniform(3, 12), b0, b0 + rng.uniform(3, 12),
               rng.uniform(-120, 120), False,
               int(rng.integers(0, 3)), mat)
    b.set_camera(lookfrom=(0, 0, -300), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov=40.0, aspect=1.0, aperture=0.0, focus_dist=10.0)
    return b.build()


def _trace_all(scene, o, d, tm, vu):
    h, _sh = TK.trace_pallas(scene, o, d, 1e-6, 1e27, tm, vu)
    occ = TK.occluded_pallas(scene, o, d, 1e-4, 1e4, tm, vu)
    return h, occ


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("seed", [11, 23, 47])
def test_walker_fuzz_flat_twolevel_jnp(seed, monkeypatch):
    scene = _fuzz_scene(seed)
    rng = np.random.default_rng(seed + 1)
    n = TK.TILE
    o = v3(jnp.asarray(rng.uniform(-1, 1, (n, 3)) * 250.0, jnp.float32))
    d = v3(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    tm = jnp.zeros((n,), jnp.float32)
    vu = jnp.ones((1, n), jnp.float32) * 0.5

    h_ref = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
    occ_ref = occluded(scene, o, d, 1e-4, 1e4, tm, vu)

    results = {}
    # third variant: HBM props streaming forced ON with MULTIPLE two-level
    # groups (spheres + boxes + rects all cross the lowered threshold) —
    # per-group super DMA bases, shared sup_ref window, resident tail
    for name, tlm, stream in [("flat", 10 ** 9, False),
                              ("two_level", 4, False),
                              ("two_level_streamed", 4, True)]:
        monkeypatch.setattr(TK, "_TWO_LEVEL_MIN", tlm)
        monkeypatch.setattr(TK, "_PROPS_STREAM_OVERRIDE", stream)
        TK.validate_walk_layout(scene)       # static index arithmetic
        with pltpu.force_tpu_interpret_mode():
            results[name] = _trace_all(scene, o, d, tm, vu)

    for name, (h_k, occ_k) in results.items():
        np.testing.assert_array_equal(np.asarray(h_ref.prim_idx),
                                      np.asarray(h_k.prim_idx), err_msg=name)
        hit = np.asarray(h_ref.prim_idx) >= 0
        np.testing.assert_allclose(np.asarray(h_ref.t)[hit],
                                   np.asarray(h_k.t)[hit], rtol=2e-4,
                                   err_msg=name)
        np.testing.assert_array_equal(np.asarray(occ_ref),
                                      np.asarray(occ_k), err_msg=name)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_walk_layout_all_reference_scenes():
    """The static sanitizer holds for every reference scene and for the
    stress tier's forced-two-level layout."""
    for sid in range(6):
        TK.validate_walk_layout(rt.build_scene(sid, 64, 64))


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_walk_layout_forced_two_level(monkeypatch):
    monkeypatch.setattr(TK, "_TWO_LEVEL_MIN", 3)
    for seed in (11, 23):
        TK.validate_walk_layout(_fuzz_scene(seed))
    for sid in (1, 2, 4):
        TK.validate_walk_layout(rt.build_scene(sid, 64, 64))
