"""Pallas trace-kernel equivalence vs the pure-JAX reference sweep.

Runs in interpreter mode so the CPU suite covers the kernel logic; the same
comparison runs compiled on real TPU hardware (see _pallas_check usage in
BASELINE.md history).  The pure-JAX ops/intersect.py sweep is the reference
implementation; the kernel must agree on every hit-record field.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rtw_tpu as rt
from rtw_tpu.ops.intersect import intersect_scene, occluded
from rtw_tpu.ops.shading import gather_shade
from rtw_tpu.ops.vec import v3

try:
    from jax.experimental.pallas import tpu as pltpu
    from rtw_tpu.ops import trace_kernel as TK
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _rand_rays(rng, n, scale, origin_shift):
    o = v3(jnp.asarray(rng.uniform(-1, 1, (n, 3)) * scale + origin_shift,
                       jnp.float32))
    d = v3(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    return o, d


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("sid,scale,shift", [
    (0, 600.0, (278.0, 278.0, -400.0)),   # Cornell: transforms + NEE light
    (3, 600.0, (278.0, 278.0, -400.0)),   # volumes + transforms
    (5, 4.0, (0.0, 1.0, 1.0)),            # spheres only
])
def test_kernel_matches_jnp(sid, scale, shift):
    scene = rt.build_scene(sid, 64, 64)
    rng = np.random.default_rng(7)
    n = TK.TILE  # one tile keeps interpret mode fast
    o, d = _rand_rays(rng, n, scale, shift)
    tm = jnp.zeros((n,), jnp.float32)
    vu = jnp.asarray(rng.uniform(0.05, 0.95,
                                 (max(scene.n_vol, 1), n)), jnp.float32)

    h_ref = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
    sh_ref = gather_shade(scene, h_ref.prim_idx, h_ref.prim_idx >= 0)
    with pltpu.force_tpu_interpret_mode():
        h_k, sh_k = TK.trace_pallas(scene, o, d, 1e-6, 1e27, tm, vu)
        occ_k = TK.occluded_pallas(scene, o, d, 1e-4, 1e4, tm, vu)
    occ_ref = occluded(scene, o, d, 1e-4, 1e4, tm, vu)

    np.testing.assert_array_equal(np.asarray(h_ref.prim_idx),
                                  np.asarray(h_k.prim_idx))
    hit = np.asarray(h_ref.prim_idx) >= 0
    # rtol 2e-4: grazing hits amplify FMA-contraction differences between
    # the two compilations through the quadratic's catastrophic cancellation
    np.testing.assert_allclose(np.asarray(h_ref.t)[hit],
                               np.asarray(h_k.t)[hit], rtol=2e-4)
    for a, b in [(h_ref.point, h_k.point), (h_ref.normal, h_k.normal)]:
        np.testing.assert_allclose(np.asarray(a.stack())[hit],
                                   np.asarray(b.stack())[hit],
                                   rtol=1e-4, atol=1e-4)
    # uv: kernel uses a polynomial atan2 (~1e-4 rad)
    np.testing.assert_allclose(np.asarray(h_ref.u)[hit],
                               np.asarray(h_k.u)[hit], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_k))
    # shading record of the winner
    np.testing.assert_array_equal(
        np.asarray(sh_ref.mat_type)[hit], np.asarray(sh_k.mat_type)[hit])
    np.testing.assert_allclose(
        np.asarray(sh_ref.rgb.stack())[hit],
        np.asarray(sh_k.rgb.stack())[hit], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_ref.fuzz)[hit],
                               np.asarray(sh_k.fuzz)[hit], atol=1e-6)


def _volume_light_scene():
    """Synthetic Cornell-like scene: lambertian walls + area light + both
    volume kinds, so the fused kernel's shadow sweep exercises the occ_u
    row offset (no reference scene combines NEE lights with volumes at a
    size interpret mode can afford — TNW-final has 4k prims)."""
    from rtw_tpu.models.builder import SceneBuilder
    import rtw_tpu.models.scene as S

    b = SceneBuilder()
    white = b.lambertian(b.constant_texture((0.73, 0.73, 0.73)))
    ltex = b.constant_texture((15.0, 15.0, 15.0))
    light = b.diffuse_light(ltex)
    b.rect(0, 555, 0, 555, 0.0, False, S.AXIS_Y, white)      # floor
    b.rect(0, 555, 0, 555, 555.0, True, S.AXIS_Y, white)     # ceiling
    b.rect(0, 555, 0, 555, 555.0, True, S.AXIS_Z, white)     # back
    b.rect(213, 343, 227, 332, 554.0, True, S.AXIS_Y, light)
    b.add_light(position=(213.0, 554.0, 227.0),
                vec_u=(130.0, 0.0, 0.0), vec_v=(0.0, 0.0, 105.0),
                emission=(15.0, 15.0, 15.0), tex=ltex)
    iso = b.isotropic(b.constant_texture((1.0, 1.0, 1.0)))
    b.volume_box((100, 50, 100), (250, 200, 250), 0.01, iso)
    b.volume_sphere((400, 120, 300), 80.0, 0.01, iso)
    b.set_camera(lookfrom=(278, 278, -800), lookat=(278, 278, 0),
                 vup=(0, 1, 0), vfov=40.0, aspect=1.0, aperture=0.0,
                 focus_dist=10.0)
    return b.build()


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("case", ["cornell", "volume_light"])
def test_fused_trace_nee_matches_split(case):
    """Fused trace+NEE kernel == trace_pallas + the integrator's explicit
    light-sample/occlusion construction, on every output."""
    from rtw_tpu.ops import sampling as sm
    from rtw_tpu.ops import vec as V

    if case == "cornell":
        scene = rt.build_scene(0, 64, 64)
        scale, shift = 600.0, (278.0, 278.0, -400.0)
    else:
        scene = _volume_light_scene()
        scale, shift = 600.0, (278.0, 278.0, -400.0)
    assert scene.num_lights == 1
    rng = np.random.default_rng(11)
    n = TK.TILE
    o, d = _rand_rays(rng, n, scale, shift)
    tm = jnp.zeros((n,), jnp.float32)
    nv = max(scene.n_vol, 1)
    vu = jnp.asarray(rng.uniform(0.05, 0.95, (nv, n)), jnp.float32)
    ou = jnp.asarray(rng.uniform(0.05, 0.95, (nv, n)), jnp.float32)
    la = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
    lb = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
    shadow_eps = 1e-3

    with pltpu.force_tpu_interpret_mode():
        h_k, sh_k, shadowed_k = TK.trace_nee_pallas(
            scene, o, d, 1e-6, 1e27, tm, vu, ou, la, lb, shadow_eps)

    # reference: split path + the same NEE shadow-ray construction
    h_ref = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
    sh_ref = gather_shade(scene, h_ref.prim_idx, h_ref.prim_idx >= 0)
    np.testing.assert_array_equal(np.asarray(h_ref.prim_idx),
                                  np.asarray(h_k.prim_idx))
    hit = np.asarray(h_ref.prim_idx) >= 0
    np.testing.assert_array_equal(
        np.asarray(sh_ref.mat_type)[hit], np.asarray(sh_k.mat_type)[hit])

    import rtw_tpu.models.scene as S
    lights = scene.lights
    lpos = (V.gather_rows(lights.position, jnp.zeros_like(h_ref.prim_idx))
            + V.gather_rows(lights.vec_u, jnp.zeros_like(h_ref.prim_idx)) * la
            + V.gather_rows(lights.vec_v, jnp.zeros_like(h_ref.prim_idx)) * lb)
    # use the KERNEL's hit record so fp differences in point/normal don't
    # shift the comparison (the integrator also consumes the kernel's record)
    ldir = lpos - h_k.point
    ldist = ldir.length()
    ldir_u = ldir * (1.0 / jnp.maximum(ldist, 1e-12))
    sorg = sm.offset_point(h_k.point, h_k.normal, ldir_u)
    occ_ref = occluded(scene, sorg, ldir_u, shadow_eps,
                       ldist * np.float32(0.999), tm, ou)
    want = hit & (np.asarray(sh_k.mat_type) == S.MAT_LAMBERTIAN)
    np.testing.assert_array_equal(np.asarray(occ_ref)[want],
                                  np.asarray(shadowed_k)[want])
    assert not np.asarray(shadowed_k)[~want].any()


def _many_prim_scene():
    """Synthetic large scene: >= 3 blocks each of spheres, boxes and rects so
    the kernels' dynamic front-to-back traversal (_dyn_nearest/_dyn_occl) is
    exercised, not just the static unrolled path."""
    from rtw_tpu.models.builder import SceneBuilder
    import rtw_tpu.models.scene as S

    b = SceneBuilder()
    rng = np.random.default_rng(3)
    mat = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
    for _ in range(200):
        c = rng.uniform(-100, 100, 3)
        b.sphere(c, rng.uniform(1.0, 6.0), mat)
    for _ in range(200):
        lo = rng.uniform(-100, 100, 3)
        b.box(lo, lo + rng.uniform(2.0, 10.0, 3), mat)
    for _ in range(200):
        a0, b0 = rng.uniform(-100, 90, 2)
        b.rect(a0, a0 + 10, b0, b0 + 10, rng.uniform(-100, 100), False,
               S.AXIS_Y, mat)
    b.set_camera(lookfrom=(0, 0, -300), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov=40.0, aspect=1.0, aperture=0.0, focus_dist=10.0)
    return b.build()


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_kernel_dynamic_traversal_matches_jnp():
    scene = _many_prim_scene()
    # the plan must actually contain dynamic groups or this test is vacuous
    assert any(TK._is_dynamic(e) for e in scene.chunk_plan)
    rng = np.random.default_rng(9)
    n = TK.TILE
    o, d = _rand_rays(rng, n, 120.0, (0.0, 0.0, 0.0))
    tm = jnp.zeros((n,), jnp.float32)
    vu = jnp.full((1, n), 0.5, jnp.float32)

    h_ref = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
    with pltpu.force_tpu_interpret_mode():
        h_k, sh_k = TK.trace_pallas(scene, o, d, 1e-6, 1e27, tm, vu)
        occ_k = TK.occluded_pallas(scene, o, d, 1e-4, 1e4, tm, vu)
    occ_ref = occluded(scene, o, d, 1e-4, 1e4, tm, vu)

    np.testing.assert_array_equal(np.asarray(h_ref.prim_idx),
                                  np.asarray(h_k.prim_idx))
    hit = np.asarray(h_ref.prim_idx) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(np.asarray(h_ref.t)[hit],
                               np.asarray(h_k.t)[hit], rtol=2e-4)
    for a, b in [(h_ref.point, h_k.point), (h_ref.normal, h_k.normal)]:
        np.testing.assert_allclose(np.asarray(a.stack())[hit],
                                   np.asarray(b.stack())[hit],
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_k))
