"""Primitive-intersection unit tests against closed-form cases (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from types import SimpleNamespace

from rtw_tpu.models import scene as S
from rtw_tpu.models.builder import SceneBuilder, translate, rotate_y
from rtw_tpu.ops.intersect import intersect_scene, occluded as _occluded, BIG
from rtw_tpu.ops.vec import v3


def occluded(scene, o, d, tmin, tmax, time, vol_u):
    """[N,3]-array adapter over the SoA occlusion sweep."""
    return _occluded(scene, v3(jnp.asarray(o, jnp.float32)),
                     v3(jnp.asarray(d, jnp.float32)), tmin, tmax, time,
                     jnp.asarray(vol_u, jnp.float32).T)


def _trace(scene, o, d, time=None, vol_u=None, tmax=1e30):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    n = o.shape[0]
    if time is None:
        time = jnp.zeros((n,), jnp.float32)
    if vol_u is None:
        vol_u = jnp.full((n, max(scene.n_vol, 1)), 0.5, jnp.float32)
    h = intersect_scene(scene, v3(o), v3(d), 1e-6, tmax, time,
                        jnp.asarray(vol_u).T)
    # [N,3]-array view for assertion convenience
    return SimpleNamespace(t=h.t, prim_idx=h.prim_idx, mat_id=h.mat_id,
                           point=h.point.stack(), normal=h.normal.stack(),
                           uv=jnp.stack([h.u, h.v], axis=-1))


def _one_prim_scene(add_fn):
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
    add_fn(b, m)
    b.set_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60, 1.0, 0.0, 1.0)
    return b.build()


def test_sphere_hit_normal_uv():
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 0, -2), 1.0, m))
    h = _trace(sc, [[0, 0, 0]], [[0, 0, -1]])
    assert float(h.t[0]) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.point[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    # front pole: phi = atan2(1, 0) = pi/2 -> u = 1 - (pi/2+pi)/(2pi) = 0.25
    assert float(h.uv[0, 0]) == pytest.approx(0.25, abs=1e-5)
    assert float(h.uv[0, 1]) == pytest.approx(0.5, abs=1e-5)


def test_sphere_inside_hit():
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 0, 0), 2.0, m))
    h = _trace(sc, [[0, 0, 0]], [[1, 0, 0]])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [1, 0, 0], atol=1e-5)


def test_sphere_miss():
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 3, -2), 1.0, m))
    h = _trace(sc, [[0, 0, 0]], [[0, 0, -1]])
    assert int(h.prim_idx[0]) == -1
    assert float(h.t[0]) >= BIG / 2


def test_unnormalized_direction_t_scaling():
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 0, -2), 1.0, m))
    h = _trace(sc, [[0, 0, 0]], [[0, 0, -4]])
    assert float(h.t[0]) == pytest.approx(0.25, abs=1e-6)
    np.testing.assert_allclose(np.asarray(h.point[0]), [0, 0, -1], atol=1e-5)


@pytest.mark.parametrize("axis,flip,exp_n", [
    (S.AXIS_X, False, [1, 0, 0]), (S.AXIS_X, True, [-1, 0, 0]),
    (S.AXIS_Y, False, [0, 1, 0]), (S.AXIS_Y, True, [0, -1, 0]),
    (S.AXIS_Z, False, [0, 0, 1]), (S.AXIS_Z, True, [0, 0, -1]),
])
def test_rect_normals(axis, flip, exp_n):
    sc = _one_prim_scene(lambda b, m: b.rect(-1, 1, -1, 1, 0.0, flip, axis, m))
    o = np.zeros(3); o[axis] = 2.0
    d = np.zeros(3); d[axis] = -1.0
    h = _trace(sc, [o], [d])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), exp_n, atol=1e-5)


def test_rect_uv_and_bounds():
    sc = _one_prim_scene(lambda b, m: b.rect(0, 4, 0, 2, -1.0, False, S.AXIS_Z, m))
    h = _trace(sc, [[1.0, 0.5, 5.0]], [[0, 0, -1]])
    assert float(h.t[0]) == pytest.approx(6.0, abs=1e-5)
    assert float(h.uv[0, 0]) == pytest.approx(0.25, abs=1e-5)
    assert float(h.uv[0, 1]) == pytest.approx(0.25, abs=1e-5)
    # outside bounds -> miss
    h = _trace(sc, [[5.0, 0.5, 5.0]], [[0, 0, -1]])
    assert int(h.prim_idx[0]) == -1


def test_moving_sphere_lerp():
    sc = _one_prim_scene(
        lambda b, m: b.moving_sphere((0, 0, -2), (2, 0, -2), 1.0, 0.0, 1.0, m))
    h0 = _trace(sc, [[0, 0, 0]], [[0, 0, -1]], time=jnp.asarray([0.0]))
    assert float(h0.t[0]) == pytest.approx(1.0, abs=1e-5)
    h1 = _trace(sc, [[0, 0, 0]], [[0, 0, -1]], time=jnp.asarray([1.0]))
    assert int(h1.prim_idx[0]) == -1          # sphere moved to x=2
    h1b = _trace(sc, [[2, 0, 0]], [[0, 0, -1]], time=jnp.asarray([1.0]))
    assert float(h1b.t[0]) == pytest.approx(1.0, abs=1e-5)


def test_transformed_rect():
    # rect in xz plane rotated 90deg about Y: plane x=0 spanned in z/y...
    # simpler: rect at z=0 spanning x,y in [-1,1], rotated 90 about Y -> plane x=0
    xf = rotate_y(90.0)
    sc = _one_prim_scene(
        lambda b, m: b.rect(-1, 1, -1, 1, 0.0, False, S.AXIS_Z, m, transform=xf))
    h = _trace(sc, [[3, 0, 0]], [[-1, 0, 0]])
    assert float(h.t[0]) == pytest.approx(3.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [1, 0, 0], atol=1e-5)


def test_transformed_sphere_prebake():
    # rigid transforms on spheres must be folded into centers
    xf = translate((5.0, 0.0, 0.0)) @ rotate_y(33.0)
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 0, 0), 1.0, m, transform=xf))
    assert sc.chunk_plan[0][5] is False  # no runtime transform
    h = _trace(sc, [[5, 0, 5]], [[0, 0, -1]])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)


def test_volume_sphere_free_flight():
    density = 0.5
    sc = _one_prim_scene(lambda b, m2: b.volume_sphere((0, 0, 0), 1.0, density,
                                                       m2))
    # u -> flight = -ln(u)/rho; chord through center has length 2
    # u = exp(-rho * 1.0) -> flight = 1.0 -> t = entry(1.0) + 1.0 = 2.0
    u = float(np.exp(-density * 1.0))
    h = _trace(sc, [[0, 0, 2]], [[0, 0, -1]],
               vol_u=jnp.asarray([[u]], jnp.float32))
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-4)
    # flight beyond chord -> rejected (book-correct; SURVEY quirk 5)
    u = float(np.exp(-density * 2.5))
    h = _trace(sc, [[0, 0, 2]], [[0, 0, -1]],
               vol_u=jnp.asarray([[u]], jnp.float32))
    assert int(h.prim_idx[0]) == -1


def test_volume_box_inside_start():
    sc = _one_prim_scene(lambda b, m: b.volume_box((-1, -1, -1), (1, 1, 1),
                                                   1.0, m))
    # start inside: boundary span = from 0 to exit at z=-1 (dist 1)
    u = float(np.exp(-0.5))
    h = _trace(sc, [[0, 0, 0]], [[0, 0, -1]],
               vol_u=jnp.asarray([[u]], jnp.float32))
    assert float(h.t[0]) == pytest.approx(0.5, abs=1e-4)


def test_occlusion():
    sc = _one_prim_scene(lambda b, m: b.sphere((0, 0, -2), 0.5, m))
    o = jnp.asarray([[0, 0, 0], [0, 2, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    occ = occluded(sc, o, d, 1e-4, jnp.asarray([10.0, 10.0]),
                   jnp.zeros((2,)), jnp.full((2, 1), 0.5))
    assert bool(occ[0]) and not bool(occ[1])
    # light closer than the blocker -> unoccluded
    occ = occluded(sc, o, d, 1e-4, jnp.asarray([1.0, 1.0]),
                   jnp.zeros((2,)), jnp.full((2, 1), 0.5))
    assert not bool(occ[0])


def test_nearest_of_many():
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
    for z in (-10, -4, -7):
        b.sphere((0, 0, z), 1.0, m)
    b.rect(-1, 1, -1, 1, -2.5, False, S.AXIS_Z, m)
    b.set_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60, 1.0, 0.0, 1.0)
    sc = b.build()
    h = _trace(sc, [[0, 0, 0]], [[0, 0, -1]])
    assert float(h.t[0]) == pytest.approx(2.5, abs=1e-5)


def test_box_prim_equals_six_rects():
    """PRIM_BOX (one slab test) must reproduce the reference's 6-AARect
    composite (ioGeometryGroup.h:27-41 createBox) on every hit field —
    including interior-origin rays (exit-face hits) and a rotated instance."""
    from rtw_tpu.ops.vec import Vec3

    def mk(use_box):
        b = SceneBuilder()
        m = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
        fn = b.box if use_box else b.box_rects
        xf = translate((265.0, 0.0, 295.0)) @ rotate_y(15.0)
        fn((0.0, 0.0, 0.0), (165.0, 330.0, 165.0), m, transform=xf)
        fn((300.0, 10.0, 300.0), (400.0, 80.0, 420.0), m)
        b.set_camera((278, 278, -800), (278, 278, 0), (0, 1, 0), 40, 1.0,
                     0.0, 10.0)
        return b.build()

    rng = np.random.default_rng(0)
    n = 4096
    o = Vec3(*(jnp.asarray(rng.uniform(-200, 700, n), jnp.float32)
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rng.normal(size=n), jnp.float32)
               for _ in range(3)))
    tm = jnp.zeros((n,))
    vu = jnp.zeros((1, n))
    ha = intersect_scene(mk(True), o, d, 1e-6, 1e9, tm, vu)
    hb = intersect_scene(mk(False), o, d, 1e-6, 1e9, tm, vu)
    hit_a = np.asarray(ha.prim_idx >= 0)
    hit_b = np.asarray(hb.prim_idx >= 0)
    np.testing.assert_array_equal(hit_a, hit_b)
    assert hit_a.sum() > 150          # interior + exterior rays both present
    for a, b in [(ha.t, hb.t), (ha.u, hb.u), (ha.v, hb.v)]:
        np.testing.assert_allclose(np.asarray(a)[hit_a],
                                   np.asarray(b)[hit_a], rtol=1e-5, atol=1e-5)
    for a, b in [(ha.point, hb.point), (ha.normal, hb.normal)]:
        np.testing.assert_allclose(np.asarray(a.stack())[hit_a],
                                   np.asarray(b.stack())[hit_a],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sid", [0, 3, 4])
def test_reeval_hit_matches_intersect_scene(sid):
    """reeval_hit (the fast gradient path's differentiable winner-payload
    re-derivation) must reproduce intersect_scene's full hit record when
    fed the sweep's own winners — transforms, boxes, volumes, moving
    spheres included."""
    import rtw_tpu as rt
    from rtw_tpu.ops.intersect import intersect_scene, reeval_hit
    from rtw_tpu.ops.vec import v3

    scene = rt.build_scene(sid, 64, 64)
    rng = np.random.default_rng(21)
    n = 4096
    scale, shift = 600.0, (278.0, 278.0, -400.0)   # Cornell/TNW framing
    o = v3(jnp.asarray(rng.uniform(-1, 1, (n, 3)) * scale + shift,
                       jnp.float32))
    d = v3(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    tm = jnp.zeros((n,), jnp.float32)
    vu = jnp.asarray(rng.uniform(0.05, 0.95, (max(scene.n_vol, 1), n)),
                     jnp.float32)

    h = intersect_scene(scene, o, d, 1e-6, 1e27, tm, vu)
    h2 = reeval_hit(scene, h.prim_idx, o, d, 1e-6, 1e27, tm, vu,
                    t_hint=h.t)
    hit = np.asarray(h.prim_idx) >= 0
    assert hit.sum() > 200
    np.testing.assert_array_equal(np.asarray(h2.prim_idx),
                                  np.asarray(h.prim_idx))
    np.testing.assert_array_equal(np.asarray(h2.mat_id), np.asarray(h.mat_id))
    np.testing.assert_allclose(np.asarray(h2.t)[hit], np.asarray(h.t)[hit],
                               rtol=1e-5)
    # atol 5e-3: scene scales reach ~1000s of units, and a grazing hit's
    # elementwise-recomputed t (same math, different association) can move
    # the point by |t_diff|*|d| — observed max 0.0026 on one TNW lane
    for a, b in [(h.point, h2.point), (h.normal, h2.normal)]:
        np.testing.assert_allclose(np.asarray(b.stack())[hit],
                                   np.asarray(a.stack())[hit],
                                   rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(h2.u)[hit], np.asarray(h.u)[hit],
                               atol=1e-3)
