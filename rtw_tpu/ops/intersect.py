"""Vectorized scene intersection — the TPU replacement for OptiX traversal.

The reference leans on hardware BVH traversal (`optixTraverse`) dispatching
into 7 intersection programs (RestOfLife/geometry/*.cu, shaders/aarect*.cu).
Here a ray wavefront is tested against the scene as dense [rays x prim-chunk]
blocks on the VPU:

- Primitives are grouped at build time by (prim_type, rect_axis,
  has_transform) into *statically typed chunks* (see models/builder.py), so
  each chunk runs exactly one specialized test — no per-lane dispatch, no
  divergence, perfect lockstep.
- Each chunk yields a [N, C] t-matrix; a running (t, prim) argmin is merged
  chunk by chunk, and the chunk winner's hit payload (point/normal/uv) is
  computed once per ray from the statically known type — the analog of the
  8-attribute-register contract between IS programs and __closesthit__
  (sphere.cu:74-90).
- Volume (participating-media) primitives consume one pre-drawn free-flight
  uniform per (ray, volume slot) per trace — keyed RNG instead of the
  reference's mutable seed (volumeBox.cu:79-80), so results are independent
  of evaluation order.  Unlike the reference (SURVEY §7.4 quirk 5) the
  sampled distance is *rejected* when it exceeds the distance inside the
  boundary, per the book.

For small scenes (Cornell: 13 prims) this brute-force sweep IS the optimal
TPU program — one fused elementwise block + min-reduce, no memory traffic
beyond the rays themselves.  Large scenes use the same chunk machinery over
BVH-selected candidate lists (ops/bvh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from rtw_tpu.models import scene as S
from rtw_tpu.ops.sampling import dot, normalize, safe_sqrt

BIG = np.float32(1e30)


@dataclasses.dataclass
class Hit:
    """Per-ray nearest-hit record (HitRecord + instance/material resolution,
    lib/raydata.cuh:80-95 + closehit.cu:50-63)."""

    t: Any          # [N] float32; >= BIG/2 means miss
    prim_idx: Any   # [N] int32; -1 = miss
    mat_id: Any     # [N] int32
    point: Any      # [N, 3] world-space hit point
    normal: Any     # [N, 3] world-space geometric/shading normal (unit)
    uv: Any         # [N, 2]


jax.tree_util.register_pytree_node(
    Hit,
    lambda h: ((h.t, h.prim_idx, h.mat_id, h.point, h.normal, h.uv), None),
    lambda _, l: Hit(*l),
)


# ---------------------------------------------------------------------------
# Per-type t tests.  All operate on o, d of shape [N, 3] against chunk params
# [C, ...] and return t [N, C] with BIG where there is no hit in (tmin, tmax).
# tmin scalar, tmax [N] or scalar.
# ---------------------------------------------------------------------------

def _in_range(t, tmin, tmax):
    if np.ndim(tmax := jnp.asarray(tmax)) == 1:
        tmax = tmax[:, None]
    return (t > tmin) & (t < tmax)


def _sphere_roots(o, d, center, radius):
    """Quadratic roots vs spheres. o,d: [N,3] or [N,C,3]; center [C,3] or
    [N,C,3]; radius [C]. Returns (t1, t2, valid) each [N, C]."""
    if o.ndim == 2:
        oc = o[:, None, :] - center if center.ndim == 2 else o[:, None, :] - center
        dd = d[:, None, :]
    else:
        oc = o - center
        dd = d
    a = dot(dd, dd)
    b = jnp.einsum("ncj,ncj->nc", oc, jnp.broadcast_to(dd, oc.shape))
    c = dot(oc, oc) - radius * radius
    disc = b * b - a * c
    valid = disc >= 0.0
    sq = safe_sqrt(disc)
    inv_a = 1.0 / a
    return (-b - sq) * inv_a, (-b + sq) * inv_a, valid


def sphere_t(params, o, d, tmin, tmax):
    center = params[:, 0:3]
    radius = params[:, 3]
    t1, t2, valid = _sphere_roots(o, d, center, radius)
    t = jnp.where(_in_range(t1, tmin, tmax), t1,
                  jnp.where(_in_range(t2, tmin, tmax), t2, BIG))
    return jnp.where(valid, t, BIG)


def moving_sphere_t(params, o, d, tmin, tmax, time):
    """Center lerped by per-ray gather time (movingSphere.cu:33-39,66)."""
    c0 = params[:, 0:3]
    radius = params[:, 3]
    c1 = params[:, 4:7]
    t0 = params[:, 7]
    t1p = params[:, 8]
    span = t1p - t0
    frac = jnp.where(span == 0.0, 0.0, (time[:, None] - t0[None, :]) / jnp.where(span == 0.0, 1.0, span)[None, :])
    center = c0[None, :, :] + frac[:, :, None] * (c1 - c0)[None, :, :]
    r1, r2, valid = _sphere_roots(o, d, center, radius)
    t = jnp.where(_in_range(r1, tmin, tmax), r1,
                  jnp.where(_in_range(r2, tmin, tmax), r2, BIG))
    return jnp.where(valid, t, BIG)


_AXIS_OTHERS = {S.AXIS_X: (1, 2), S.AXIS_Y: (0, 2), S.AXIS_Z: (0, 1)}


def rect_t(params, o, d, tmin, tmax, axis: int):
    """Axis-aligned rect plane-slab test (shaders/aarect{x,y,z}.cu)."""
    a0, a1, b0, b1, k = (params[:, i] for i in range(5))
    ia, ib = _AXIS_OTHERS[axis]
    if o.ndim == 2:
        o_ = o[:, None, :]
        d_ = jnp.broadcast_to(d[:, None, :], (o.shape[0], params.shape[0], 3))
    else:
        o_, d_ = o, d
    dk = d_[..., axis]
    t = (k - o_[..., axis]) / jnp.where(dk == 0.0, 1e-30, dk)
    pa = o_[..., ia] + t * d_[..., ia]
    pb = o_[..., ib] + t * d_[..., ib]
    inside = (pa >= a0) & (pa <= a1) & (pb >= b0) & (pb <= b1)
    return jnp.where(inside & _in_range(t, tmin, tmax), t, BIG)


def _box_roots(o, d, bmin, bmax):
    """Slab test. Returns (near, far) [N, C] over full real line."""
    if o.ndim == 2:
        o_ = o[:, None, :]
        d_ = d[:, None, :]
    else:
        o_, d_ = o, d
    inv = 1.0 / jnp.where(d_ == 0.0, 1e-30, d_)
    t0 = (bmin - o_) * inv
    t1 = (bmax - o_) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return near, far


def _volume_t(near, far, valid, density, u, tmin, tmax, d_len):
    """Free-flight sampling inside a boundary (volumeBox.cu:55-113 with the
    book-correct rejection: a sample beyond the far boundary misses)."""
    if np.ndim(tmax := jnp.asarray(tmax)) == 1:
        tmax = tmax[:, None]
    h1 = jnp.maximum(near, tmin)
    h2 = jnp.minimum(far, tmax)
    h1 = jnp.maximum(h1, 0.0)
    ok = valid & (h1 < h2)
    dist_inside = (h2 - h1) * d_len
    flight = -(1.0 / density) * jnp.log(jnp.maximum(u, 1e-30))
    ok = ok & (flight <= dist_inside)
    t = h1 + flight / d_len
    return jnp.where(ok, t, BIG)


def volume_sphere_t(params, o, d, tmin, tmax, u):
    center = params[:, 0:3]
    radius = params[:, 3]
    density = params[:, 4]
    t1, t2, valid = _sphere_roots(o, d, center, radius)
    d_len = jnp.sqrt(jnp.maximum(dot(d, d), 1e-30))
    if d_len.ndim == 1:
        d_len = d_len[:, None]
    return _volume_t(t1, t2, valid, density, u, tmin, tmax, d_len)


def volume_box_t(params, o, d, tmin, tmax, u):
    bmin = params[:, 0:3]
    bmax = params[:, 3:6]
    density = params[:, 6]
    near, far = _box_roots(o, d, bmin, bmax)
    d_len = jnp.sqrt(jnp.maximum(dot(d, d), 1e-30))
    if d_len.ndim == 1:
        d_len = d_len[:, None]
    return _volume_t(near, far, near <= far, density, u, tmin, tmax, d_len)


# ---------------------------------------------------------------------------
# Payload (hit point / normal / uv) for the chunk winner — statically typed.
# ---------------------------------------------------------------------------

def _sphere_uv(n):
    """Spherical uv from unit normal (sphere.cu:24-32).

    Detached from AD: arctan2/arcsin have pole singularities whose backward
    inf/NaN would poison whole-wavefront gradients.  Texture-*coordinate*
    gradients are out of the differentiability scope (diff.py docstring);
    hit-point-driven texture gradients (noise) still flow via `p`."""
    n = jax.lax.stop_gradient(n)
    phi = jnp.arctan2(n[..., 2], n[..., 0])
    theta = jnp.arcsin(jnp.clip(n[..., 1], -1.0, 1.0))
    u = 1.0 - (phi + np.pi) / (2.0 * np.pi)
    v = (theta + np.pi / 2.0) / np.pi
    return jnp.stack([u, v], axis=-1)


def _payload(ptype: int, axis: int, params, o, d, t, time):
    """Object-space hit payload for one gathered prim per ray.
    params [N, 9]; o, d [N, 3]; t [N]. Returns (point, normal, uv)."""
    point = o + t[:, None] * d
    if ptype == S.PRIM_SPHERE:
        normal = (point - params[:, 0:3]) / params[:, 3:4]
        return point, normal, _sphere_uv(normal)
    if ptype == S.PRIM_MOVING_SPHERE:
        c0 = params[:, 0:3]
        c1 = params[:, 4:7]
        t0 = params[:, 7]
        t1p = params[:, 8]
        span = t1p - t0
        frac = jnp.where(span == 0.0, 0.0, (time - t0) / jnp.where(span == 0.0, 1.0, span))
        center = c0 + frac[:, None] * (c1 - c0)
        normal = (point - center) / params[:, 3:4]
        return point, normal, _sphere_uv(normal)
    if ptype == S.PRIM_RECT:
        ia, ib = _AXIS_OTHERS[axis]
        a0, a1, b0, b1 = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
        flip = params[:, 6]
        base = np.zeros(3, np.float32)
        base[axis] = 1.0
        normal = jnp.where(flip[:, None] > 0.5, -jnp.asarray(base), jnp.asarray(base))
        normal = jnp.broadcast_to(normal, point.shape)
        u = (point[:, ia] - a0) / jnp.maximum(a1 - a0, 1e-20)
        v = (point[:, ib] - b0) / jnp.maximum(b1 - b0, 1e-20)
        return point, normal, jnp.stack([u, v], axis=-1)
    # volumes: constant +X normal, zero uv (volumeBox.cu:88-94)
    normal = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), point.shape)
    return point, normal, jnp.zeros((point.shape[0], 2), jnp.float32)


# ---------------------------------------------------------------------------
# Chunked scene sweep
# ---------------------------------------------------------------------------

def _xform_point(m, p):
    """Apply [*, 3, 4] affine to [*, 3] points."""
    return jnp.einsum("...ij,...j->...i", m[..., :3], p) + m[..., 3]


def _xform_vec(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3], v)


def _block_t(ptype, axis, has_xform, params, w2o, slots, o, d, tmin, tmax,
             time, vol_u, valid):
    """t-matrix [N, C] for one block of C same-typed primitives.

    params [C, 9]; w2o [C, 3, 4]; slots [C]; valid [C] (pad mask).
    """
    if has_xform:
        # object-space rays per prim: [N, C, 3]
        o_obj = jnp.einsum("cij,nj->nci", w2o[:, :, :3], o) + w2o[None, :, :, 3]
        d_obj = jnp.einsum("cij,nj->nci", w2o[:, :, :3], d)
    else:
        o_obj, d_obj = o, d

    if ptype == S.PRIM_SPHERE:
        t = sphere_t(params, o_obj, d_obj, tmin, tmax)
    elif ptype == S.PRIM_MOVING_SPHERE:
        t = moving_sphere_t(params, o_obj, d_obj, tmin, tmax, time)
    elif ptype == S.PRIM_RECT:
        t = rect_t(params, o_obj, d_obj, tmin, tmax, axis)
    elif ptype in (S.PRIM_VOLUME_SPHERE, S.PRIM_VOLUME_BOX):
        u = vol_u[:, jnp.maximum(slots, 0)]  # [N, C]
        fn = volume_sphere_t if ptype == S.PRIM_VOLUME_SPHERE else volume_box_t
        t = fn(params, o_obj, d_obj, tmin, tmax, u)
    else:  # pragma: no cover
        raise ValueError(f"unknown prim type {ptype}")

    return jnp.where(valid[None, :], t, BIG)


def _group_scan(scene, entry, o, d, tmin, tmax, time, vol_u, reduce_fn, init):
    """Run one typed group through `reduce_fn(carry, block)` where block =
    (t_mat [N, C], base_index).  Large groups scan over fixed-size blocks so
    the traced graph stays O(#groups), not O(#prims) — essential because this
    host's XLA compile is slow and TNW-final has ~3.4k primitives."""
    start, count, size, ptype, axis, has_xform, block = entry
    prims = scene.prims
    params = prims.params[start:start + size]
    w2o = prims.w2o[start:start + size]
    slots = prims.vol_slot[start:start + size]
    valid = jnp.asarray(np.arange(size) < count)

    n_blocks = size // block
    if n_blocks == 1:
        t_mat = _block_t(ptype, axis, has_xform, params, w2o, slots,
                         o, d, tmin, tmax, time, vol_u, valid)
        return reduce_fn(init, t_mat, jnp.asarray(start, jnp.int32))

    def body(carry, xs):
        p, m, sl, va, base = xs
        t_mat = _block_t(ptype, axis, has_xform, p, m, sl,
                         o, d, tmin, tmax, time, vol_u, va)
        return reduce_fn(carry, t_mat, base), None

    xs = (
        params.reshape(n_blocks, block, -1),
        w2o.reshape(n_blocks, block, 3, 4),
        slots.reshape(n_blocks, block),
        valid.reshape(n_blocks, block),
        jnp.asarray(start + np.arange(n_blocks) * block, jnp.int32),
    )
    carry, _ = jax.lax.scan(body, init, xs)
    return carry


def intersect_scene(scene, o, d, tmin, tmax, time, vol_u) -> Hit:
    """Nearest hit of each ray against every primitive.

    o, d: [N, 3] (d need not be unit — t is in units of |d|, as in the
    reference where camera rays are unnormalized, raygen.cu:107-120).
    time: [N] gather times for motion blur.  vol_u: [N, max(n_vol,1)]
    pre-drawn free-flight uniforms.
    """
    n = o.shape[0]
    best_t = jnp.full((n,), BIG, jnp.float32)
    best_prim = jnp.full((n,), -1, jnp.int32)

    # pass 1: (t, prim) argmin over every typed group
    def min_reduce(carry, t_mat, base):
        bt, bp = carry
        c_arg = jnp.argmin(t_mat, axis=1)
        c_t = jnp.take_along_axis(t_mat, c_arg[:, None], axis=1)[:, 0]
        gidx = base + c_arg.astype(jnp.int32)
        better = c_t < bt
        return (jnp.where(better, c_t, bt), jnp.where(better, gidx, bp))

    for entry in scene.chunk_plan:
        best_t, best_prim = _group_scan(scene, entry, o, d, tmin, tmax, time,
                                        vol_u, min_reduce, (best_t, best_prim))

    prims = scene.prims
    hit_mask = best_prim >= 0
    safe_prim = jnp.maximum(best_prim, 0)
    # payload t clamped to 0 on miss lanes: a BIG t would produce ~1e30 hit
    # points whose squared distances overflow to inf downstream — masked in
    # the primal but 0*inf = NaN in reverse-mode
    t_pay = jnp.where(hit_mask, best_t, 0.0)

    # pass 2: payload for the global winner — one statically-typed payload
    # computation per group, selected by which group owns the winning prim.
    point = jnp.zeros((n, 3), jnp.float32)
    normal = jnp.zeros((n, 3), jnp.float32)
    uv = jnp.zeros((n, 2), jnp.float32)
    for entry in scene.chunk_plan:
        start, count, size, ptype, axis, has_xform, _ = entry
        in_group = hit_mask & (safe_prim >= start) & (safe_prim < start + size)
        p_params = prims.params[safe_prim]
        if has_xform:
            w2o = prims.w2o[safe_prim]
            o2w = prims.o2w[safe_prim]
            o_sel = _xform_point(w2o, o)
            d_sel = _xform_vec(w2o, d)
        else:
            o_sel, d_sel = o, d
        g_point, g_normal, g_uv = _payload(ptype, axis, p_params, o_sel,
                                           d_sel, t_pay, time)
        if has_xform:
            g_point = _xform_point(o2w, g_point)
            # normal transforms with (W2O)^T
            g_normal = jnp.einsum("nji,nj->ni", w2o[:, :, :3], g_normal)
        point = jnp.where(in_group[:, None], g_point, point)
        normal = jnp.where(in_group[:, None], g_normal, normal)
        uv = jnp.where(in_group[:, None], g_uv, uv)

    normal = normalize(normal)
    mat_id = jnp.where(hit_mask, prims.material_id[safe_prim], 0)
    return Hit(t=best_t, prim_idx=best_prim, mat_id=mat_id,
               point=point, normal=normal, uv=uv)


def occluded(scene, o, d, tmin, tmax, time, vol_u):
    """Boolean shadow query: any hit in (tmin, tmax)?  The analog of
    traceOcclusion's TERMINATE_ON_FIRST_HIT probe (closehit.cu:16-42), with
    volumes participating stochastically exactly as in the reference (their
    IS programs run for shadow rays too)."""
    n = o.shape[0]

    def any_reduce(occ, t_mat, base):
        return occ | jnp.any(t_mat < BIG, axis=1)

    occ = jnp.zeros((n,), bool)
    for entry in scene.chunk_plan:
        occ = _group_scan(scene, entry, o, d, tmin, tmax, time, vol_u,
                          any_reduce, occ)
    return occ
