"""Whole-bounce Pallas megakernel — the VMEM-resident wavefront step.

The pure-XLA small-scene path (Cornell tier) is HBM-bandwidth-bound: xprof
shows each wavefront iteration streaming the ~35-plane carry through ~50
separate elementwise fusion kernels (trace sweep + shading + NEE + RR +
regeneration), ~4 ms/iteration at 640k lanes on one chip.  This kernel
executes the ENTIRE regenerating-wavefront iteration (trace, shade, NEE
occlusion, Russian roulette, sample accumulation, ray regeneration — the
whole body of integrator.trace_wavefront_regen) in one Pallas launch per
bounce: a ray tile's state lives in VMEM registers end-to-end, and HBM
traffic collapses to one read + one write of the carry per iteration.

This is the TPU's version of an OptiX megakernel (raygen.cu:28-159 +
closehit + callables as one scheduled program), with the wavefront
regeneration the hardware scheduler would otherwise provide.

Scope (statically gated in integrator._mega_backend): non-differentiable
renders, cfg.rng == "fast" (pcg_hash is pure u32 VPU math; replicated
bit-exactly in-kernel), <= 1 light, scenes without noise/image textures
(their atlas gathers have no in-kernel analog) — the Cornell / volumes /
three-sphere tier.  The pure-JAX path remains the reference
implementation; tests assert statistical equivalence (TPU transcendental
approximations make sin/cos differ ~1e-6 from XLA, so per-path bitwise
parity is not defined on chip; interpret mode matches tightly).

Reference capability: the full device program set of the reference
(raygen/miss/closehit/material/pdf callables, RestOfLife/*.cu) fused into
one TPU kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtw_tpu.models import scene as S
from rtw_tpu.ops import bounce as BC
from rtw_tpu.ops import sampling as sm
from rtw_tpu.ops import vec as V
from rtw_tpu.ops.vec import Vec3
from rtw_tpu.ops import trace_kernel as _tk
from rtw_tpu.ops.trace_kernel import (
    BIG, TILE, _MAT, _FUZZ, _ETA, _TEXT, _RGB, _ODD, _EVEN,
    _make_ctx, _max_dyn_blocks, _nearest_hit, _occl_sweep, augment_aabbs,
    build_props)
from rtw_tpu.utils import rng as R

# --- carry layout ----------------------------------------------------------
# f32 rows
F_ORG = 0        # 3: ray origin
F_DIR = 3        # 3: ray direction
F_THR = 6        # 3: throughput
F_RAD = 9        # 3: path radiance
F_ACC = 12       # 3: per-lane accumulated (finished-sample) radiance
F_TIME = 15      # shutter time
F_PPDF = 16      # previous-bounce bsdf pdf (MIS carry)
NF = 17
# i32 rows
I_ALIVE = 0
I_PREVD = 1      # previous bounce was diffuse (MIS carry)
I_DEPTH = 2
I_SAMPLE = 3
I_PIXEL = 4
NI = 5

# --- SMEM parameter layout -------------------------------------------------
# f32 row [1, PF]: camera frustum + light row 0 + sky gate
PF_CAM_ORG = 0       # 3
PF_LL = 3            # 3 lower_left
PF_HOR = 6           # 3 horizontal
PF_VERT = 9          # 3 vertical
PF_CU = 12           # 3 camera u basis
PF_CV = 15           # 3 camera v basis
PF_LENS = 18
PF_T0 = 19
PF_T1 = 20
PF_SKY = 21
PF_LPOS = 22         # 3
PF_LU = 25           # 3
PF_LV = 28           # 3
PF_LEMIT = 31        # 3
PF_LAREA = 34
PF_LNRM = 35         # 3
PF = 40
# i32 row [1, PI]: s_end, h0 split into 16-bit halves (Mosaic has no
# SCALAR bitcast, so the u32 hash base travels as two non-negative i32s)
PI_SEND = 0
PI_H0_LO = 1
PI_H0_HI = 2
PI = 8

_GOLDEN = np.uint32(0x9E3779B9)
_CAM_OFF = np.uint32((0x0CA4 * 0x9E3779B9) & 0xFFFFFFFF)


def _u32(x):
    return x.astype(jnp.uint32)


def _to_unit_k(bits):
    """uint32 -> [0,1) float; Mosaic has no u32->f32 cast, so the 24-bit
    top goes through an i32 bitcast (values < 2^24, sign-safe)."""
    top = bits >> np.uint32(8)
    return (lax.bitcast_convert_type(top, jnp.int32).astype(jnp.float32)
            * np.float32(1.0 / (1 << 24)))


def _pcg(x):
    state = x * np.uint32(747796405) + np.uint32(2891336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) \
        * np.uint32(277803737)
    return (word >> np.uint32(22)) ^ word


def _bounce_u(pk, depth_plus_1, slot):
    """Slot draw of utils.rng.bounce_uniforms (impl="fast"), bit-exact."""
    hb = _pcg(pk + _u32(depth_plus_1) * _GOLDEN)
    return _to_unit_k(_pcg(_pcg(hb + np.uint32(slot + 1))))


def _camera_u(pk, slot):
    """Slot draw of utils.rng.camera_uniforms (impl="fast"), bit-exact."""
    hc = _pcg(pk + _CAM_OFF)
    return _to_unit_k(_pcg(_pcg(hc + np.uint32(slot + 1))))


def _cbrt_k(x):
    """cbrt for x >= 0 (Mosaic lacks the cbrt primitive)."""
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * np.float32(1.0 / 3.0))


def _unit_ball_k(u1, u2, u3):
    """sampling.unit_ball with the in-kernel cbrt."""
    return sm.sphere_surface(u1, u2) * _cbrt_k(jnp.maximum(u3, 1e-30))


def _scrub(x):
    """nan_to_num(nan=0, inf=0) without the unsupported primitive."""
    ok = (x == x) & (jnp.abs(x) < np.float32(3.0e37))
    return jnp.where(ok, x, 0.0)


def _sv(ref, base):
    """Vec3 from 3 SMEM scalars."""
    return Vec3(ref[0, base], ref[0, base + 1], ref[0, base + 2])


def _mega_body(chunk_plan, vol_slots, any_xform, n_vol, nx, ny,
               mat_present, tex_present, num_lights, mis_bsdf_weight,
               tmin, t_max, shadow_eps, rr_start, max_depth, hybrid,
               sf_ref, si_ref, props_ref, aabb_ref, parf_ref, pari_ref,
               osf_ref, osi_ref, rays_ref,
               bt_ref, bi_ref, bp_ref, nm_ref, occ_ref, vu_ref):
    n = sf_ref.shape[1]
    nv = max(n_vol, 1)
    zero = jnp.zeros((n,), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    false_n = jnp.zeros((n,), bool)

    pixel = si_ref[I_PIXEL, :]
    sample = si_ref[I_SAMPLE, :]
    depth = si_ref[I_DEPTH, :]
    alive = si_ref[I_ALIVE, :] > 0
    prev_diffuse = si_ref[I_PREVD, :] > 0
    s_end = pari_ref[0, PI_SEND]
    h0 = (pari_ref[0, PI_H0_LO].astype(jnp.uint32)
          | (pari_ref[0, PI_H0_HI].astype(jnp.uint32) << np.uint32(16)))

    org = Vec3(sf_ref[F_ORG, :], sf_ref[F_ORG + 1, :], sf_ref[F_ORG + 2, :])
    dirn = Vec3(sf_ref[F_DIR, :], sf_ref[F_DIR + 1, :], sf_ref[F_DIR + 2, :])
    thr = Vec3(sf_ref[F_THR, :], sf_ref[F_THR + 1, :], sf_ref[F_THR + 2, :])
    rad = Vec3(sf_ref[F_RAD, :], sf_ref[F_RAD + 1, :], sf_ref[F_RAD + 2, :])
    acc = Vec3(sf_ref[F_ACC, :], sf_ref[F_ACC + 1, :], sf_ref[F_ACC + 2, :])
    time = sf_ref[F_TIME, :]
    prev_pdf = sf_ref[F_PPDF, :]

    # ---- per-lane path hash (utils.rng.pixel_sample_hash, bit-exact) -----
    pk = _pcg(_pcg(h0 + _u32(sample)) + _u32(pixel))

    # ---- regeneration (trace_wavefront_regen body, fresh-path branch) ----
    # The HYBRID (queue-scheduled) variant skips this block entirely: work
    # claiming and camera-ray generation happen in the XLA flush
    # (integrator.trace_wavefront_qmega) — the kernel only advances paths.
    if not hybrid:
        regen = (~alive) & (sample < s_end)
        x_pix = (pixel % nx).astype(jnp.float32)
        y_pix = (pixel // nx).astype(jnp.float32)
        cu0 = _camera_u(pk, 0)
        cu1 = _camera_u(pk, 1)
        cu2 = _camera_u(pk, 2)
        cu3 = _camera_u(pk, 3)
        cu4 = _camera_u(pk, 4)
        s_img = (x_pix + cu0) * np.float32(1.0 / nx)
        t_img = (y_pix + cu1) * np.float32(1.0 / ny)
        cam_o = _sv(parf_ref, PF_CAM_ORG)
        rdx, rdy = sm.unit_disk(cu2, cu3)
        lens = parf_ref[0, PF_LENS]
        forg = (cam_o + _sv(parf_ref, PF_CU) * (lens * rdx)
                + _sv(parf_ref, PF_CV) * (lens * rdy))
        fdir = (_sv(parf_ref, PF_LL) + _sv(parf_ref, PF_HOR) * s_img
                + _sv(parf_ref, PF_VERT) * t_img - forg)
        ftime = parf_ref[0, PF_T0] + cu4 * (parf_ref[0, PF_T1]
                                            - parf_ref[0, PF_T0])

        org = V.where(regen, forg, org)
        dirn = V.where(regen, fdir, dirn)
        thr = V.where(regen, Vec3(ones, ones, ones), thr)
        rad = V.where(regen, Vec3(zero, zero, zero), rad)
        time = jnp.where(regen, ftime, time)
        prev_pdf = jnp.where(regen, 1.0, prev_pdf)
        prev_diffuse = prev_diffuse & ~regen   # (a bool-scalar jnp.where
        # hits an unsupported i8->i1 truncation in Mosaic)
        depth = jnp.where(regen, 0, depth)
        alive = alive | regen

    # ---- bounce uniforms (bit-exact fast-RNG slots) ----------------------
    d1 = depth + 1
    U = [_bounce_u(pk, d1, k) for k in range(R.NUM_FIXED_SLOTS + 2 * nv)]
    vol_u_rows = U[R.NUM_FIXED_SLOTS: R.NUM_FIXED_SLOTS + nv]
    occ_u_rows = U[R.NUM_FIXED_SLOTS + nv: R.NUM_FIXED_SLOTS + 2 * nv]
    for k in range(nv):
        vu_ref[k, :] = vol_u_rows[k]
        vu_ref[nv + k, :] = occ_u_rows[k]

    # ---- trace (ops/trace_kernel._nearest_hit) ---------------------------
    tmax_lane = jnp.where(alive, np.float32(t_max), np.float32(-BIG))
    ctx = _make_ctx(chunk_plan, False, props_ref, ())
    res = _nearest_hit(chunk_plan, vol_slots, any_xform, tmin,
                       org, dirn, time, tmax_lane, vu_ref, 0,
                       ctx, aabb_ref, bt_ref, bi_ref, bp_ref, nm_ref)
    best_t, best_i, bp, point, normal, uu, vv = res
    miss = best_i < 0

    # ---- shading record from the winner's props rows ---------------------
    mat_type = bp[_MAT].astype(jnp.int32)
    tex_type = bp[_TEXT].astype(jnp.int32)
    albedo = Vec3(bp[_RGB[0]], bp[_RGB[1]], bp[_RGB[2]])
    if tex_present[S.TEX_CHECKER]:
        sines = (jnp.sin(10.0 * point.x) * jnp.sin(10.0 * point.y)
                 * jnp.sin(10.0 * point.z))
        odd = Vec3(bp[_ODD[0]], bp[_ODD[1]], bp[_ODD[2]])
        even = Vec3(bp[_EVEN[0]], bp[_EVEN[1]], bp[_EVEN[2]])
        checker = V.where(sines < 0.0, odd, even)
        albedo = V.where(tex_type == S.TEX_CHECKER, checker, albedo)

    # ---- one bounce of the shared estimator core (ops/bounce.py) ---------
    # Environment accessors: SMEM light scalars, Mosaic-safe cbrt, in-kernel
    # occlusion sweep.  L == 1 always (gated by _mega_backend).
    def light_pdf_at(o_, p_, du_, pi_, m_):
        # one-sided, mirroring integrator._light_pdf_at's round-5 fix:
        # NEE never samples a light's back side, so back-side BSDF hits
        # must see pdf 0 (full BSDF weight), not the abs() pdf
        dvec = p_ - o_
        dist2 = jnp.where(m_, dvec.dot(dvec), 1.0)
        lnrm = _sv(parf_ref, PF_LNRM)
        cos_t2 = -du_.dot(lnrm)
        sel = m_ & (cos_t2 > 1e-6)
        pdf = dist2 / (parf_ref[0, PF_LAREA]
                       * jnp.where(sel, cos_t2, 1.0))
        return jnp.where(sel, pdf, 0.0)

    def pick_light(u_sel, ua, ub):
        lpos = (_sv(parf_ref, PF_LPOS) + _sv(parf_ref, PF_LU) * ua
                + _sv(parf_ref, PF_LV) * ub)
        return (lpos, parf_ref[0, PF_LAREA], _sv(parf_ref, PF_LNRM),
                _sv(parf_ref, PF_LEMIT))

    def occlude(shadow_org, ldir_u, occ_tmax, want):
        _occl_sweep(chunk_plan, vol_slots, shadow_eps, shadow_org, ldir_u,
                    time, occ_tmax, vu_ref, nv, ctx, aabb_ref,
                    occ_ref, nm_ref, want=want)
        return occ_ref[0, :] > 0.5

    env = BC.BounceEnv(
        mat_present=mat_present,
        num_lights=num_lights,
        mis_bsdf_weight=mis_bsdf_weight,
        rr_start_depth=rr_start,
        sky_gate=parf_ref[0, PF_SKY],
        unit_ball=_unit_ball_k,
        light_pdf_at=light_pdf_at,
        pick_light=pick_light,
        occlude=occlude,
    )
    res = BC.bounce_core(env, U, depth, alive, org, dirn, time, thr, rad,
                         prev_pdf, prev_diffuse, miss, point, normal,
                         mat_type, bp[_FUZZ], bp[_ETA], albedo, best_i)
    org, dirn, thr, rad = res.origin, res.direction, res.throughput, \
        res.radiance
    still = res.alive
    prev_pdf, prev_diffuse = res.prev_pdf, res.prev_diffuse
    rays_count = res.rays_lane

    # ---- finish / accumulate (trace_wavefront_regen semantics) -----------
    if hybrid:
        # queue semantics (trace_wavefront_queue body): freeze dead lanes'
        # depth (it records the finished path's length), leave radiance /
        # accumulation / sample cursor to the XLA flush — pending lanes
        # are derived there as prev_alive & ~alive_out
        depth = jnp.where(alive, depth + 1, depth)
        finished = alive & (~still | (depth >= max_depth))
        alive_out = still & ~finished
    else:
        depth = depth + 1
        finished = alive & (~still | (depth >= max_depth))
        rad_s = Vec3(_scrub(rad.x), _scrub(rad.y), _scrub(rad.z))
        acc = V.where(finished, acc + rad_s, acc)
        sample = jnp.where(finished, sample + 1, sample)
        alive_out = still & ~finished

    # ---- store -----------------------------------------------------------
    osf_ref[F_ORG, :] = org.x
    osf_ref[F_ORG + 1, :] = org.y
    osf_ref[F_ORG + 2, :] = org.z
    osf_ref[F_DIR, :] = dirn.x
    osf_ref[F_DIR + 1, :] = dirn.y
    osf_ref[F_DIR + 2, :] = dirn.z
    osf_ref[F_THR, :] = thr.x
    osf_ref[F_THR + 1, :] = thr.y
    osf_ref[F_THR + 2, :] = thr.z
    osf_ref[F_RAD, :] = rad.x
    osf_ref[F_RAD + 1, :] = rad.y
    osf_ref[F_RAD + 2, :] = rad.z
    osf_ref[F_ACC, :] = acc.x
    osf_ref[F_ACC + 1, :] = acc.y
    osf_ref[F_ACC + 2, :] = acc.z
    osf_ref[F_TIME, :] = time
    osf_ref[F_PPDF, :] = prev_pdf
    osi_ref[I_ALIVE, :] = alive_out.astype(jnp.int32)
    osi_ref[I_PREVD, :] = prev_diffuse.astype(jnp.int32)
    osi_ref[I_DEPTH, :] = depth
    osi_ref[I_SAMPLE, :] = sample
    osi_ref[I_PIXEL, :] = pixel
    rays_ref[0, :] = rays_count


@functools.lru_cache(maxsize=32)
def _make_mega(chunk_plan, vol_slots, n_vol, any_xform, nx, ny,
               mat_present, tex_present, num_lights, mis_bsdf_weight,
               tmin, t_max, shadow_eps, rr_start, max_depth,
               n_tiles, kdim, two_level_min, hybrid=False, tile=TILE):
    del two_level_min   # cache-key only (see trace_kernel._make_tracer)
    nv = max(n_vol, 1)
    kern = functools.partial(
        _mega_body, chunk_plan, vol_slots, any_xform, n_vol, nx, ny,
        mat_present, tex_present, num_lights, mis_bsdf_weight,
        tmin, t_max, shadow_eps, rr_start, max_depth, hybrid)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((NF, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # props
            pl.BlockSpec(memory_space=pltpu.VMEM),   # block AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # f32 params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # i32 params
        ],
        out_specs=(
            pl.BlockSpec((NF, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),     # best t
            pltpu.VMEM((1, tile), jnp.int32),       # best prim
            pltpu.VMEM((kdim, tile), jnp.float32),  # best props
            pltpu.VMEM((_max_dyn_blocks(chunk_plan), tile),
                       jnp.float32),                # near matrix
            pltpu.VMEM((1, tile), jnp.float32),     # occluded
            pltpu.VMEM((2 * nv, tile), jnp.float32),  # volume uniforms
        ],
    )

    def run(sf, si, props, aabbs, parf, pari):
        n = sf.shape[1]
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((NF, n), jnp.float32),
                       jax.ShapeDtypeStruct((NI, n), jnp.int32),
                       jax.ShapeDtypeStruct((1, n), jnp.float32)),
        )(sf, si, props, aabbs, parf, pari)

    return run


def mega_params(scene: S.Scene, key, cfg):
    """(par_f [1, PF] f32, par_i [1, PI] i32) SMEM rows for the kernel."""
    cam = scene.camera
    lt = scene.lights
    parf = jnp.concatenate([
        jnp.asarray(cam.origin, jnp.float32).reshape(-1),
        jnp.asarray(cam.lower_left, jnp.float32).reshape(-1),
        jnp.asarray(cam.horizontal, jnp.float32).reshape(-1),
        jnp.asarray(cam.vertical, jnp.float32).reshape(-1),
        jnp.asarray(cam.u, jnp.float32).reshape(-1),
        jnp.asarray(cam.v, jnp.float32).reshape(-1),
        jnp.asarray(cam.lens_radius, jnp.float32).reshape(1),
        jnp.asarray(cam.time0, jnp.float32).reshape(1),
        jnp.asarray(cam.time1, jnp.float32).reshape(1),
        jnp.asarray(scene.sky_light, jnp.float32).reshape(1),
        lt.position[0].reshape(-1), lt.vec_u[0].reshape(-1),
        lt.vec_v[0].reshape(-1), lt.emission[0].reshape(-1),
        lt.area[0].reshape(1), lt.normal[0].reshape(-1),
        jnp.zeros((PF - 38,), jnp.float32),
    ])[None, :]
    # h0: the path-hash base of utils.rng.pixel_sample_hash
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    h0 = R.pcg_hash(kd[0] + R.pcg_hash(kd[-1]))
    pari = jnp.zeros((1, PI), jnp.int32)
    pari = pari.at[0, PI_H0_LO].set(
        (h0 & np.uint32(0xFFFF)).astype(jnp.int32))
    pari = pari.at[0, PI_H0_HI].set((h0 >> np.uint32(16)).astype(jnp.int32))
    return parf, pari


def hybrid_tile(scene: S.Scene) -> int:
    """Ray-tile size of the HYBRID kernel: follows the split kernels'
    per-scene choice (trace_kernel._pick_tile — e.g. 2048 on atlas-free
    scene 1, where the measured queue-tier win came from).  The plain
    megakernel keeps TILE=1024 (Cornell collapsed at 2048, BASELINE.md
    round-4 sweep)."""
    return _tk._pick_tile(scene)


def mega_step(scene: S.Scene, cfg, sf, si, parf, pari, hybrid=False):
    """One whole wavefront iteration.  Returns (sf', si', rays [1, n]).

    `hybrid=True` runs the queue-scheduled variant: no in-kernel
    regeneration or accumulation — the XLA flush in
    integrator.trace_wavefront_qmega claims work and generates camera
    rays (VERDICT r4 item 2: one Pallas launch per bounce for
    trace+shade+NEE+RR with the queue claim/flush staying in XLA)."""
    any_xform = any(e[5] for e in scene.chunk_plan)
    props = build_props(scene, any_xform)
    n = sf.shape[1]
    tile = hybrid_tile(scene) if hybrid else TILE
    run = _make_mega(scene.chunk_plan, scene.vol_slots_static, scene.n_vol,
                     any_xform, cfg.nx, cfg.ny,
                     scene.mat_present, scene.tex_present, scene.num_lights,
                     cfg.mis_bsdf_weight, float(cfg.t_min), float(cfg.t_max),
                     float(cfg.shadow_eps), int(cfg.rr_start_depth),
                     int(cfg.max_depth), n // tile, props.shape[1],
                     _tk._TWO_LEVEL_MIN, hybrid, tile)
    # augment_aabbs: identical to scene.block_aabbs unless the plan has
    # two-level groups (forced backend="mega" on an >=8k-prim scene) — the
    # in-kernel dispatch then needs the appended super-AABB rows
    return run(sf, si, props, augment_aabbs(scene), parf, pari)
