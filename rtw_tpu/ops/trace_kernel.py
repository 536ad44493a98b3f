"""Pallas TPU trace kernels — VMEM-tiled brute-force scene intersection.

Why a kernel when ops/intersect.py already vectorizes the same sweep?

1. **HBM blowup**: in plain XLA every [C, N] t-matrix and its temporaries
   round-trip HBM; at C=128, N=1M that is ~0.5 GB per elementwise op, and
   the sweep becomes memory-bound an order of magnitude above the compute
   cost.  Here each grid step owns a ray TILE resident in VMEM, sweeps all
   primitive blocks against it, and writes only the final hit record: HBM
   traffic is exactly rays-in + hits-out.

2. **Gather tax**: resolving the winning primitive's parameters and
   material/texture record via per-ray gathers costs ~11.5 ms per 1M lanes
   per gathered column on TPU.  In-kernel the winner's full record is
   fetched with a tiny one-hot matmul on the MXU per block
   ([K, C] @ [C, TILE]) and merged with a select — exact (one-hot fp32
   matmul is an exact gather) and essentially free.

The kernel is specialized per scene: the static chunk plan (models/builder)
unrolls one type-specialized block test per primitive block, reusing the
same jnp math as the pure-JAX path (ops/intersect._block_t callees) so both
backends share one definition of the geometry.  The pure-JAX path remains
the reference implementation — used on CPU, in interpret mode, and for the
differentiable renderer — and tests assert the two agree.

This is the TPU-native replacement for `optixTraverse` + the intersection
programs + the implicit SBT record fetch (RestOfLife/geometry/*.cu,
shaders/closehit.cu:50-63).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtw_tpu.models import scene as S
from rtw_tpu.ops import intersect as I
from rtw_tpu.ops import vec as V
from rtw_tpu.ops.vec import Vec3

BIG = I.BIG
TILE = 1024      # rays per grid step; [128, TILE] f32 block = 512 KB VMEM


class ShadeRec(NamedTuple):
    """Per-ray shading record of the winning primitive — the flattened
    MaterialParams+textureParam fetch (sysparameter.h:5-14) the reference
    does through the SBT/instance-id indirection."""

    mat_type: Any    # [N] int32
    fuzz: Any        # [N] f32
    eta: Any         # [N] f32
    tex_type: Any    # [N] int32
    scale: Any       # [N] f32
    image_id: Any    # [N] int32
    rgb: Vec3        # [N] planes: constant/albedo texture color
    odd: Vec3        # [N] planes: checker odd color
    even: Vec3       # [N] planes: checker even color


# Props-table column layout (f32 matrix [P, K])
_P9 = list(range(9))
_MAT, _FUZZ, _ETA, _TEXT, _SCALE, _IMG = 9, 10, 11, 12, 13, 14
_RGB = (15, 16, 17)
_ODD = (18, 19, 20)
_EVEN = (21, 22, 23)
_MID = 24              # material row id (Materials table index)
_KBASE = 25
_W2O = _KBASE          # +12 when any_xform
_O2W = _KBASE + 12


def build_props(scene: S.Scene, any_xform: bool):
    """Assemble the [P, K] f32 per-prim property matrix (traced — color
    columns flow from Textures.color so parameter updates are visible)."""
    pr = scene.prims
    cols = [pr.params[:, k] for k in _P9]
    cols += [pr.mat_type_p.astype(jnp.float32), pr.fuzz_p, pr.eta_p,
             pr.tex_type_p.astype(jnp.float32), pr.scale_p,
             pr.image_id_p.astype(jnp.float32)]
    col = scene.textures.color
    cols += [col[:, k][pr.tex_idx] for k in range(3)]
    cols += [col[:, k][pr.odd_idx] for k in range(3)]
    cols += [col[:, k][pr.even_idx] for k in range(3)]
    cols += [pr.material_id.astype(jnp.float32)]
    if any_xform:
        cols += [pr.w2o[:, i, j] for i in range(3) for j in range(4)]
        cols += [pr.o2w[:, i, j] for i in range(3) for j in range(4)]
    return jnp.stack(cols, axis=1)


def _mat3x4(rows):
    """Nested [TILE]-plane 3x4 from 12 planes."""
    return [[rows[i * 4 + j] for j in range(4)] for i in range(3)]


def _atan2_poly(y, x):
    """Polynomial atan2 (max err ~1e-4 rad) — Mosaic has no atan2 lowering.

    Standard octant-reduced minimax cubic-in-s atan approximation used in
    GPU shading; plenty for texture coordinates."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * t + t
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _sphere_uv_poly(nrm: Vec3):
    """Spherical uv via the polynomial atan2 (sphere.cu:24-32 semantics)."""
    ny = jnp.clip(nrm.y, -1.0, 1.0)
    phi = _atan2_poly(nrm.z, nrm.x)
    theta = _atan2_poly(ny, jnp.sqrt(jnp.maximum(1.0 - ny * ny, 1e-30)))
    u = 1.0 - (phi + np.float32(np.pi)) / np.float32(2.0 * np.pi)
    v = (theta + np.float32(np.pi / 2)) / np.float32(np.pi)
    return u, v


def _block_test(props_ref, vu_ref, vol_slots, entry, b0, o, d, tmin, tmax,
                time, vu_base=0, row_off=0):
    """t-matrix [C, TILE] for one primitive block, read from VMEM refs.

    `vu_base`: row offset of this sweep's free-flight uniforms inside
    vu_ref (the megakernel packs main-ray and shadow-ray draws in one
    lanes array).  `row_off`: static offset subtracted from global props
    rows — props-streaming mode reads groups from a compact VMEM
    resident scratch instead of the whole table."""
    start, count, size, ptype, axis, has_xform, block = entry
    C = min(block, start + size - b0)
    r0 = b0 - row_off
    params = props_ref[r0:r0 + C, 0:9]
    # pad mask computed in-kernel (captured np constants are not
    # allowed as implicit pallas inputs)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
             + (b0 - start)) < count

    if has_xform:
        w2o_cols = [[props_ref[r0:r0 + C, _W2O + i * 4 + j][:, None]
                     for j in range(4)] for i in range(3)]
        oo = V.affine_point(w2o_cols, o)
        dd = V.affine_vec(w2o_cols, d)
    else:
        oo, dd = o, d

    if ptype == S.PRIM_SPHERE:
        t = I.sphere_t(params, oo, dd, tmin, tmax)
    elif ptype == S.PRIM_MOVING_SPHERE:
        t = I.moving_sphere_t(params, oo, dd, tmin, tmax, time)
    elif ptype == S.PRIM_RECT:
        t = I.rect_t(params, oo, dd, tmin, tmax, axis)
    elif ptype == S.PRIM_BOX:
        t = I.box_t(params, oo, dd, tmin, tmax)
    elif ptype in (S.PRIM_VOLUME_SPHERE, S.PRIM_VOLUME_BOX):
        u = jnp.stack([vu_ref[vu_base + max(vol_slots[i], 0), :]
                       for i in range(b0, b0 + C)])
        fn = (I.volume_sphere_t if ptype == S.PRIM_VOLUME_SPHERE
              else I.volume_box_t)
        t = fn(params, oo, dd, tmin, tmax, u)
    else:  # pragma: no cover
        raise ValueError(f"unknown prim type {ptype}")

    return jnp.where(valid, t, BIG), C


def _use_block_culls(chunk_plan) -> bool:
    """Whether the static sweep guards each block test behind an AABB cull
    (@pl.when).  Mosaic control flow costs real per-branch overhead
    (scalar-unit predicate + jump), which at Cornell scale (~6 blocks) was
    comparable to the block tests themselves — small scenes run the
    straight-line sweep instead."""
    return sum(e[2] // e[6] for e in chunk_plan) > 8


def _is_dynamic(entry) -> bool:
    """Groups traversed with the dynamic front-to-back block loop: enough
    blocks that ordering/culling pays, and a type whose test needs no
    per-prim static data (volumes need their static vol_slot -> uniform-row
    mapping, and volume groups are <= a handful of prims anyway)."""
    start, count, size, ptype, axis, has_xform, block = entry
    return (ptype in (S.PRIM_SPHERE, S.PRIM_MOVING_SPHERE, S.PRIM_RECT,
                      S.PRIM_BOX)
            and size // block >= 3)


# Two-level traversal: dynamic groups with many blocks get their blocks
# bundled into super-groups of _GROUP consecutive (Morton-ordered, so
# spatially compact) blocks with merged AABBs; the per-tile walk orders and
# culls SUPER-groups first and only computes block-level entry distances
# for supers some lane can still reach.  This bounds the O(B^2 * n) reduce
# work of the flat walk (fatal by ~10^4-10^5 prims — QUIRKS scale-ceiling
# analysis) at O(S^2 * n) + O(reached * _GROUP^2 * n).  The reference gets
# the equivalent from its multi-level BVH (optixAccelBuild GAS/IAS,
# ioGeometryGroup.h:160-225).
_GROUP = 16           # blocks per super-group
# Dynamic groups with >= this many blocks go two-level.  Measured crossover
# (tools/stress_scale.py, one chip, dense 512^2@4spp field): 4k prims flat
# 5.17 vs two-level 4.92 Mrays/s; 16k flat 2.11 vs 2.41; 64k flat FAILS TO
# COMPILE (the [B, n] near-matrix scratch at B=1024 exceeds the 16 MB
# scoped-VMEM limit) vs two-level 2.45.  128 blocks = 8k prims at the
# 64-prim block size; every reference scene (<= ~54 blocks/group) keeps
# its round-3 flat walk bit-for-bit.
_TWO_LEVEL_MIN = 128


def _two_level(entry) -> bool:
    return _is_dynamic(entry) and (entry[2] // entry[6]) >= _TWO_LEVEL_MIN


def _n_supers(entry) -> int:
    return -(-(entry[2] // entry[6]) // _GROUP)


def _super_offsets(chunk_plan) -> dict:
    """Static row offset of each two-level entry's super-AABB rows inside
    the augmented AABB table (supers appended after all block rows)."""
    sid = sum(e[2] // e[6] for e in chunk_plan)
    out = {}
    for i, e in enumerate(chunk_plan):
        if _two_level(e):
            out[i] = sid
            sid += _n_supers(e)
    return out


def augment_aabbs(scene: S.Scene):
    """Block AABBs + appended super-group AABB rows (traced; mirrors the
    kernel's static _super_offsets layout).  Pad blocks inside a partial
    super get inverted boxes (lo=BIG, hi=-BIG) — unreachable.  A _GROUP-row
    guard tail keeps the two-level walk's dynamic _GROUP-row refinement
    reads in-bounds when a group's last (partial) super slices past its
    final block row (the overread rows are masked to BIG by valid_row)."""
    ab = scene.block_aabbs
    rows = [ab]
    blk = 0
    for e in scene.chunk_plan:
        B = e[2] // e[6]
        if _two_level(e):
            Ssup = _n_supers(e)
            pad = Ssup * _GROUP - B
            g = ab[blk:blk + B]
            if pad:
                inv = jnp.concatenate(
                    [jnp.full((pad, 3), BIG, jnp.float32),
                     jnp.full((pad, 3), -BIG, jnp.float32),
                     jnp.zeros((pad, ab.shape[1] - 6), jnp.float32)], axis=1)
                g = jnp.concatenate([g, inv], axis=0)
            g = g.reshape(Ssup, _GROUP, ab.shape[1])
            sup = jnp.concatenate(
                [jnp.min(g[:, :, 0:3], axis=1), jnp.max(g[:, :, 3:6], axis=1),
                 jnp.zeros((Ssup, ab.shape[1] - 6), jnp.float32)], axis=1)
            rows.append(sup)
        blk += B
    if len(rows) == 1:
        return ab
    guard = jnp.concatenate(
        [jnp.full((_GROUP, 3), BIG, jnp.float32),
         jnp.full((_GROUP, 3), -BIG, jnp.float32),
         jnp.zeros((_GROUP, ab.shape[1] - 6), jnp.float32)], axis=1)
    return jnp.concatenate(rows + [guard], axis=0)


def validate_walk_layout(scene: S.Scene) -> None:
    """Host-side sanitizer for the walker's static index arithmetic — the
    checkify analog for the kernel's most intricate code (SURVEY §5 race
    detection / sanitizers row).  Every dynamic read the two-level walk can
    issue is enumerated here against the augmented AABB table's actual row
    layout; any violated invariant raises before a kernel ever launches.
    Exercised over randomized chunk plans by tests/test_walker_fuzz.py."""
    plan = scene.chunk_plan
    n_blocks = sum(e[2] // e[6] for e in plan)
    ab = scene.block_aabbs
    assert ab.shape[0] == n_blocks, (
        f"block AABB rows {ab.shape[0]} != plan blocks {n_blocks}")

    sup_off = _super_offsets(plan)
    n_supers = sum(_n_supers(e) for e in plan if _two_level(e))
    has_two_level = n_supers > 0
    total_rows = n_blocks + n_supers + (_GROUP if has_two_level else 0)
    aug_rows = int(augment_aabbs(scene).shape[0])
    assert aug_rows == total_rows, (aug_rows, total_rows)

    scratch_rows = _max_dyn_blocks(plan)
    blk = 0
    for ei, e in enumerate(plan):
        B = e[2] // e[6]
        if _is_dynamic(e) and not _two_level(e):
            # flat walk: one static [B, n] near-matrix at rows [blk, blk+B)
            assert blk + B <= n_blocks
            assert B <= scratch_rows, (B, scratch_rows)
            assert ei not in sup_off
        if _two_level(e):
            Ssup = _n_supers(e)
            assert Ssup * _GROUP >= B
            assert Ssup + _GROUP <= scratch_rows, (Ssup, scratch_rows)
            so = sup_off[ei]
            # super rows live past every block row, inside the table
            assert n_blocks <= so and so + Ssup <= n_blocks + n_supers
            # worst-case dynamic refinement read: super Ssup-1 reads block
            # rows [blk + (Ssup-1)*_GROUP, +_GROUP) — may overhang its own
            # group's rows (partial super) but must stay inside the table
            # (the guard tail absorbs the overhang, masked by valid_row)
            hi = blk + (Ssup - 1) * _GROUP + _GROUP
            assert hi <= aug_rows, (hi, aug_rows)
        blk += B
    # super offsets are disjoint and ordered
    offs = sorted(sup_off.items())
    for (e1, o1), (e2, o2) in zip(offs, offs[1:]):
        assert o1 + _n_supers(plan[e1]) <= o2


# Props residency (VERDICT r4 item 8): above this table size the whole
# [P, K] f32 props table no longer fits scoped VMEM next to the sweep's
# scratch (measured ceiling ~128k prims at K=25, docs/scaling.json) — the
# table stays in HBM and the kernels stream the rows they touch.  64k
# prims (6.5 MB) measured FASTER fully resident, so the threshold sits
# just above it.
_PROPS_STREAM_BYTES = 8 * 2 ** 20
_PROPS_STREAM_OVERRIDE = None      # tests force True/False


def _props_stream(chunk_plan, kdim: int) -> bool:
    if _PROPS_STREAM_OVERRIDE is not None:
        return bool(_PROPS_STREAM_OVERRIDE)
    rows = sum(e[2] for e in chunk_plan)
    return rows * kdim * 4 > _PROPS_STREAM_BYTES


def _stream_plan(chunk_plan):
    """Static layout of streaming mode's VMEM scratches:
    (resident rows, {entry index -> resident base row}, per-super rows).
    Non-two-level groups live stacked in the resident scratch; the
    largest two-level block size dictates the per-super window."""
    base, bases, sup_rows = 0, {}, 8
    for ei, e in enumerate(chunk_plan):
        if _two_level(e):
            sup_rows = max(sup_rows, _GROUP * e[6])
        else:
            bases[ei] = base
            base += e[2]
    return max(base, 8), bases, sup_rows


def _max_dyn_blocks(chunk_plan) -> int:
    """Rows of the shared near-matrix scratch (>=1 so the alloc is valid).
    Two-level groups need S super rows + _GROUP refined block rows."""
    rows = []
    for e in chunk_plan:
        if not _is_dynamic(e):
            continue
        rows.append(_n_supers(e) + _GROUP if _two_level(e)
                    else e[2] // e[6])
    return max(rows, default=1)


def _near_matrix(aabb_ref, g_bid, B: int, o, d, tmin):
    """[B, n] per-(block, lane) conservative entry distance: max(near, tmin)
    of the slab test against block AABBs g_bid..g_bid+B, BIG where the lane
    cannot hit the block at all.  One vectorized slab sweep per group — the
    per-block scalar AABB reads of the static path, batched.  `g_bid` may
    be a traced scalar (the two-level walk refines supers dynamically)."""
    near = jnp.full_like(o.x[None, :] + jnp.zeros((B, 1), jnp.float32), -BIG)
    far = jnp.full_like(near, BIG)
    for ax in range(3):
        lo = aabb_ref[pl.ds(g_bid, B), ax][:, None]
        hi = aabb_ref[pl.ds(g_bid, B), 3 + ax][:, None]
        dk = d[ax][None, :]
        inv = 1.0 / jnp.where(dk == 0.0, 1e-30, dk)
        t0 = (lo - o[ax][None, :]) * inv
        t1 = (hi - o[ax][None, :]) * inv
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    nearc = jnp.maximum(near, tmin)
    return jnp.where(far >= nearc, nearc, BIG)


def _block_test_dyn(props_ref, lb0, entry, b0, o, d, tmin, tmax, time):
    """t-matrix [block, n] for dynamically-chosen block at global row b0
    (a traced scalar) of a same-typed group; rows are READ at `lb0` of
    `props_ref` — equal to b0 when the whole table is VMEM-resident,
    or a local offset into the streaming scratch window."""
    start, count, size, ptype, axis, has_xform, block = entry
    C = block
    params = props_ref[pl.ds(lb0, C), 0:9]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
             + (b0 - start)) < count

    if has_xform:
        w2o_cols = [[props_ref[pl.ds(lb0, C), _W2O + i * 4 + j][:, None]
                     for j in range(4)] for i in range(3)]
        oo = V.affine_point(w2o_cols, o)
        dd = V.affine_vec(w2o_cols, d)
    else:
        oo, dd = o, d

    if ptype == S.PRIM_SPHERE:
        t = I.sphere_t(params, oo, dd, tmin, tmax)
    elif ptype == S.PRIM_MOVING_SPHERE:
        t = I.moving_sphere_t(params, oo, dd, tmin, tmax, time)
    elif ptype == S.PRIM_RECT:
        t = I.rect_t(params, oo, dd, tmin, tmax, axis)
    elif ptype == S.PRIM_BOX:
        t = I.box_t(params, oo, dd, tmin, tmax)
    else:  # pragma: no cover
        raise ValueError(f"dynamic path cannot test prim type {ptype}")
    return jnp.where(valid, t, BIG), C


def _walk_group(entry, g_bid, g_sid, aabb_ref, nm_ref, o, d, tmin,
                ub_fn, visit_fn, super_hook=None):
    """Front-to-back walk over one dynamic group's blocks for this ray
    tile — the ONE definition of the traversal order/culling, shared by
    the nearest-hit and any-hit sweeps (they differ only in the per-lane
    upper bound `ub_fn()` and the per-block action
    `visit_fn(b0, s, k)` — b0 the global props row, s the super index
    (None on the flat path), k the block index within the level).
    `super_hook(s)` fires when the two-level walk descends into super s,
    BEFORE its refined near-matrix is computed — the props-streaming
    mode starts its HBM->VMEM DMA there so the copy rides under the
    refinement math.

    Groups below _TWO_LEVEL_MIN blocks order all B blocks directly by
    conservative entry distance with a per-lane upper-bound cut (the
    tile-level analog of ordered BVH traversal; the reference gets this
    from optixTraverse's hardware walk, ioGeometryGroup.h:160-225).
    Larger groups go two-level: _GROUP-block super-AABBs (rows at `g_sid`
    in aabb_ref, see augment_aabbs) are ordered and culled first, and a
    super's block rows are computed only while some lane's bound still
    undercuts its entry — this bounds the flat walk's O(B^2 * lanes)
    reduce work (fatal by ~10^4-10^5 prims) at O(S^2) + O(reached *
    _GROUP^2).

    NOTE (round 5, measured): a "cheap scalar key" variant — reduce each
    row's key ONCE into a [rows, 1] column at walk entry, select by
    argmin over that column, and apply the dynamic cut lazily as a
    per-visit [1, n] reach check under a second @pl.when — cut the
    walk's vector scheduling work ~20x on paper and measured scene 4
    10.3 -> 7.6, scene 2 16.5 -> 15.5 Mrays/s ON CHIP.  The extra
    per-iteration branch (2 nested @pl.when + a dynamic row read) costs
    more than the [rows, n] re-reduction it saves — consistent with the
    round-3 lesson that a Mosaic branch costs about a whole 64-prim
    block test.  Keep ONE branch per visit; the adaptive re-keying below
    stays.

    Loop mechanism (round 5): each level runs a while_loop that EXITS the
    moment a re-key finds no reachable row left (kmin == BIG), instead of
    the round-4 fori_loop that kept spinning keys_of-only iterations to
    its static trip count.  The visit sequence is identical (same one
    branch per visit); only the dead tail of re-keys is cut — the win
    scales with how early the per-lane bound cut empties the group
    (occlusion walks exit on first tile-wide hit; big-scene supers far
    behind the rays' bounds are never re-keyed)."""
    start, count, size, ptype, axis, has_xform, block = entry
    B = size // block
    n = o.x.shape[0]

    def keys_of(lo, rows, ub):
        nm = nm_ref[lo:lo + rows, :]
        return jnp.min(jnp.where(nm < ub[None, :], nm, BIG),
                       axis=1, keepdims=True)

    def walk_level(lo, rows, iota, on_visit):
        """Front-to-back visit loop over nm_ref rows [lo, lo+rows): visit
        the nearest not-yet-consumed row some lane still reaches, until
        none is left.  on_visit(k) must BIG-out row lo+k."""
        def cond(carry):
            it, live = carry
            return (it < rows) & live

        def body(carry):
            it, _ = carry
            keys = keys_of(lo, rows, ub_fn())
            kmin = jnp.min(keys)

            @pl.when(kmin < BIG)
            def _():
                k = jnp.min(jnp.where(keys <= kmin, iota, rows)).astype(
                    jnp.int32)
                on_visit(k)

            return it + 1, kmin < BIG

        jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                        jnp.asarray(True)))

    if not _two_level(entry):
        nm_ref[0:B, :] = _near_matrix(aabb_ref, g_bid, B, o, d, tmin)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

        def visit_flat(k):
            visit_fn(start + k * block, None, k)
            nm_ref[pl.ds(k, 1), :] = jnp.full((1, n), BIG, jnp.float32)

        walk_level(0, B, iota_b, visit_flat)
        return

    Ssup = _n_supers(entry)
    # nm_ref rows [0:S) hold super entries, rows [S:S+_GROUP) the refined
    # block entries of the super currently being walked
    nm_ref[0:Ssup, :] = _near_matrix(aabb_ref, g_sid, Ssup, o, d, tmin)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (Ssup, 1), 0)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0)

    def visit_super(s):
        if super_hook is not None:
            super_hook(s)
        nm = _near_matrix(aabb_ref, g_bid + s * _GROUP, _GROUP,
                          o, d, tmin)
        valid_row = (s * _GROUP + iota_g) < B
        nm_ref[Ssup:Ssup + _GROUP, :] = jnp.where(valid_row, nm, BIG)

        def visit_block(k):
            visit_fn(start + (s * _GROUP + k) * block, s, k)
            nm_ref[pl.ds(Ssup + k, 1), :] = jnp.full(
                (1, n), BIG, jnp.float32)

        walk_level(Ssup, _GROUP, iota_g, visit_block)
        nm_ref[pl.ds(s, 1), :] = jnp.full((1, n), BIG, jnp.float32)

    walk_level(0, Ssup, iota_s, visit_super)


class _StreamCtx(NamedTuple):
    """Props-residency context threaded through the sweeps.

    When `stream` is False, `props_ref` is the whole [P, K] table in VMEM
    and every read uses global rows.  When True (the >8 MB tier,
    VERDICT r4 item 8), `props_ref` lives in HBM (memory_space=ANY) and
    is only ever DMA'd: non-two-level groups are copied once per ray
    tile into the compact `resid_ref` scratch (static layout
    `resid_base`), and each two-level super's _GROUP blocks are copied
    into `sup_ref` when the walk descends into that super — the
    reference's analog is optixAccelBuild keeping scene-sized geometry
    in device memory while the traversal hardware caches what it
    touches."""

    props_ref: Any     # [P, K] table: VMEM ref, or ANY/HBM ref when stream
    resid_ref: Any     # VMEM [resid_rows, K] scratch or None
    sup_ref: Any       # VMEM [_GROUP * block, K] scratch or None
    sem: Any           # DMA completion semaphore or None
    resid_base: Any    # dict: entry index -> row base inside resid_ref
    stream: bool


def _flat_src(ctx: _StreamCtx, ei: int, entry):
    """(ref, static row offset to subtract) for static/flat-walk reads of
    group `ei`."""
    if not ctx.stream:
        return ctx.props_ref, 0
    return ctx.resid_ref, entry[0] - ctx.resid_base[ei]


def _sup_dma(ctx: _StreamCtx, entry, s):
    """Descriptor of the per-super props copy: super `s`'s _GROUP blocks
    of rows -> sup_ref.  The table carries a guard tail (trace_pallas)
    so the fixed-size copy of a partial last super stays in bounds; pad
    blocks are never visited (their AABBs are inverted)."""
    start, count, size, ptype, axis, has_xform, block = entry
    rows = _GROUP * block
    return pltpu.make_async_copy(
        ctx.props_ref.at[pl.ds(start + s * rows, rows), :],
        ctx.sup_ref.at[pl.ds(0, rows), :],
        ctx.sem)


def _load_resident(ctx: _StreamCtx, chunk_plan):
    """Copy every non-two-level group's rows into resid_ref (kernel
    start, streaming mode).  Sequential start/wait — this happens once
    per ray tile and the copies are a few hundred KB total."""
    for ei, e in enumerate(chunk_plan):
        if _two_level(e):
            continue
        dma = pltpu.make_async_copy(
            ctx.props_ref.at[pl.ds(e[0], e[2]), :],
            ctx.resid_ref.at[pl.ds(ctx.resid_base[ei], e[2]), :],
            ctx.sem)
        dma.start()
        dma.wait()


def _dyn_hooks(ctx: _StreamCtx, ei: int, entry):
    """(super_hook, visit source resolver) for one dynamic group's walk."""
    two_stream = ctx.stream and _two_level(entry)
    flat_ref, flat_off = (None, 0) if two_stream else _flat_src(ctx, ei,
                                                                entry)

    def src_of(b0, s, k):
        if two_stream:
            return ctx.sup_ref, k * entry[6]
        return flat_ref, b0 - flat_off

    if not two_stream:
        return None, src_of

    def super_hook(s):
        # synchronous per-super copy: ~_GROUP*block*K*4 bytes (~100 KB at
        # K=25) per descended super; overlap with the refinement math is
        # not worth a second semaphore until measured to matter
        _sup_dma(ctx, entry, s).start()
        _sup_dma(ctx, entry, s).wait()

    return super_hook, src_of


def _dyn_nearest(entry, ei, g_bid, g_sid, ctx, aabb_ref, nm_ref,
                 bt_ref, bi_ref, bp_ref, o, d, time, tmax, tmin):
    """Nearest-hit walk of one dynamic group (see _walk_group)."""
    super_hook, src_of = _dyn_hooks(ctx, ei, entry)

    def ub_fn():
        return jnp.minimum(bt_ref[0, :], tmax)

    def visit(b0, s, k):
        ref, lb0 = src_of(b0, s, k)
        t, C = _block_test_dyn(ref, lb0, entry, b0, o, d, tmin, tmax, time)
        _merge_block(b0, t, C, ref, bt_ref, bi_ref, bp_ref, lb0=lb0)

    _walk_group(entry, g_bid, g_sid, aabb_ref, nm_ref, o, d, tmin,
                ub_fn, visit, super_hook=super_hook)


def _dyn_occl(entry, ei, g_bid, g_sid, ctx, aabb_ref, nm_ref,
              occ_ref, o, d, time, tmax, tmin, want):
    """Any-hit walk of one dynamic group (see _walk_group): near-ordered
    (closer blocks occlude with higher probability), lanes leave the
    `pending` set on first hit, and blocks/supers no pending lane can
    reach are never tested."""
    super_hook, src_of = _dyn_hooks(ctx, ei, entry)

    def ub_fn():
        pending = occ_ref[0, :] < 0.5
        if want is not None:
            pending = pending & want
        return jnp.where(pending, tmax, -BIG)

    def visit(b0, s, k):
        ref, lb0 = src_of(b0, s, k)
        t, _C = _block_test_dyn(ref, lb0, entry, b0, o, d, tmin, tmax,
                                time)
        hit_any = jnp.max((t < BIG).astype(jnp.float32), axis=0)
        occ_ref[0, :] = jnp.maximum(occ_ref[0, :], hit_any)

    _walk_group(entry, g_bid, g_sid, aabb_ref, nm_ref, o, d, tmin,
                ub_fn, visit, super_hook=super_hook)



def _merge_block(b0, t, C, props_ref, bt_ref, bi_ref, bp_ref, lb0=None):
    """Merge one block's [C, n] t-matrix into the running (t, prim, props)
    winner.  `b0` is the GLOBAL first-prim row (recorded as winner
    identity); rows are READ at `lb0` (defaults to b0 — differs only in
    props-streaming mode, where props_ref is a local scratch window).

    The winner's property record fetch is exact either way; the route
    depends on block width:
    - C <= 16: VPU masked accumulation (C x K outer products).  A [K, C] @
      [C, n] one-hot matmul contracts only C deep on the 128-wide systolic
      array — C/128 utilization, times the ~6-pass f32 emulation — and the
      small-block merges dominated the Cornell whole-bounce kernel
      (measured 88 -> see BASELINE round 3 after this change).
    - larger C: one-hot matmul on the MXU at HIGHEST precision (the default
      TPU matmul truncates fp32 inputs to bf16, corrupting gathered
      geometry; the multi-pass f32 emulation recovers full precision)."""
    n = t.shape[1]
    if lb0 is None:
        lb0 = b0
    c_t = jnp.min(t, axis=0)
    c_arg = jnp.argmin(t, axis=0).astype(jnp.int32)
    best_t = bt_ref[0, :]
    better = c_t < best_t

    K = bp_ref.shape[0]        # real column count (padded refs read 0:K)
    if C <= 16:
        blk = props_ref[pl.ds(lb0, C), 0:K]        # [C, K]
        acc = blk[0, :][:, None] * (c_arg == 0).astype(jnp.float32)[None, :]
        for c in range(1, C):
            m = (c_arg == c).astype(jnp.float32)[None, :]
            acc = acc + blk[c, :][:, None] * m
        blk_props = acc                           # [K, n]
    else:
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, n), 0)
                  == c_arg[None, :]).astype(jnp.float32)
        blk_props = jax.lax.dot_general(
            props_ref[pl.ds(lb0, C), 0:K], onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)   # [K, n]

    bt_ref[0, :] = jnp.where(better, c_t, best_t)
    bi_ref[0, :] = jnp.where(better, b0 + c_arg, bi_ref[0, :])
    bp_ref[:, :] = jnp.where(better[None, :], blk_props, bp_ref[:, :])


def _block_active(aabb_ref, blk_id, o, d, tmin, tmax, best_t):
    """Per-lane 'this block could improve this ray' mask from the block's
    world AABB (slab test; t in units of |d| like everything else)."""
    near = jnp.full_like(o.x, -BIG)
    far = jnp.full_like(o.x, BIG)
    for ax in range(3):
        lo = aabb_ref[blk_id, ax]
        hi = aabb_ref[blk_id, 3 + ax]
        dk = d[ax]
        inv = 1.0 / jnp.where(dk == 0.0, 1e-30, dk)
        t0 = (lo - o[ax]) * inv
        t1 = (hi - o[ax]) * inv
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    return (far >= jnp.maximum(near, tmin)) & (near < tmax) & (near < best_t)


def _nearest_hit(chunk_plan, vol_slots, any_xform, tmin,
                 o, d, time, tmax, vu_ref, vu_base, ctx, aabb_ref,
                 bt_ref, bi_ref, bp_ref, nm_ref):
    """Nearest-hit sweep + winner payload for one in-VMEM ray tile.

    Carries (best t / prim / props) live in VMEM scratch.  Small groups run
    the static unrolled sweep with whole-block @pl.when AABB culls; large
    groups run the dynamic front-to-back traversal (_dyn_nearest) — ordered
    visits + per-lane best-t cut, the tile-level analog of ordered BVH
    traversal.

    Returns (best_t, best_i, best_props, point, normal, u, v)."""
    n = o.x.shape[0]

    bt_ref[:, :] = jnp.full((1, n), BIG, jnp.float32)
    bi_ref[:, :] = jnp.full((1, n), -1, jnp.int32)
    bp_ref[:, :] = jnp.zeros_like(bp_ref)
    if ctx.stream:
        _load_resident(ctx, chunk_plan)

    culls = _use_block_culls(chunk_plan)
    sup_off = _super_offsets(chunk_plan)
    blk_id = 0
    for ei, entry in enumerate(chunk_plan):
        start, count, size, ptype, axis, has_xform, block = entry
        if _is_dynamic(entry):
            _dyn_nearest(entry, ei, blk_id, sup_off.get(ei), ctx,
                         aabb_ref, nm_ref, bt_ref, bi_ref, bp_ref,
                         o, d, time, tmax, tmin)
            blk_id += size // block
            continue
        s_ref, s_off = _flat_src(ctx, ei, entry)
        for b0 in range(start, start + size, block):
            bid = blk_id
            blk_id += 1

            def run_block(entry=entry, b0=b0, s_ref=s_ref, s_off=s_off):
                t, C = _block_test(s_ref, vu_ref, vol_slots, entry, b0,
                                   o, d, tmin, tmax, time, vu_base,
                                   row_off=s_off)
                _merge_block(b0, t, C, s_ref, bt_ref, bi_ref, bp_ref,
                             lb0=b0 - s_off)

            if culls:
                active = _block_active(aabb_ref, bid, o, d, tmin, tmax,
                                       bt_ref[0, :])
                pl.when(jnp.any(active))(run_block)
            else:
                run_block()

    best_t = bt_ref[0, :]
    best_i = bi_ref[0, :]
    best_props = bp_ref[:, :]

    # ---- payload for the global winner (statically typed per group) ------
    hit_mask = best_i >= 0
    t_pay = jnp.where(hit_mask, best_t, 0.0)
    p9 = [best_props[k] for k in _P9]
    if any_xform:
        w2o_g = _mat3x4([best_props[_W2O + k] for k in range(12)])
        o2w_g = _mat3x4([best_props[_O2W + k] for k in range(12)])
        o_x = V.affine_point(w2o_g, o)
        d_x = V.affine_vec(w2o_g, d)

    zero = jnp.zeros((n,), jnp.float32)
    point = Vec3(zero, zero, zero)
    normal = Vec3(zero, zero, zero)
    uu, vv = zero, zero
    for (start, count, size, ptype, axis, has_xform, block) in chunk_plan:
        in_group = hit_mask & (best_i >= start) & (best_i < start + size)
        o_sel, d_sel = (o_x, d_x) if has_xform else (o, d)
        g_point, g_normal, g_u, g_v = I._payload(ptype, axis, p9, o_sel,
                                                 d_sel, t_pay, time,
                                                 sphere_uv=_sphere_uv_poly,
                                                 tmin=tmin)
        if has_xform:
            g_point = V.affine_point(o2w_g, g_point)
            # normal transforms with (W2O)^T
            g_normal = Vec3(
                w2o_g[0][0] * g_normal.x + w2o_g[1][0] * g_normal.y
                + w2o_g[2][0] * g_normal.z,
                w2o_g[0][1] * g_normal.x + w2o_g[1][1] * g_normal.y
                + w2o_g[2][1] * g_normal.z,
                w2o_g[0][2] * g_normal.x + w2o_g[1][2] * g_normal.y
                + w2o_g[2][2] * g_normal.z,
            )
        point = V.where(in_group, g_point, point)
        normal = V.where(in_group, g_normal, normal)
        uu = jnp.where(in_group, g_u, uu)
        vv = jnp.where(in_group, g_v, vv)
    normal = normal.normalized()
    return best_t, best_i, best_props, point, normal, uu, vv


def _write_hit(of_ref, oi_ref, best_t, best_i, best_props, point, normal,
               uu, vv, extra_f32=()):
    f32_rows = [best_t,
                point.x, point.y, point.z,
                normal.x, normal.y, normal.z,
                uu, vv,
                best_props[_FUZZ], best_props[_ETA], best_props[_SCALE],
                best_props[_RGB[0]], best_props[_RGB[1]], best_props[_RGB[2]],
                best_props[_ODD[0]], best_props[_ODD[1]], best_props[_ODD[2]],
                best_props[_EVEN[0]], best_props[_EVEN[1]],
                best_props[_EVEN[2]]] + list(extra_f32)
    of_ref[:, :] = jnp.stack(f32_rows, axis=0)
    i32_rows = [best_i,
                best_props[_MAT].astype(jnp.int32),
                best_props[_TEXT].astype(jnp.int32),
                best_props[_IMG].astype(jnp.int32),
                best_props[_MID].astype(jnp.int32)]
    oi_ref[:, :] = jnp.stack(i32_rows, axis=0)


def _make_ctx(chunk_plan, stream, props_ref, stream_refs) -> _StreamCtx:
    if not stream:
        return _StreamCtx(props_ref, None, None, None, {}, False)
    resid_ref, sup_ref, sem_ref = stream_refs
    _, bases, _ = _stream_plan(chunk_plan)
    return _StreamCtx(props_ref, resid_ref, sup_ref, sem_ref, bases, True)


def _kernel_body(chunk_plan, vol_slots, any_xform, n_vol, tmin, stream,
                 rays_ref, vu_ref, props_ref, aabb_ref, of_ref, oi_ref,
                 bt_ref, bi_ref, bp_ref, nm_ref, *stream_refs):
    """One ray tile against the whole scene (see _nearest_hit)."""
    o = Vec3(rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
    d = Vec3(rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
    time = rays_ref[6, :]
    tmax = rays_ref[7, :]
    ctx = _make_ctx(chunk_plan, stream, props_ref, stream_refs)
    res = _nearest_hit(chunk_plan, vol_slots, any_xform, tmin,
                       o, d, time, tmax, vu_ref, 0, ctx, aabb_ref,
                       bt_ref, bi_ref, bp_ref, nm_ref)
    _write_hit(of_ref, oi_ref, *res)


_NF32 = 21
_NI32 = 5


def _plan_key(scene: S.Scene):
    return (scene.chunk_plan, scene.vol_slots_static, scene.n_vol)


def _stream_scratch(chunk_plan, kdim, stream):
    """Extra scratch allocations of streaming mode (see _StreamCtx).
    Widths are lane-padded to match the HBM table's physical layout —
    DMA destinations must mirror the 128-wide source slices."""
    if not stream:
        return []
    resid_rows, _, sup_rows = _stream_plan(chunk_plan)
    kp = -(-kdim // _LANE) * _LANE
    return [
        pltpu.VMEM((resid_rows, kp), jnp.float32),     # resident groups
        pltpu.VMEM((sup_rows, kp), jnp.float32),       # current super
        pltpu.SemaphoreType.DMA(()),
    ]


@functools.lru_cache(maxsize=64)
def _make_tracer(chunk_plan, vol_slots, n_vol, tmin, any_xform, n_tiles,
                 kdim, two_level_min, tile, stream):
    # two_level_min is in the cache key so mutating the module global
    # (tools/stress_scale.py --flat, test monkeypatches) can never pair a
    # cached kernel with an AABB table built under a different setting
    del two_level_min          # read via the global at trace time
    kern = functools.partial(_kernel_body, chunk_plan, vol_slots,
                             any_xform, n_vol, tmin, stream)
    props_space = pl.ANY if stream else pltpu.VMEM
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_vol, 1), tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=props_space),  # props, whole table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # block AABBs
        ],
        out_specs=(
            pl.BlockSpec((_NF32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NI32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),     # best t
            pltpu.VMEM((1, tile), jnp.int32),       # best prim
            pltpu.VMEM((kdim, tile), jnp.float32),  # best props
            pltpu.VMEM((_max_dyn_blocks(chunk_plan), tile),
                       jnp.float32),                # block near matrix
        ] + _stream_scratch(chunk_plan, kdim, stream),
    )

    def run(rays, vol_u, props, aabbs):
        n = rays.shape[1]
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((_NF32, n), jnp.float32),
                       jax.ShapeDtypeStruct((_NI32, n), jnp.int32)),
        )(rays, vol_u, props, aabbs)

    return run


def _pad_tile(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(x, pad)


# Per-scene ray-tile size (VERDICT r4 item 3).  Measured on chip (round 4
# TILE sweep, docs/ROADMAP.md): scene 1 (712 prims, procedural textures
# only) prefers 2048-4096 (22.3 -> 23.9/24.2 Mrays/s) while scenes 2/4
# (atlas textures) and the mega tier prefer 1024.  The mega kernel keeps
# its own TILE import (1024).  Override for experiments via _TILE_OVERRIDE
# (in the kernel cache key through the `tile` argument).
_TILE_OVERRIDE = None


def _pick_tile(scene: S.Scene) -> int:
    if _TILE_OVERRIDE is not None:
        return _TILE_OVERRIDE
    if any(_two_level(e) for e in scene.chunk_plan):
        return TILE          # stress tier measured at 1024 (scaling.json)
    # Atlas scenes with MANY blocks keep 1024 (scene 4: 12.49 @1024 vs
    # 12.15 @2048 under stoch565); small-plan scenes prefer 2048 whether
    # atlas-free (scene 1: 22.3 -> 23.7, round-4 sweep) or atlas-bearing
    # now that stoch565 halved the gather share (scene 2: 19.08 -> 19.51).
    n_blocks = sum(e[2] // e[6] for e in scene.chunk_plan)
    if n_blocks <= 12:
        return 2 * TILE
    if bool(scene.tex_present[S.TEX_IMAGE]) or bool(
            scene.tex_present[S.TEX_NOISE]):
        return TILE
    return 2 * TILE


def trace_pallas(scene: S.Scene, o: Vec3, d: Vec3, tmin, tmax, time, vol_u):
    """Full-scene nearest-hit + shading record, Pallas backend.

    Same contract as ops/intersect.intersect_scene + a ShadeRec (the jnp
    path's equivalent is gather_shade in ops/shading.py)."""
    n = o.x.shape[0]
    tile = _pick_tile(scene)
    n_pad = -(-n // tile) * tile
    any_xform = any(e[5] for e in scene.chunk_plan)

    tmax_p = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, time, tmax_p], axis=0)
    rays = _pad_tile(rays, n_pad)
    vu = _pad_tile(vol_u, n_pad)
    props = build_props(scene, any_xform)
    stream = _props_stream(scene.chunk_plan, props.shape[1])
    if stream:
        props = _pad_props_guard(props, scene.chunk_plan)

    run = _make_tracer(scene.chunk_plan, scene.vol_slots_static, scene.n_vol,
                       float(tmin), any_xform, n_pad // tile, props.shape[1],
                       _TWO_LEVEL_MIN, tile, stream)
    f32, i32 = run(rays, vu, props, augment_aabbs(scene))
    return _unpack_hit(f32, i32, n)


_LANE = 128      # Mosaic lane width: HBM DMA slices must be 128-aligned


def _pad_props_guard(props, chunk_plan):
    """Streaming-mode table padding: (a) guard rows after the table so a
    partial LAST super's fixed-size per-super DMA (_sup_dma) stays in
    bounds (pad blocks are never visited — inverted AABBs — so the rows'
    content is never read); (b) columns padded to the 128-lane tile,
    because Mosaic requires HBM DMA slices lane-aligned and lays the HBM
    buffer out 128-wide regardless (the pad costs no real memory).  The
    kernels keep their winner-record scratch at the REAL column count and
    read padded refs with explicit 0:K slices."""
    _, _, sup_rows = _stream_plan(chunk_plan)
    kpad = -props.shape[1] % _LANE
    return jnp.pad(props, ((0, sup_rows), (0, kpad)))


def _unpack_hit(f32, i32, n):
    f32 = f32[:, :n]
    i32 = i32[:, :n]

    prim = i32[0]
    hit_mask = prim >= 0
    hit = I.Hit(t=f32[0], prim_idx=prim,
                mat_id=jnp.where(hit_mask, i32[4], 0),
                point=Vec3(f32[1], f32[2], f32[3]),
                normal=Vec3(f32[4], f32[5], f32[6]),
                u=f32[7], v=f32[8])
    shade = ShadeRec(
        mat_type=jnp.where(hit_mask, i32[1], 0),
        fuzz=f32[9], eta=f32[10],
        tex_type=i32[2], scale=f32[11], image_id=i32[3],
        rgb=Vec3(f32[12], f32[13], f32[14]),
        odd=Vec3(f32[15], f32[16], f32[17]),
        even=Vec3(f32[18], f32[19], f32[20]),
    )
    return hit, shade


# ---------------------------------------------------------------------------
# Occlusion kernel: boolean any-hit sweep (no payload, no winner tracking)
# ---------------------------------------------------------------------------

def _occl_sweep(chunk_plan, vol_slots, tmin, o, d, time, tmax, vu_ref,
                vu_base, ctx, aabb_ref, occ_ref, nm_ref, want=None):
    """Any-hit sweep into occ_ref[0, :] (1.0 = occluded); blocks whose AABB
    no still-unoccluded wanting ray in the tile can reach are skipped (which
    also early-exits once the whole tile is resolved).  Large groups run the
    dynamic near-ordered traversal (_dyn_occl)."""
    n = o.x.shape[0]
    occ_ref[:, :] = jnp.zeros((1, n), jnp.float32)
    if ctx.stream:
        _load_resident(ctx, chunk_plan)

    culls = _use_block_culls(chunk_plan)
    sup_off = _super_offsets(chunk_plan)
    blk_id = 0
    for ei, entry in enumerate(chunk_plan):
        start, count, size, ptype, axis, has_xform, block = entry
        if _is_dynamic(entry):
            _dyn_occl(entry, ei, blk_id, sup_off.get(ei), ctx, aabb_ref,
                      nm_ref, occ_ref, o, d, time, tmax, tmin, want)
            blk_id += size // block
            continue
        s_ref, s_off = _flat_src(ctx, ei, entry)
        for b0 in range(start, start + size, block):
            bid = blk_id
            blk_id += 1

            def run_block(entry=entry, b0=b0, s_ref=s_ref, s_off=s_off):
                t, _C = _block_test(s_ref, vu_ref, vol_slots, entry, b0,
                                    o, d, tmin, tmax, time, vu_base,
                                    row_off=s_off)
                hit_any = jnp.max((t < BIG).astype(jnp.float32), axis=0)
                occ_ref[0, :] = jnp.maximum(occ_ref[0, :], hit_any)

            if culls:
                pending = occ_ref[0, :] < 0.5
                if want is not None:
                    pending = pending & want
                active = pending & _block_active(
                    aabb_ref, bid, o, d, tmin, tmax,
                    jnp.full((n,), BIG, jnp.float32))
                pl.when(jnp.any(active))(run_block)
            else:
                run_block()


def _occl_body(chunk_plan, vol_slots, n_vol, tmin, stream, rays_ref, vu_ref,
               props_ref, aabb_ref, out_ref, nm_ref, *stream_refs):
    o = Vec3(rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
    d = Vec3(rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
    time = rays_ref[6, :]
    tmax = rays_ref[7, :]
    ctx = _make_ctx(chunk_plan, stream, props_ref, stream_refs)
    _occl_sweep(chunk_plan, vol_slots, tmin, o, d, time, tmax, vu_ref, 0,
                ctx, aabb_ref, out_ref, nm_ref)


@functools.lru_cache(maxsize=64)
def _make_occluder(chunk_plan, vol_slots, n_vol, tmin, any_xform, n_tiles,
                   kdim, two_level_min, tile, stream):
    del two_level_min          # cache-key only (see _make_tracer)
    kern = functools.partial(_occl_body, chunk_plan, vol_slots, n_vol, tmin,
                             stream)
    props_space = pl.ANY if stream else pltpu.VMEM
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_vol, 1), tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=props_space),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # block AABBs
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_max_dyn_blocks(chunk_plan), tile),
                       jnp.float32),                # block near matrix
        ] + _stream_scratch(chunk_plan, kdim, stream),
    )

    def run(rays, vol_u, props, aabbs):
        n = rays.shape[1]
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(rays, vol_u, props, aabbs)

    return run


def occluded_pallas(scene: S.Scene, o: Vec3, d: Vec3, tmin, tmax, time,
                    vol_u):
    n = o.x.shape[0]
    tile = _pick_tile(scene)
    n_pad = -(-n // tile) * tile
    any_xform = any(e[5] for e in scene.chunk_plan)
    tmax_p = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, time, tmax_p], axis=0)
    rays = _pad_tile(rays, n_pad)
    vu = _pad_tile(vol_u, n_pad)
    props = build_props(scene, any_xform)
    stream = _props_stream(scene.chunk_plan, props.shape[1])
    if stream:
        props = _pad_props_guard(props, scene.chunk_plan)
    run = _make_occluder(scene.chunk_plan, scene.vol_slots_static,
                         scene.n_vol, float(tmin), any_xform, n_pad // tile,
                         props.shape[1], _TWO_LEVEL_MIN, tile, stream)
    occ = run(rays, vu, props, augment_aabbs(scene))
    return occ[0, :n] > 0.5
