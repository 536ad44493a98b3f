"""Texture evaluation — masked lockstep replacement for the reference's
texture direct-callables (texture/*.cu).

All textures for a ray wavefront are evaluated branch-free: every type's
value is computed for every lane and the per-lane type id selects.  Checker
(one nesting level) gathers its children's ids and evaluates them as leaves,
mirroring the recursive optixDirectCall in checkeredTexture.cu while staying
a static two-level dataflow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rtw_tpu.models import scene as S
from rtw_tpu.ops.sampling import dot


def perlin_noise(tex: S.Textures, p):
    """Trilinear gradient Perlin noise (noiseTexture.cu:18-53), batched.

    p: [N, 3] -> [N] in [-1, 1]-ish.
    """
    pf = jnp.floor(p)
    u = p - pf
    ijk = pf.astype(jnp.int32)

    uu = u * u * (3.0 - 2.0 * u)  # hermite smooth per axis

    accum = jnp.zeros(p.shape[0], jnp.float32)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                ix = tex.perm_x[(ijk[:, 0] + di) & 255]
                iy = tex.perm_y[(ijk[:, 1] + dj) & 255]
                iz = tex.perm_z[(ijk[:, 2] + dk) & 255]
                g = tex.ranvec[ix ^ iy ^ iz]                     # [N, 3]
                weight = u - jnp.array([di, dj, dk], jnp.float32)
                w = ((di * uu[:, 0] + (1 - di) * (1.0 - uu[:, 0]))
                     * (dj * uu[:, 1] + (1 - dj) * (1.0 - uu[:, 1]))
                     * (dk * uu[:, 2] + (1 - dk) * (1.0 - uu[:, 2])))
                accum = accum + w * dot(g, weight)
    return accum


def turbulence(tex: S.Textures, p, octaves: int = 7):
    """7-octave turbulence (noiseTexture.cu:56-69)."""
    accum = jnp.zeros(p.shape[0], jnp.float32)
    weight = 1.0
    tp = p
    for _ in range(octaves):
        accum = accum + weight * perlin_noise(tex, tp)
        weight *= 0.5
        tp = tp * 2.0
    return jnp.abs(accum)


def _image_bilinear(tex: S.Textures, image_id, u, v):
    """Normalized-coordinate bilinear fetch with clamp addressing — the
    explicit form of the reference's cudaTextureObject_t setup
    (ioTexture.h:293-311: clamp, linear filter, normalized floats)."""
    hw = tex.image_dims[image_id]                 # [N, 2] (h, w)
    h = hw[:, 0].astype(jnp.float32)
    w = hw[:, 1].astype(jnp.float32)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def fetch(xi, yi):
        xi = jnp.clip(xi, 0, hw[:, 1] - 1)
        yi = jnp.clip(yi, 0, hw[:, 0] - 1)
        return tex.images[image_id, yi, xi]       # [N, 3]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = fetch(x0i, y0i)
    c10 = fetch(x0i + 1, y0i)
    c01 = fetch(x0i, y0i + 1)
    c11 = fetch(x0i + 1, y0i + 1)
    cx0 = c00 + fx[:, None] * (c10 - c00)
    cx1 = c01 + fx[:, None] * (c11 - c01)
    return cx0 + fy[:, None] * (cx1 - cx0)


def _eval_leaf(tex: S.Textures, tex_id, u, v, p):
    """Evaluate non-checker textures for per-lane ids. [N] -> [N, 3]."""
    ttype = tex.tex_type[tex_id]
    out = jnp.zeros((tex_id.shape[0], 3), jnp.float32)

    # constant (constantTexture.cu)
    out = jnp.where((ttype == S.TEX_CONSTANT)[:, None], tex.color[tex_id], out)

    # noise: marble = 0.5 * (1 + sin(scale*z + 5*turb(scale*p)))
    # (noiseTexture.cu:72-83)
    scale = tex.scale[tex_id]
    marble = 0.5 * (1.0 + jnp.sin(scale * p[:, 2]
                                  + 5.0 * turbulence(tex, scale[:, None] * p)))
    out = jnp.where((ttype == S.TEX_NOISE)[:, None], marble[:, None], out)

    # image (imageTexture.cu)
    img = _image_bilinear(tex, jnp.maximum(tex.image_id[tex_id], 0), u, v)
    out = jnp.where((ttype == S.TEX_IMAGE)[:, None], img, out)

    # null -> zeros (nullTexture.cu); already the default
    return out


def eval_texture(tex: S.Textures, tex_id, u, v, p):
    """Full texture evaluation with one checker nesting level.

    tex_id: int32 [N]; u, v: [N]; p: [N, 3] world hit point.

    Checker uses the book-correct sines product sin(10x)sin(10y)sin(10z);
    the reference's `sinf(10.f - p.y)` is a typo (checkeredTexture.cu:10,
    SURVEY §7.4 quirk 10) and no live scene instantiates a checker.
    """
    ttype = tex.tex_type[tex_id]
    is_checker = ttype == S.TEX_CHECKER

    sines = (jnp.sin(10.0 * p[:, 0]) * jnp.sin(10.0 * p[:, 1])
             * jnp.sin(10.0 * p[:, 2]))
    child = jnp.where(sines < 0.0, tex.odd[tex_id], tex.even[tex_id])
    leaf_id = jnp.where(is_checker, child, tex_id)
    return _eval_leaf(tex, leaf_id, u, v, p)
