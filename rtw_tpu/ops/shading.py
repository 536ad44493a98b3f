"""Shading-record resolution shared by both trace backends.

`ShadeRec` (ops/trace_kernel.py) carries the winning primitive's flattened
material/texture inputs.  The Pallas kernel produces it in-VMEM; the pure-JAX
path builds it here with per-prim 1-D gathers (`gather_shade`).  Albedo
resolution (`resolve_albedo`) then applies the procedural texture kinds on
top of the constant color — the lockstep equivalent of the reference's
texture direct-callable dispatch (texture/*.cu via closehit.cu:64-67).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from rtw_tpu.models import scene as S
from rtw_tpu.ops import vec as V
from rtw_tpu.ops.vec import Vec3
from rtw_tpu.ops.trace_kernel import ShadeRec
from rtw_tpu.ops.textures import _image_bilinear, _image_bilinear_565, turbulence


def gather_shade(scene: S.Scene, prim_idx, hit_mask) -> ShadeRec:
    """ShadeRec via per-prim column gathers (pure-JAX / differentiable path).

    Texture colors are gathered through Textures.color so gradients and
    apply_params updates flow (prim -> static tex row -> traced color)."""
    pr = scene.prims
    sp = jnp.maximum(prim_idx, 0)
    col = scene.textures.color

    def color_via(idx_col):
        rows = idx_col[sp]
        return Vec3(col[:, 0][rows], col[:, 1][rows], col[:, 2][rows])

    return ShadeRec(
        mat_type=jnp.where(hit_mask, pr.mat_type_p[sp], 0),
        fuzz=pr.fuzz_p[sp],
        eta=pr.eta_p[sp],
        tex_type=pr.tex_type_p[sp],
        scale=pr.scale_p[sp],
        image_id=pr.image_id_p[sp],
        rgb=color_via(pr.tex_idx),
        odd=color_via(pr.odd_idx),
        even=color_via(pr.even_idx),
    )


def resolve_albedo(scene: S.Scene, shade: ShadeRec, p: Vec3, u, v,
                   tex_filter: str = "rgb565") -> Vec3:
    """Final albedo from the shading record + procedural texture kinds.

    Static `scene.tex_present` flags keep unreachable texture code out of
    the compiled program.  Checker children are constant colors (builder
    enforces one nesting level; book-correct sines product, QUIRKS #10)."""
    present = scene.tex_present
    albedo = shade.rgb

    if present[S.TEX_CHECKER]:
        sines = (jnp.sin(10.0 * p.x) * jnp.sin(10.0 * p.y)
                 * jnp.sin(10.0 * p.z))
        checker = V.where(sines < 0.0, shade.odd, shade.even)
        albedo = V.where(shade.tex_type == S.TEX_CHECKER, checker, albedo)

    # Noise and image evaluation run lockstep for EVERY lane (7-octave hash
    # turbulence ~300 VPU ops; a bilinear fetch is 4 flat gathers ~46 ms per
    # 1M lanes) — but only the small fraction of lanes that hit the marble /
    # earth spheres consume them.  lax.cond skips the whole block on bounces
    # where no lane needs it (deep bounces, shadow-dominated wavefronts),
    # the wavefront analog of OptiX only running the callables SBT records
    # reference (texture/*.cu dispatch).
    if present[S.TEX_NOISE]:
        need = shade.tex_type == S.TEX_NOISE

        def _with_noise(albedo):
            m = 0.5 * (1.0 + jnp.sin(shade.scale * p.z
                                     + 5.0 * turbulence(scene.textures,
                                                        p * shade.scale)))
            return V.where(need, Vec3(m, m, m), albedo)

        albedo = lax.cond(jnp.any(need), _with_noise, lambda a: a, albedo)

    if present[S.TEX_IMAGE]:
        need = shade.tex_type == S.TEX_IMAGE
        fetch = (_image_bilinear_565 if tex_filter == "rgb565"
                 else _image_bilinear)

        def _with_image(albedo):
            img = fetch(scene.textures, shade.image_id, u, v)
            return V.where(need, img, albedo)

        albedo = lax.cond(jnp.any(need), _with_image, lambda a: a, albedo)

    return albedo
