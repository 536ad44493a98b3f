"""Top-level render driver: spp accumulation, ray tiling, image assembly.

Replaces Director::renderFrame + printPPM (Director.cpp:971-1031), restoring
the books' true multi-sample estimator: `spp` is a live accumulation loop
(the reference traces 1 spp and denoises, raygen.cu:133-147 — SURVEY §7.4
quirk 1; we do not port the closed OptiX NN denoiser, §5).

Gamma is applied only at image write, on the converged linear accumulator
(the reference applies sqrt per 1-spp frame *before* denoising, quirk 12).
"""

from __future__ import annotations

import functools
import math
import time as _time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rtw_tpu.integrator import trace_paths
from rtw_tpu.utils import rng as R


@functools.partial(jax.jit, static_argnums=(1, 4), donate_argnums=(5,))
def _render_tile(scene, cfg, pixel_idx, key, n_samples, accum, s0):
    """Accumulate `n_samples` samples (starting at index s0) for one tile."""
    def body(i, acc):
        return acc + trace_paths(scene, cfg, pixel_idx, s0 + i, key)

    return lax.fori_loop(0, n_samples, body, accum)


def render(scene, cfg, key=None, verbose: bool = False, metrics: dict | None = None):
    """Render and return the *linear* [ny, nx, 3] float32 image (row 0 at the
    bottom, i.e. t=0 — the reference's frame-buffer convention,
    raygen.cu:156-158)."""
    if key is None:
        key = R.base_key(cfg.seed)

    npix = cfg.num_pixels
    batch = cfg.resolved_ray_batch()
    chunk = cfg.resolved_spp_chunk()
    n_tiles = math.ceil(npix / batch)
    pad = n_tiles * batch - npix
    pixel_idx = jnp.arange(npix + pad, dtype=jnp.int32)
    if pad:
        pixel_idx = pixel_idx.at[npix:].set(0)  # padded lanes recompute pixel 0

    t_start = _time.perf_counter()
    tiles_out = []
    for ti in range(n_tiles):
        tile_pix = lax.dynamic_slice_in_dim(pixel_idx, ti * batch, batch)
        accum = jnp.zeros((batch, 3), jnp.float32)
        s0 = 0
        while s0 < cfg.spp:
            ns = min(chunk, cfg.spp - s0)
            accum = _render_tile(scene, cfg, tile_pix, key, ns,
                                 accum, jnp.asarray(s0, jnp.int32))
            s0 += ns
        tiles_out.append(accum)
        if verbose:
            jax.block_until_ready(accum)
            done = min((ti + 1) * batch, npix)
            print(f"INFO: tile {ti + 1}/{n_tiles} done "
                  f"({done}/{npix} pixels, {cfg.spp} spp)", flush=True)

    img = jnp.concatenate(tiles_out, axis=0)[:npix] / np.float32(cfg.spp)
    img = jax.block_until_ready(img)
    elapsed = _time.perf_counter() - t_start

    if metrics is not None:
        n_paths = npix * cfg.spp
        metrics.update(
            wall_seconds=elapsed,
            pixels=npix,
            spp=cfg.spp,
            paths=n_paths,
            samples_per_sec=n_paths / elapsed,
        )

    return img.reshape(cfg.ny, cfg.nx, 3)


def to_srgb8(linear_img, gamma: float = 2.0):
    """Clamp + gamma -> uint8, top row first (printPPM writes bottom-up from
    a bottom-origin buffer, Director.cpp:1014-1029 — same final orientation)."""
    img = np.asarray(linear_img)
    img = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    img = (img * 255.99).astype(np.uint8)
    return img[::-1]  # flip to top-row-first image convention


def render_image(scene, cfg, key=None, verbose=False, metrics=None):
    """Render to a gamma-corrected uint8 [ny, nx, 3] image (top row first)."""
    return to_srgb8(render(scene, cfg, key, verbose, metrics), cfg.gamma)
