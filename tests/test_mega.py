"""Whole-bounce megakernel equivalence (ops/mega_kernel.py).

Interpreter-mode runs on CPU so the suite covers the fused kernel's full
estimator logic — trace, all material branches, NEE + MIS, RR, sample
accumulation and in-kernel ray regeneration — against the pure-JAX
reference scheduler (trace_wavefront_regen), which draws the identical
fast-RNG uniform chain.  In interpret mode the transcendentals are exact
XLA ops, so agreement is tight; on real TPU hardware sin/cos/log are
~1e-6 approximations and parity is statistical (covered by the on-chip
bench assertions + goldens, not here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import rtw_tpu as rt
from rtw_tpu.integrator import (trace_wavefront_mega, trace_wavefront_regen,
                                _mega_backend)
from rtw_tpu.utils import rng as R


@pytest.mark.parametrize("sid", [0, 3, 5])
def test_mega_matches_regen(sid):
    """Scenes spanning the megakernel's feature envelope: Cornell (light +
    NEE + MIS + metal box + glass), Cornell volumes (isotropic media,
    free-flight sampling), three-sphere (sky miss, checker ground,
    dielectric)."""
    nx, ny = 48, 24
    cfg = rt.RenderConfig(nx=nx, ny=ny, spp=3, max_depth=6, scene_id=sid,
                          seed=9)
    scene = rt.build_scene(sid, nx, ny)
    pix = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    key = R.base_key(cfg.seed)

    ref, ref_rays, _ = jax.jit(
        lambda: trace_wavefront_regen(scene, cfg, pix, key, 0, cfg.spp))()
    with pltpu.force_tpu_interpret_mode():
        got, rays, _ = jax.jit(
            lambda: trace_wavefront_mega(scene, cfg, pix, key, 0, cfg.spp))()

    a = np.stack([np.asarray(c) for c in ref])
    b = np.stack([np.asarray(c) for c in got])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)
    # ray accounting agrees exactly (same paths, same NEE activations)
    assert float(rays) == pytest.approx(float(ref_rays), rel=1e-6)


def test_mega_backend_gating():
    """Auto-selection: only small constant/checker-texture fast-RNG scenes
    on real TPU; everything else keeps its measured-best path."""
    cfg = rt.RenderConfig(nx=8, ny=8, spp=1)
    s0 = rt.build_scene(0, 8, 8)
    s2 = rt.build_scene(2, 8, 8)     # earth/marble textures -> excluded
    on_tpu = jax.default_backend() == "tpu"
    assert _mega_backend(cfg, s0) == on_tpu
    assert not _mega_backend(cfg, s2)
    import dataclasses
    assert not _mega_backend(dataclasses.replace(cfg, rng="threefry"), s0)
    assert not _mega_backend(dataclasses.replace(cfg, differentiable=True),
                             s0)
    assert not _mega_backend(dataclasses.replace(cfg, bounce_stats=True), s0)
    # forcing the backend validates the feature envelope loudly (under
    # interpret mode here — on plain CPU the validator itself must refuse)
    with pltpu.force_tpu_interpret_mode():
        assert _mega_backend(dataclasses.replace(cfg, backend="mega"), s0)
        with pytest.raises(ValueError, match="noise/image"):
            _mega_backend(dataclasses.replace(cfg, backend="mega"), s2)
    if not on_tpu:
        with pytest.raises(ValueError, match="needs a TPU"):
            _mega_backend(dataclasses.replace(cfg, backend="mega"), s0)
    # a forced megakernel with a contradicting explicit scheduler is an
    # error, not a silent fallthrough to the auto heuristic
    from rtw_tpu.integrator import trace_wavefront
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="scheduler"):
        trace_wavefront(s0, dataclasses.replace(cfg, backend="mega",
                                                scheduler="queue"),
                        jnp.arange(64, dtype=jnp.int32), R.base_key(0), 0, 1)


def test_mega_step_on_two_level_scene(monkeypatch):
    """Forced backend='mega' on a scene whose plan has two-level groups
    must not read past the AABB table: mega_step now passes the augmented
    (super-row) table like the split kernels do (round-4 review finding —
    previously an out-of-bounds read deep in Pallas)."""
    from rtw_tpu.ops import mega_kernel as MK
    from rtw_tpu.ops import trace_kernel as TK
    from tests.test_trace_kernel import _huge_prim_scene

    monkeypatch.setattr(TK, "_TWO_LEVEL_MIN", 32)
    scene = _huge_prim_scene(2500)
    assert any(TK._two_level(e) for e in scene.chunk_plan)
    cfg = rt.RenderConfig(nx=32, ny=32, spp=1, max_depth=2, backend="mega")
    key = R.base_key(0)

    n = MK.TILE
    sf = jnp.zeros((MK.NF, n), jnp.float32).at[MK.F_PPDF, :].set(1.0)
    si = jnp.zeros((MK.NI, n), jnp.int32)
    si = si.at[MK.I_PIXEL, :].set(jnp.arange(n, dtype=jnp.int32)
                                  % cfg.num_pixels)
    parf, pari = MK.mega_params(scene, key, cfg)
    pari = pari.at[0, MK.PI_SEND].set(1)
    with pltpu.force_tpu_interpret_mode():
        sf2, si2, rays = MK.mega_step(scene, cfg, sf, si, parf, pari)
    assert np.isfinite(np.asarray(sf2)).all()
    assert float(jnp.sum(rays)) > 0


@pytest.mark.parametrize("sid", [0, 1])
def test_qmega_matches_queue(sid):
    """The HYBRID scheduler (queue claims in XLA + whole-bounce kernel,
    trace_wavefront_qmega) must produce the queue scheduler's image.
    Scene 0 exercises in-kernel NEE/occlusion under hybrid flushing;
    scene 1 exercises the big-scene dynamic walk + checker + sky plus
    ~50% pad lanes (1152 lanes -> one 2048 tile).  Per-item sums
    reassociate with claim order, hence atol instead of bitwise."""
    from rtw_tpu.integrator import trace_wavefront_qmega, trace_wavefront_queue

    nx, ny = 48, 24
    cfg = rt.RenderConfig(nx=nx, ny=ny, spp=3, max_depth=6, scene_id=sid,
                          seed=5)
    scene = rt.build_scene(sid, nx, ny)
    pix = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    key = R.base_key(cfg.seed)

    ref, ref_rays, _ = jax.jit(
        lambda: trace_wavefront_queue(scene, cfg, pix, key, 0, cfg.spp))()
    with pltpu.force_tpu_interpret_mode():
        got, rays, _ = jax.jit(
            lambda: trace_wavefront_qmega(scene, cfg, pix, key, 0,
                                          cfg.spp))()

    a = np.stack([np.asarray(c) for c in ref])
    b = np.stack([np.asarray(c) for c in got])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=3e-4, rtol=3e-4)
    assert float(rays) == pytest.approx(float(ref_rays), rel=1e-6)
