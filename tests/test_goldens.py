"""Scene-level statistical goldens: small deterministic renders of every
registered scene must keep their channel means.  Guards the whole estimator
(geometry, materials, textures, NEE/MIS, RR, RNG discipline) against silent
regressions; tolerances absorb backend fp reassociation, not estimator
changes.  Regenerate EXPECTED with `python tests/test_goldens.py` after an
intentional estimator change and explain the change in the commit."""

import numpy as np
import pytest

import rtw_tpu as rt

CFG = dict(nx=64, ny=48, spp=32, max_depth=10, seed=0)

# channel means per scene, generated on the CPU backend
EXPECTED = {
    0: [0.139198, 0.124440, 0.113935],
    1: [0.331535, 0.377647, 0.476739],
    2: [0.161136, 0.156421, 0.164662],
    3: [0.477820, 0.486974, 0.525290],
    4: [0.357413, 0.377793, 0.358145],
    5: [0.371871, 0.457955, 0.107648],
}


@pytest.mark.parametrize("sid", sorted(EXPECTED))
def test_scene_channel_means(sid):
    cfg = rt.RenderConfig(scene_id=sid, **CFG)
    img = np.asarray(rt.render(rt.build_scene(sid, cfg.nx, cfg.ny), cfg))
    assert np.isfinite(img).all()
    got = img.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(got, EXPECTED[sid], rtol=0.02, atol=0.003)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    for sid in sorted(EXPECTED):
        cfg = rt.RenderConfig(scene_id=sid, **CFG)
        img = np.asarray(rt.render(rt.build_scene(sid, cfg.nx, cfg.ny), cfg))
        m = img.reshape(-1, 3).mean(axis=0)
        print(f"    {sid}: [{m[0]:.6f}, {m[1]:.6f}, {m[2]:.6f}],")
