"""Multi-process distributed rendering (SURVEY §4 tier 5).

Spawns 2 local processes that bootstrap over jax.distributed
(mesh.init_distributed -> coordinator on localhost), render scene 5
pixel-sharded across the 2-process global mesh, and asserts the image is
bit-identical to the in-process single-device render — the RNG is keyed by
logical (pixel, sample) only, so process/device topology must not change
the estimator."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import rtw_tpu as rt

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single():
    port = _free_port()
    out = os.path.join(os.path.dirname(__file__), "_dist_img.npy")
    if os.path.exists(out):
        os.remove(out)

    env = dict(os.environ)
    # workers manage their own platform/device config; drop the test
    # session's 8-virtual-device forcing
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]
    assert os.path.exists(out), "worker 0 wrote no image"

    img_dist = np.load(out)
    os.remove(out)

    cfg = rt.RenderConfig(nx=32, ny=24, spp=4, max_depth=6, scene_id=5,
                          backend="jnp", scheduler="regen")
    img_single = np.asarray(rt.render(rt.build_scene(5, cfg.nx, cfg.ny), cfg))
    np.testing.assert_array_equal(img_dist, img_single)
