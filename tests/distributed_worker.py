"""Subprocess worker for the multi-process distributed test (SURVEY §4 tier
5: exercise the jax.distributed DCN bootstrap with local processes).

Invoked as:  python distributed_worker.py <pid> <nproc> <port> <out.npy>
Each process contributes its (single) CPU device to a global 1-D mesh,
renders scene 5 pixel-sharded, and process 0 writes the image."""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rtw_tpu import RenderConfig, build_scene
    from rtw_tpu.parallel.mesh import (init_distributed, make_mesh,
                                       render_sharded)

    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc   # one CPU device per process

    cfg = RenderConfig(nx=32, ny=24, spp=4, max_depth=6, scene_id=5,
                       backend="jnp", scheduler="regen")
    scene = build_scene(5, cfg.nx, cfg.ny)
    img = render_sharded(scene, cfg, make_mesh())
    if pid == 0:
        import numpy as np

        np.save(out_path, np.asarray(img))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
