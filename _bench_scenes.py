import time, jax, numpy as np
import rtw_tpu as rt

for sid, nx, ny, spp in [(5, 400, 224, 64), (1, 800, 400, 16), (2, 800, 400, 16), (3, 400, 400, 32), (4, 800, 400, 8)]:
    cfg = rt.RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=20, scene_id=sid)
    scene = rt.build_scene(sid, nx, ny)
    print(f"scene {sid}: prims={scene.prims.count} groups={len(scene.chunk_plan)}", flush=True)
    rt.render(scene, cfg)  # warm (identical cfg)
    m = {}
    img = rt.render(scene, cfg, metrics=m)
    assert np.isfinite(np.asarray(img)).all()
    print(f"  {m['mrays_per_sec']:8.2f} Mrays/s  {m['samples_per_sec']/1e6:6.2f} Msamples/s  wall {m['wall_seconds']:.2f}s", flush=True)
