"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process brings up jax.distributed over a local TCP coordinator with 4
virtual CPU devices, joins the global 8-device mesh, and runs the sharded
render_loss_and_grad end-to-end — the DCN analogue of a multi-host TPU pod
(the reference has no distributed mode at all; its parallelism is a
single-host thread pool, /root/reference/src/renderer.rs:38-318).

Usage: python tests/_dist_worker.py <process_id> <num_processes> <port> <out>
"""
import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    # initialize the distributed runtime before ANYTHING can touch the XLA
    # backend (importing the package creates jax values at import time)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from rustray_tpu.models.procedural import demo_spheres_scene
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.parallel.shard import make_mesh, render_loss_and_grad
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    scene = demo_spheres_scene(16, 12)
    scene.raytracing_config.max_recursion = 2
    scene.raytracing_config.samples = 2
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    engine = EngineConfig(queue_factor=8.0)
    mesh = make_mesh(jax.devices(), sample_axis=2)
    target = np.zeros((static.height, static.width, 3), np.float32)

    loss, grads = render_loss_and_grad(sa, static, cfg, target, engine, mesh)
    if pid == 0:
        np.savez(out, loss=np.float64(float(loss)),
                 g_base=np.asarray(grads["materials"]["base_color"]),
                 g_refl=np.asarray(grads["materials"]["reflectivity"]))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
