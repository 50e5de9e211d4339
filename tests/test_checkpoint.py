"""Checkpoint/resume of long renders (SURVEY §5): per-chunk accumulator
state + cursor persist across interruption, and a resumed render reproduces
the uninterrupted image bit-exactly."""
import os

import numpy as np

from rustray_tpu.config import EngineConfig
from rustray_tpu.models.procedural import demo_spheres_scene
from rustray_tpu.render.wavefront import render


def test_kill_and_resume_bit_exact(tmp_path):
    scene = demo_spheres_scene(64, 48)
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    cfg.samples = 2
    eng = EngineConfig(chunk_pixels=1024)   # 3 chunks
    ckpt = str(tmp_path / "render.ckpt.npz")

    full = render(sa, static, cfg, eng)

    # "kill" after one chunk: the checkpoint must exist and hold the cursor
    part = render(sa, static, cfg, eng, checkpoint_path=ckpt, max_chunks=1)
    assert os.path.exists(ckpt)
    z = np.load(ckpt)
    assert int(z["cursor"]) == 1024

    # resume: completes the frame and removes the checkpoint
    resumed = render(sa, static, cfg, eng, checkpoint_path=ckpt)
    assert not os.path.exists(ckpt)
    np.testing.assert_array_equal(resumed["color"], full["color"])
    np.testing.assert_array_equal(resumed["depth"], full["depth"])
    np.testing.assert_array_equal(resumed["normal"], full["normal"])
    np.testing.assert_array_equal(resumed["object_id"], full["object_id"])
    np.testing.assert_array_equal(resumed["image"], full["image"])
    assert resumed["device_rays"] == full["device_rays"]


def test_mismatched_checkpoint_ignored(tmp_path):
    scene = demo_spheres_scene(32, 24)
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    eng = EngineConfig(chunk_pixels=512)
    ckpt = str(tmp_path / "render.ckpt.npz")

    render(sa, static, cfg, eng, checkpoint_path=ckpt, max_chunks=1)
    assert os.path.exists(ckpt)

    # different sample count -> different fingerprint -> fresh render
    cfg2 = cfg.copy()
    cfg2.samples = 2
    full2 = render(sa, static, cfg2, eng)
    out2 = render(sa, static, cfg2, eng, checkpoint_path=ckpt)
    np.testing.assert_array_equal(out2["color"], full2["color"])
    assert not os.path.exists(ckpt)
