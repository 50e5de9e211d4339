"""Golden-image checks against the reference renderer's committed outputs.

Scores every README workload whose assets are fully local (the GLB scenes
download at load time, /root/reference/src/scene.rs:471-493, and this
environment is airgapped) against the PNG the Rust renderer itself
produced (/root/reference/Readme.md:33-46):

  rooms    room-no-textures.json + spheres.json  (128 spp golden)
  monkey   floor.json + monkey.json              (32 spp golden)
  kbert    room.json + kbert.json                (64 spp golden)

Exact pixel equality is impossible by construction — the reference's MC
jitter uses `thread_rng` (nondeterministic, src/raytracing.rs:616-618), its
sample count differs from ours, and our oracle documents two deliberate
shadow-path deviations (rustray_tpu/oracle.py:12-14) — so the comparison is
*structural*: mean-luma agreement and a windowed SSIM over the downscaled
images.  This closes the "is the oracle itself right?" loop (VERDICT r3
item 7): all parity tests compare against our own oracle; this tool
compares against the actual Rust renderer's output.

Pass gates are per-scene, ~0.05-0.07 below the scores measured at
320x180 with 8 spp on the TPU (rooms 0.855 / monkey 0.980 / kbert 0.891
SSIM — VERDICT r4 #4: lock in the margin so a shading regression cannot
pass).  Needs RUSTRAY_ASSET_ROOT=/root/reference (set automatically).

Usage:
  python tools/golden_check.py [WxH] [samples] [scene ...]
(default 320x180 8, all scenes).  Prints one JSON line per scene plus a
summary line; exit 0 iff every scored scene passes.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
os.environ.setdefault("RUSTRAY_ASSET_ROOT", REF)
SCENES = {
    "rooms": dict(
        scenes=["scene/room-no-textures.json", "scene/spheres.json"],
        golden="data/renderings/output_2022-5-16_21-24-33_00000000.png",
        golden_spp=128, min_ssim=0.78, max_dluma=0.06),
    "monkey": dict(
        scenes=["scene/floor.json", "scene/monkey.json"],
        golden="data/renderings/output_2022-5-16_20-47-31_00000000.png",
        golden_spp=32, min_ssim=0.92, max_dluma=0.04),
    "kbert": dict(
        scenes=["scene/room.json", "scene/kbert.json"],
        golden="data/renderings/output_2022-5-16_15-41-8_00000000.png",
        golden_spp=64, min_ssim=0.82, max_dluma=0.05),
}


def _downscale(img, w, h):
    import numpy as np
    H, W = img.shape[:2]
    ys = (np.arange(h) * (H / h)).astype(int)
    xs = (np.arange(w) * (W / w)).astype(int)
    out = np.zeros((h, w, img.shape[2]), np.float64)
    yb = np.append(ys, H)
    xb = np.append(xs, W)
    for i in range(h):
        rows = img[yb[i]:max(yb[i + 1], yb[i] + 1)]
        for j in range(w):
            out[i, j] = rows[:, xb[j]:max(xb[j + 1], xb[j] + 1)].mean(axis=(0, 1))
    return out


def ssim(a, b, win=8, c1=0.01 ** 2, c2=0.03 ** 2):
    """Windowed SSIM on [0,1] luma images (uniform window, stride=win)."""
    import numpy as np
    h = (a.shape[0] // win) * win
    w = (a.shape[1] // win) * win
    ab = a[:h, :w].reshape(h // win, win, w // win, win)
    bb = b[:h, :w].reshape(h // win, win, w // win, win)
    mu_a = ab.mean(axis=(1, 3))
    mu_b = bb.mean(axis=(1, 3))
    var_a = ab.var(axis=(1, 3))
    var_b = bb.var(axis=(1, 3))
    cov = (ab * bb).mean(axis=(1, 3)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return float(s.mean())


def check_scene(name, spec, W, H, samples):
    import numpy as np
    from PIL import Image
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.render.wavefront import render
    from rustray_tpu.scene.scene import Scene

    scene = Scene()
    for p in spec["scenes"]:
        scene.load(os.path.join(REF, p))
    scene.cam.init(W, H)
    scene.raytracing_config.samples = samples
    scene.raytracing_config.monte_carlo = True
    scene.init()
    scene.update()
    sa, static = scene.compile()
    out = render(sa, static, scene.raytracing_config, EngineConfig())
    ours = out["color"].astype(np.float64)

    gold = np.asarray(Image.open(os.path.join(REF, spec["golden"]))
                      .convert("RGB"), np.float64) / 255.0
    gold_s = _downscale(gold, W, H)

    luma = lambda x: x @ np.array([0.299, 0.587, 0.114])
    la, lb = luma(ours), luma(gold_s)
    s = ssim(la, lb)
    dm = float(abs(la.mean() - lb.mean()))
    ok = s >= spec["min_ssim"] and dm <= spec["max_dluma"]
    print(json.dumps({"scene": name, "ssim": round(s, 4),
                      "mean_dluma": round(dm, 4), "res": f"{W}x{H}",
                      "samples": samples, "pass": ok,
                      "gate": {"min_ssim": spec["min_ssim"],
                               "max_dluma": spec["max_dluma"]},
                      "golden": os.path.basename(spec["golden"])}))
    return ok, s, dm


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "320x180"
    W, H = (int(v) for v in res.split("x"))
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    names = sys.argv[3:] or list(SCENES)
    results = {}
    for name in names:
        ok, s, dm = check_scene(name, SCENES[name], W, H, samples)
        results[name] = dict(ssim=round(s, 4), mean_dluma=round(dm, 4),
                             **{"pass": ok})
    all_ok = all(r["pass"] for r in results.values())
    print(json.dumps({"summary": results, "res": f"{W}x{H}",
                      "samples": samples, "all_pass": all_ok}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
