"""Golden-image check against the reference renderer's committed output.

Renders `scene/room-no-textures.json scene/spheres.json` (the one README
workload whose materials are deterministic enough for a structural
comparison — /root/reference/Readme.md:43-46) with rustray_tpu and compares
it against the PNG the reference renderer itself produced
(`/root/reference/data/renderings/output_2022-5-16_21-24-33_00000000.png`,
1280x720, samples=128, monte_carlo=1).

Exact pixel equality is impossible by construction — the reference's MC
jitter uses `thread_rng` (nondeterministic, src/raytracing.rs:616-618), its
sample count differs from ours, and our oracle documents two deliberate
shadow-path deviations (rustray_tpu/oracle.py:12-14) — so the comparison is
*structural*: mean-luma agreement and a windowed SSIM over the downscaled
images.  This closes the "is the oracle itself right?" loop (VERDICT r3
item 7): all parity tests compare against our own oracle; this tool
compares against the actual Rust renderer's output.

Usage: python tools/golden_check.py [WxH] [samples]   (default 320x180 4)
Prints one JSON line: {"ssim": ..., "mean_dluma": ..., "pass": ...}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = "/root/reference/data/renderings/output_2022-5-16_21-24-33_00000000.png"
SCENES = ["/root/reference/scene/room-no-textures.json",
          "/root/reference/scene/spheres.json"]


def _downscale(img, w, h):
    import numpy as np
    H, W = img.shape[:2]
    ys = (np.arange(h) * (H / h)).astype(int)
    xs = (np.arange(w) * (W / w)).astype(int)
    # box filter via cumulative mean over the bin
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


def main():
    import numpy as np
    from PIL import Image
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.render.wavefront import render
    from rustray_tpu.scene.scene import Scene

    res = sys.argv[1] if len(sys.argv) > 1 else "320x180"
    W, H = (int(v) for v in res.split("x"))
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    scene = Scene()
    for p in SCENES:
        scene.load(p)
    scene.cam.init(W, H)
    scene.raytracing_config.samples = samples
    scene.raytracing_config.monte_carlo = True
    scene.init()
    scene.update()
    sa, static = scene.compile()
    out = render(sa, static, scene.raytracing_config, EngineConfig())
    ours = out["color"].astype(np.float64)

    gold = np.asarray(Image.open(GOLDEN).convert("RGB"), np.float64) / 255.0
    gold_s = _downscale(gold, W, H)

    luma = lambda x: x @ np.array([0.299, 0.587, 0.114])
    la, lb = luma(ours), luma(gold_s)
    s = ssim(la, lb)
    dm = float(abs(la.mean() - lb.mean()))
    ok = s >= 0.5 and dm <= 0.1
    print(json.dumps({"ssim": round(s, 4), "mean_dluma": round(dm, 4),
                      "res": res, "samples": samples, "pass": ok,
                      "golden": os.path.basename(GOLDEN)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
