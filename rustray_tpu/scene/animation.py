"""Keyframe animation — src/animation.rs.

Keyframes map time (ms) to optional per-object TRS; frames are derived as
``floor(fps * last_time / 1000)`` and bracketed keyframes are lerped
(src/animation.rs:95-138).  The interpolated TRS builds a fresh matrix with
the reference's Euler compose order (src/animation.rs:202).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..utils.mathutil import compose_trs, lerp


@dataclass
class Frame:
    object_name: str
    translation: Optional[np.ndarray] = None
    rotation: Optional[np.ndarray] = None  # radians
    scale: Optional[np.ndarray] = None


@dataclass
class Keyframe:
    time: int  # ms
    objects: List[Frame] = field(default_factory=list)


@dataclass
class Animation:
    enabled: bool = False
    fps: int = 25
    keyframes: List[Keyframe] = field(default_factory=list)

    def has_animation(self) -> bool:  # src/animation.rs:80-83
        return (self.enabled and self.get_frames_amount_to_render() > 0
                and self.has_initial_keyframe() and len(self.keyframes) >= 2)

    def has_initial_keyframe(self) -> bool:  # src/animation.rs:85-93
        return bool(self.keyframes) and self.keyframes[0].time == 0

    def get_frames_amount_to_render(self) -> int:  # src/animation.rs:95-107
        last = self.keyframes[-1].time if self.keyframes else 0
        return int(np.floor(self.fps * (last / 1000.0)))

    def get_keyframes_for_frame(self, frame: int):  # src/animation.rs:109-138
        timestamp = int(np.floor((1000.0 / self.fps) * frame))
        first = self.keyframes[0]
        last = self.keyframes[0]
        for i, kf in enumerate(self.keyframes):
            if kf.time <= timestamp:
                first = kf
                last = self.keyframes[i + 1] if i + 1 < len(self.keyframes) else kf
        diff = last.time - first.time
        factor = (1.0 / diff) * (timestamp - first.time) if diff else float("inf")
        return first, last, factor

    def get_trans_for_frame(self, frame: int, object_name: str) -> Optional[np.ndarray]:
        # src/animation.rs:140-205
        first, last, factor = self.get_keyframes_for_frame(frame)
        f0 = next((o for o in first.objects if o.object_name == object_name), None)
        f1 = next((o for o in last.objects if o.object_name == object_name), None)
        if f0 is None or f1 is None:
            return None
        sf = np.float32(factor)
        t = np.zeros(3, np.float32)
        if f0.translation is not None and f1.translation is not None:
            t = lerp(np.asarray(f0.translation, np.float32), np.asarray(f1.translation, np.float32), sf)
        s = np.ones(3, np.float32)
        if f0.scale is not None and f1.scale is not None:
            s = lerp(np.asarray(f0.scale, np.float32), np.asarray(f1.scale, np.float32), sf)
        r = np.zeros(3, np.float32)
        if f0.rotation is not None and f1.rotation is not None:
            r = lerp(np.asarray(f0.rotation, np.float32), np.asarray(f1.rotation, np.float32), sf)
        return compose_trs(np.eye(4, dtype=np.float32), t, s, r)
