"""Light model — src/scene.rs:28-64."""
from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np


class LightType(enum.IntEnum):
    Directional = 0
    Point = 1
    Spot = 2


@dataclass
class Light:
    enabled: bool = True
    id: int = 0
    name: str = "light"
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    dir: np.ndarray = field(default_factory=lambda: np.array([0.0, -1.0, 0.0], np.float32))
    color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    intensity: float = 0.0
    max_angle: float = float(np.pi / 2)  # radians
    light_type: LightType = LightType.Point
