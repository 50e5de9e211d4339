"""Material model: 23 scalar/flag params + 8 texture channels.

Reference: ``Material`` (src/shape/mod.rs:94-630).  Textures are held as
numpy (H, W, 4) uint8 RGBA arrays (the reference keeps ``DynamicImage`` and
converts to rgba at fetch time, src/shape/mod.rs:531).

``apply_diff`` replicates the diff-vs-default overlay used when a parent JSON
scene overrides materials of a nested child scene
(src/shape/mod.rs:182-299): only fields differing from a *default* material
are copied.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field, fields
from typing import Optional

import numpy as np

from ..utils.mathutil import approx_equal


class TextureType(enum.IntEnum):  # src/shape/mod.rs:632-643
    Base = 0
    AmbientEmissive = 1
    Specular = 2
    Normal = 3
    Alpha = 4
    Roughness = 5
    AmbientOcclusion = 6
    Reflectivity = 7


TEXTURE_FIELDS = {
    TextureType.Base: "texture_base",
    TextureType.AmbientEmissive: "texture_ambient",
    TextureType.Specular: "texture_specular",
    TextureType.Normal: "texture_normal",
    TextureType.Alpha: "texture_alpha",
    TextureType.Roughness: "texture_roughness",
    TextureType.AmbientOcclusion: "texture_ambient_occlusion",
    TextureType.Reflectivity: "texture_reflectivity",
}

_COLOR_FIELDS = ("ambient_color", "base_color", "specular_color")
_FLOAT_FIELDS = ("alpha", "shininess", "reflectivity", "refraction_index",
                 "normal_map_strength", "shadow_softness", "roughness")
_BOOL_FIELDS = ("texture_filtering_nearest", "cast_shadow", "receive_shadow",
                "monte_carlo", "smooth_shading", "reflection_only", "backface_culling")


@dataclass
class Material:
    id: int = 0
    name: str = ""

    ambient_color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    base_color: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    specular_color: np.ndarray = field(default_factory=lambda: np.full(3, 0.8, np.float32))

    texture_base: Optional[np.ndarray] = None
    texture_ambient: Optional[np.ndarray] = None
    texture_specular: Optional[np.ndarray] = None
    texture_normal: Optional[np.ndarray] = None
    texture_alpha: Optional[np.ndarray] = None
    texture_roughness: Optional[np.ndarray] = None
    texture_ambient_occlusion: Optional[np.ndarray] = None
    texture_reflectivity: Optional[np.ndarray] = None

    texture_filtering_nearest: bool = False

    alpha: float = 1.0
    shininess: float = 150.0
    reflectivity: float = 0.0
    refraction_index: float = 1.0
    normal_map_strength: float = 1.0
    cast_shadow: bool = True
    receive_shadow: bool = True
    shadow_softness: float = 0.01
    roughness: float = 0.0  # radians, max PI/2
    monte_carlo: bool = True
    smooth_shading: bool = True
    reflection_only: bool = False
    # NOTE: the reference spells this field "backface_cullig" (typo) both in
    # code and in the accepted JSON key (src/shape/mod.rs:133, src/scene.rs:349).
    backface_culling: bool = True

    # ----- texture helpers (src/shape/mod.rs:461-540) -----

    def get_texture(self, t: TextureType) -> Optional[np.ndarray]:
        return getattr(self, TEXTURE_FIELDS[t])

    def set_texture(self, t: TextureType, img: Optional[np.ndarray]) -> None:
        setattr(self, TEXTURE_FIELDS[t], img)

    def has_texture(self, t: TextureType) -> bool:
        tex = self.get_texture(t)
        return tex is not None and tex.shape[1] > 0

    def has_any_texture(self) -> bool:
        return any(self.has_texture(t) for t in TextureType)

    def texture_dimension(self, t: TextureType):
        tex = self.get_texture(t)
        if tex is None:
            return (0, 0)
        return (tex.shape[1], tex.shape[0])  # (width, height)

    def load_texture(self, path: str, t: TextureType) -> None:  # src/shape/mod.rs:378-418
        from ..utils.assets import resolve_path
        from .textures import load_image
        print(f"loading texture: {path}")
        self.set_texture(t, load_image(resolve_path(path)))

    # ----- diff overlays (src/shape/mod.rs:182-299) -----

    def apply_diff_without_textures(self, new: "Material") -> None:
        d = Material()
        for name in _COLOR_FIELDS:
            if any(not approx_equal(a, b) for a, b in zip(getattr(d, name), getattr(new, name))):
                setattr(self, name, np.asarray(getattr(new, name), np.float32).copy())
        for name in _FLOAT_FIELDS:
            if not approx_equal(getattr(d, name), getattr(new, name)):
                setattr(self, name, float(getattr(new, name)))
        for name in _BOOL_FIELDS:
            if getattr(d, name) != getattr(new, name):
                setattr(self, name, bool(getattr(new, name)))

    def apply_diff(self, new: "Material") -> None:
        self.apply_diff_without_textures(new)
        for t in TextureType:
            if new.has_texture(t):
                self.set_texture(t, new.get_texture(t))

    def print(self) -> None:  # src/shape/mod.rs:301-337
        for f in fields(self):
            v = getattr(self, f.name)
            if f.name.startswith("texture_") and f.name != "texture_filtering_nearest":
                v = self.has_texture_field(f.name)
            print(f"{f.name}: {v}")

    def has_texture_field(self, name: str) -> bool:
        tex = getattr(self, name)
        return tex is not None and tex.shape[1] > 0
