"""Image loading and texture-atlas packing.

The reference decodes PNG/JPG/GIF via the Rust ``image`` crate and fetches
rgba u8 texels (src/shape/mod.rs:510-540).  Here images are decoded to
(H, W, 4) uint8 numpy arrays and all textures of a scene are packed into one
flat int32 array of packed RGBA texels for single-gather device sampling.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 4) uint8 RGBA (first frame for GIFs)."""
    from PIL import Image

    with Image.open(path) as im:
        im.seek(0)
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)


def pack_rgba(img: np.ndarray) -> np.ndarray:
    """(H, W, 4) uint8 → (H*W,) int32 with r | g<<8 | b<<16 | a<<24."""
    img = img.astype(np.uint32)
    packed = img[..., 0] | (img[..., 1] << 8) | (img[..., 2] << 16) | (img[..., 3] << 24)
    return packed.reshape(-1).astype(np.int32)


class TextureAtlas:
    """Flat concatenation of all texture images with per-slot offsets.

    Identical images (by id) are deduplicated, which matters for GLTF scenes
    where materials share textures.
    """

    def __init__(self):
        self._chunks: List[np.ndarray] = []
        self._by_id: Dict[int, Tuple[int, int, int]] = {}
        self._size = 0

    def add(self, img: Optional[np.ndarray]) -> Tuple[int, int, int]:
        """Returns (offset, width, height); (0, 0, 0) for missing textures."""
        if img is None or img.size == 0:
            return (0, 0, 0)
        key = id(img)
        if key in self._by_id:
            return self._by_id[key]
        h, w = img.shape[:2]
        entry = (self._size, w, h)
        self._chunks.append(pack_rgba(img))
        self._size += w * h
        self._by_id[key] = entry
        return entry

    def finalize(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((1,), np.int32)
        return np.concatenate(self._chunks)
