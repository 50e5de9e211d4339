"""Asset path resolution.

The reference resolves scene-relative paths (textures, nested scenes,
downloaded models) against the process CWD (it is always run from the repo
root).  We generalize: relative paths are tried against the CWD first, then
against ``ASSET_ROOT`` (settable via :func:`set_asset_root` or the
``RUSTRAY_ASSET_ROOT`` env var).  This lets tests use the read-only bundled
scene corpus without copying it.
"""
from __future__ import annotations

import os

_ASSET_ROOT = os.environ.get("RUSTRAY_ASSET_ROOT", "")


def set_asset_root(path: str) -> None:
    global _ASSET_ROOT
    _ASSET_ROOT = path


def get_asset_root() -> str:
    return _ASSET_ROOT


def resolve_path(path: str) -> str:
    if os.path.isabs(path) or os.path.exists(path):
        return path
    if _ASSET_ROOT:
        candidate = os.path.join(_ASSET_ROOT, path)
        if os.path.exists(candidate):
            return candidate
    return path
