"""Acceleration structures: host-side cluster-BVH build + device traversal.

TPU-native replacement for the reference's two-level acceleration
(scene-level ``bvh`` crate BVH, src/scene.rs:1681-1688, and parry3d's
per-mesh triangle BVH, src/shape/mesh.rs:67).
"""
from .builder import build_clusters  # noqa: F401
