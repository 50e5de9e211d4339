"""Device-side ops: intersection, traversal, shading, textures, rays."""
