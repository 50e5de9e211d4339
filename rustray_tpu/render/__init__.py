"""Renderer: wavefront engine, post-processing, picking."""
