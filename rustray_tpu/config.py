"""Render configuration with the reference's diff-merge semantics.

Mirrors ``RaytracingConfig`` (src/raytracing.rs:91-200) and
``PostProcessingConfig`` (src/post_processing.rs:6-23).

The ``apply`` merge only copies fields that differ from the *defaults*
(last-writer-wins layering: compiled defaults → scene JSON → CLI overrides →
live edits), exactly like src/raytracing.rs:129-185.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from .utils.mathutil import approx_equal


@dataclass
class RaytracingConfig:
    monte_carlo: bool = False
    samples: int = 1
    focal_length: float = 1.0
    aperture_size: float = 1.0
    fog_density: float = 0.0
    fog_color: tuple = (0.4, 0.4, 0.4)
    max_recursion: int = 6
    gamma_correction: bool = False

    def apply(self, new: "RaytracingConfig") -> None:
        """Diff-vs-default merge — src/raytracing.rs:129-185."""
        d = RaytracingConfig()
        if d.monte_carlo != new.monte_carlo:
            self.monte_carlo = new.monte_carlo
        if d.samples != new.samples:
            self.samples = new.samples
        if not approx_equal(d.focal_length, new.focal_length):
            self.focal_length = new.focal_length
        if not approx_equal(d.aperture_size, new.aperture_size):
            self.aperture_size = new.aperture_size
        if not approx_equal(d.fog_density, new.fog_density):
            self.fog_density = new.fog_density
        if any(not approx_equal(a, b) for a, b in zip(d.fog_color, new.fog_color)):
            self.fog_color = tuple(new.fog_color)
        if d.max_recursion != new.max_recursion:
            self.max_recursion = new.max_recursion
        if d.gamma_correction != new.gamma_correction:
            self.gamma_correction = new.gamma_correction

    def copy(self) -> "RaytracingConfig":
        return dataclasses.replace(self)

    def print(self) -> None:  # src/raytracing.rs:187-200
        for f in dataclasses.fields(self):
            print(f"{f.name}: {getattr(self, f.name)}")


@dataclass
class PostProcessingConfig:
    cavity: bool = False
    outline: bool = False

    def copy(self) -> "PostProcessingConfig":
        return dataclasses.replace(self)


@dataclass
class EngineConfig:
    """TPU-engine knobs with no reference counterpart (new framework).

    - ``chunk_pixels``: pixels per device dispatch (rays per chunk =
      chunk_pixels; samples are looped inside the chunk).
    - ``queue_factor``: per-bounce ray-queue capacity as a multiple of the
      chunk's primary-ray count.  The Whitted ray tree can branch 2× per
      bounce; live rays beyond the cap are dropped lowest-weight-first AND
      counted — ``render()`` auto-doubles the factor and re-renders the
      chunk when drops occur, so results match the reference's full tree
      (src/raytracing.rs:938-975) on the default config; the sharded path
      warns instead.
    - ``tri_tile``: triangles per inner intersection tile (static scan step).
    - ``seed``: base RNG seed for deterministic, replayable Monte-Carlo.
    - ``accel``: "auto" | "on" | "off" — cluster-BVH traversal
      (block-coherent culling) instead of the dense linear scan.  "auto"
      enables it once the pool exceeds ``accel_min_tris`` (the moral
      equivalent of the reference's BVH_MIN_ITEMS gate).
    - ``accel_block``: rays per traversal block (coherence granularity).
    """
    chunk_pixels: int = 65536
    queue_factor: float = 4.0
    tri_tile: int = 2048
    seed: int = 0
    deterministic: bool = True
    accel: str = "auto"
    accel_block: int = 1024
    accel_gather: int = 32
    accel_min_tris: int = 2048
    # Pallas TPU per-block trace kernel (ops/block_trace): "auto" uses it
    # whenever the cluster path is active AND the backend is a real TPU;
    # "on"/"off" force.  ``pallas_block`` is the rays-per-block coherence
    # granularity; ``pallas_interpret`` runs the kernel in the Pallas
    # interpreter (CPU tests).
    pallas: str = "auto"
    # 128-ray blocks measured fastest on the 250k-tri bench: visit-list
    # totals grow sublinearly as blocks shrink while per-visit cost scales
    # with block_n, so smaller blocks do strictly less ray x triangle work
    # on incoherent (shadow/reflection) wavefronts
    pallas_block: int = 128
    pallas_interpret: bool = False
    # traversal algorithm for the Pallas path: "block" = the per-block
    # visit-list walk with quad-masked intersections (ops/block_trace);
    # "octet" = per-octet exact-test iterative-argmin walk
    # (ops/octet_trace — exact and lane-optimal but serialized by
    # per-iteration loop machinery, kept for reference/measurement;
    # tools/octet_kernel_bench.py has the cost isolation).
    pallas_algo: str = "block"
    # max AA/MC sample cells evaluated per device dispatch on the
    # single-dispatch frame path: one dispatch per ~16 samples keeps each
    # device program under ~1 min — a single 128-spp dispatch (~6 min) hard
    # crashes the tunneled TPU worker (watchdog); per-dispatch overhead is
    # ~0.9 s, <2% at this granularity
    samples_per_dispatch: int = 16

    def use_accel(self, static) -> bool:
        if self.accel == "off" or static.n_clusters == 0:
            return False
        if self.accel == "on":
            return True
        return static.n_tris >= self.accel_min_tris

    def use_pallas(self, static) -> bool:
        if self.pallas == "off" or static.n_clusters == 0:
            return False
        import jax
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if self.pallas == "on":
            if not on_tpu and not self.pallas_interpret:
                raise ValueError(
                    "pallas='on' requires a TPU backend; set "
                    "pallas_interpret=True to run the kernel in the "
                    "interpreter on CPU/GPU")
            return True
        if not on_tpu:
            return False
        return self.use_accel(static)
