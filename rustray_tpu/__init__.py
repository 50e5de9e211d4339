"""rustray_tpu — a TPU-native differentiable Whitted/Monte-Carlo ray tracer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Bastl34/rustray
(reference mounted at /root/reference): scene graph + JSON/GLTF/OBJ loaders,
Whitted shading with reflection/refraction/fresnel/fog, 8 texture channels,
normal mapping, Monte-Carlo roughness & soft shadows, DOF, animation,
post-processing, picking — implemented as a wavefront renderer over SoA
device arrays with deterministic, replayable RNG and differentiable scene
parameters.
"""

from .config import EngineConfig, PostProcessingConfig, RaytracingConfig
from .scene.scene import Scene
from .scene.camera import Camera
from .scene.light import Light, LightType
from .scene.material import Material, TextureType
from .scene.shapes import Mesh, Sphere
from .scene.compile import compile_scene
from .render.wavefront import render

__version__ = "0.1.0"

__all__ = [
    "Camera", "EngineConfig", "Light", "LightType", "Material", "Mesh",
    "PostProcessingConfig", "RaytracingConfig", "Scene", "Sphere",
    "TextureType", "compile_scene", "render",
]
