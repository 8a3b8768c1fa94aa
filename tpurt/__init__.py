"""tpurt — TPU-native ray-traced shadows renderer.

A from-scratch JAX/Pallas rebuild of the capabilities of
kayru/RayTracedShadows (C++/Vulkan): OBJ scene loading, primary-visibility
G-buffer, LBVH build/refit fully on device, and a wavefront Pallas BVH
traversal kernel for per-pixel shadow rays. See SURVEY.md / BASELINE.md.
"""

from .types import (Camera, Light, Mesh, RenderConfig,
                    LIGHT_AREA_CONE, LIGHT_DIRECTIONAL, LIGHT_POINT)

__all__ = [
    "Camera", "Light", "Mesh", "RenderConfig",
    "LIGHT_AREA_CONE", "LIGHT_DIRECTIONAL", "LIGHT_POINT",
]

__version__ = "0.1.0"
