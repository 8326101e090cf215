"""Device-side scene model: SoA geometry/material/light buffers and the
differentiable pinhole camera."""

from tinyraytracing_tpu.models.camera import Camera, generate_rays
from tinyraytracing_tpu.models.scene import Scene, load_scene

__all__ = ["Camera", "generate_rays", "Scene", "load_scene"]
