"""Host-side scene I/O: XML camera/light config, OBJ meshes, MTL materials,
texture images, and PNG image output.

The reference parses these with tinyxml2 / hand-rolled line parsers / OpenCV
(reference: RayTracingOnCPU/scene.cpp, material.cpp). Here parsing is pure
host-side Python producing numpy SoA buffers that are uploaded once to device
HBM; nothing in this package touches JAX.
"""

from tinyraytracing_tpu.io.xmlscene import SceneConfig, LightSpec, parse_scene_xml
from tinyraytracing_tpu.io.mtl import MaterialSpec, parse_mtl
from tinyraytracing_tpu.io.objmesh import MeshArrays, parse_obj
from tinyraytracing_tpu.io.textures import load_texture_atlas
from tinyraytracing_tpu.io.image import write_png, tonemap_srgb

__all__ = [
    "SceneConfig",
    "LightSpec",
    "parse_scene_xml",
    "MaterialSpec",
    "parse_mtl",
    "MeshArrays",
    "parse_obj",
    "load_texture_atlas",
    "write_png",
    "tonemap_srgb",
]
