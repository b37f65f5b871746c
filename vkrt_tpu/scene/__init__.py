from vkrt_tpu.scene.model import Model, Submesh, Material, Image
from vkrt_tpu.scene.gltf import load_model
from vkrt_tpu.scene.flatten import FlatScene, flatten_model
from vkrt_tpu.scene.textures import TextureHeap, build_texture_heap

__all__ = [
    "Model", "Submesh", "Material", "Image", "load_model",
    "FlatScene", "flatten_model", "TextureHeap", "build_texture_heap",
]
