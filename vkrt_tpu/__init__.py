"""vkrt_tpu — a TPU-native wavefront ray-tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of jparimaa/vkrt
(reference: /root/reference): Sponza glTF scene loading, on-device LBVH
acceleration-structure construction, stackless BVH traversal + ray-triangle
intersection, vectorized hit shading (4 point lights, hard shadows, metallic
reflections), and a wavefront frame engine over lane-major ray blocks —
replacing the Vulkan VK_KHR_ray_tracing pipeline, driver-built BLAS/TLAS,
and shader-binding-table dispatch of the reference.

Layers (bottom-up), mirroring SURVEY.md §7:
  scene/     glTF ingest → JAX arrays         (ref: src/Model.{hpp,cpp})
  accel/     LBVH build (Morton + radix sort) (ref: driver BLAS/TLAS,
                                               src/Raytracer.cpp:1027-1283)
  rt/        traversal + intersection kernels (ref: vkCmdTraceRaysKHR)
  shade/     hit shading + texture sampling   (ref: shaders/shader.rchit)
  wavefront/ frame engine, ray queues         (ref: shaders/shader.rgen + SBT)
  parallel/  multi-chip sharding over rays    (ref: none — new capability)
  app/       camera, config, CLI, harness     (ref: src/Camera.cpp, main.cpp)
"""

from vkrt_tpu.version import __version__

__all__ = ["__version__"]
