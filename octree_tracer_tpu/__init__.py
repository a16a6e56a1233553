"""octree_tracer_tpu — TPU-native streaming sparse-voxel-octree raytracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``ria8651/octree-tracer`` renderer (Rust + WGSL on wgpu), re-designed for TPU:
lane-parallel wavefront traversal instead of per-pixel pointer chasing, scatter
reductions instead of device atomics, delta node-pool patches instead of
full-buffer re-uploads, and pjit/shard_map pixel-tile data parallelism for
multi-chip scaling.
"""

__version__ = "0.1.0"
