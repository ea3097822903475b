"""Dense compute kernels (the TPU-native equivalent of Core/Cuda + Core/Shaders).

Every op has a pure-XLA (jnp) implementation; the latency-critical ones also
have fused Pallas TPU kernels (ops/pallas_kernels.py) selected via
maskfusion_tpu.ops.dispatch.
"""
