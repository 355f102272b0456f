"""SwinWNet-TPU: a TPU-native JAX/XLA/Pallas framework for multimodal processing
of 2D neutron diffraction data.

Ground-up rebuild of the capabilities of
`popoff4rtem/SwinWNet-A-Deep-Learning-framework-for-multimodal-processing-of-2D-
neutron-diffraction-data-` (the PyTorch reference) designed for TPU hardware:
static-shape XLA graphs, fused Pallas window-attention kernels, on-device
d-space physics rebinning, and `jax.sharding` data parallelism over device
meshes.

Subpackages
-----------
core       dtypes, configuration dataclasses, PRNG helpers
ops        windowing, attention, resize, normalization primitives (+ Pallas kernels)
models     flax.linen model zoo: SwinUNet, SwinUNetSR, SwinWNet, AlphaPolicy
physics    d-space rebinning, peak finding, EMD shape metrics (reference:
           Diffraction_metrics.py)
pipelines  staged inference (reference: ST_Inference_Pipline.py / RL_Inference_Pipline.py)
train      losses, supervised 3-stage trainers, REINFORCE fine-tuning
data       dataset loading, noise-injection eval protocol
compat     PyTorch .pth checkpoint -> JAX pytree converter
evalharness  segmentation/SR/physical evaluation (reference: tests.py)
parallel   mesh construction + sharding rules
utils      orbax checkpointing, profiling hooks
"""

__version__ = "0.1.0"
