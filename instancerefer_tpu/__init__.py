"""InstanceRefer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) 3D visual-grounding framework.

Re-implements the full capability surface of CurryYuan/InstanceRefer (ICCV 2021) —
ScanRefer grounding with cooperative attribute/relation/scene matching over
PointGroup instances — as an idiomatic TPU framework:

* fixed-capacity padded tensors + masks instead of ragged Python lists,
* host-precomputed sparse-conv kernel maps + on-device gather-GEMM instead of
  torchsparse CUDA kernels,
* masked `lax.scan` GRU instead of cuDNN pack/pad GRU,
* dense padded top-k kNN + masked segment-max instead of torch-cluster/scatter,
* `jax.sharding` data parallelism over ICI instead of (absent) torch.distributed.

See SURVEY.md for the structural map of the reference this was built against.
"""

__version__ = "0.1.0"
