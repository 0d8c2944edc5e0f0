"""gaustar_tpu — a TPU-native (JAX/Pallas/pjit) Gaussian surface tracking & reconstruction
framework with the capabilities of eth-ait/GauSTAR (CVPR 2025).

Built from scratch for TPU: the differentiable tile-based 3D Gaussian rasterizer is a
Pallas kernel pipeline (projection/culling -> tile binning via XLA sort -> chunked
front-to-back blending on the VPU with closed-form cumulative transmittance), the
mesh-bound (SuGaR-style) parametrization and the per-frame refinement loop are pure
JAX pytrees + jitted functions, and multi-chip execution shards cameras over a
`jax.sharding.Mesh` with psum'd parameter gradients.

Layer map (mirrors reference SURVEY.md section 1):
  ops/       rasterizer kernels + numerics (SH, losses, projection, binning, blending)
  models/    GaussianModel (vanilla 3DGS) and SuGaR (mesh-bound) parametrizations
  train/     per-frame refine loop, optimizer schedules, densifier, sequence driver
  tools/     flow-guided mesh warp, face tracking, camera converters
  mesh/      host-side mesh surgery (TSDF fusion, topology update, connectivity)
  io/        .obj / .ply / .npz readers and writers (reference on-disk contracts)
  parallel/  device-mesh sharding of the training step
  native/    C++ mesh kernels (marching cubes, TSDF integrate, KNN, components)
"""

__version__ = "0.1.0"
