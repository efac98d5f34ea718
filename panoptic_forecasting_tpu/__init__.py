"""TPU-native panoptic segmentation forecasting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
nianticlabs/panoptic-forecasting (CVPR 2021 "Panoptic Segmentation
Forecasting"): forecast the panoptic segmentation of an unobserved future
Cityscapes frame from observed past frames by composing

  * an egomotion GRU forecaster                       (models/odom.py)
  * a depth-based point-cloud reprojection engine      (models/pc_transform.py,
    z-buffer scatter-min splat as a Pallas TPU kernel: kernels/zbuffer.py)
  * an FCHarDNet-70 background semantic forecaster     (models/hardnet.py, bg.py)
  * a per-instance foreground forecaster (coupled GRU + ConvLSTM rollouts
    over MaskRCNN ROI features, as lax.scan programs)  (models/fg.py)
  * depth-ordered panoptic fusion + Cityscapes PQ      (eval/fusion.py, eval/pq.py)

Everything under ``jit`` is static-shape, scan-based, bf16-on-MXU friendly;
data parallelism is expressed as NamedSharding over a jax.sharding.Mesh
(parallel/mesh.py) rather than per-process collectives.
"""

__version__ = "0.1.0"
