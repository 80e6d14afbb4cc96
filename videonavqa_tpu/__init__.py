"""VideoNavQA-TPU: a TPU-native (JAX/XLA/Pallas) framework for the VideoNavQA benchmark.

A from-scratch rebuild of the capabilities of catalina17/VideoNavQA (PyTorch/CUDA,
single GPU) as an idiomatic TPU framework:

- ``ops/``      — functional NN ops: masked LSTM scans (replacing cuDNN packed
                  sequences), NHWC convolutions, per-frame masked BatchNorm,
                  torch-compatible initializers.
- ``stem/``     — the frozen visual stem (VGG-16 partial + ObjDetectCNN) as fused
                  XLA convolutions batched over the frame axis.
- ``models/``   — the full model zoo (q-only BoW/LSTM, v-only CNN3D / CNN2D+LSTM,
                  concat fusion, FiLM global-pooling, FiLM-attention,
                  time-multi-hop FiLM, MAC) as pure functions over explicit
                  parameter pytrees.
- ``train/``    — jitted train/eval steps (CE loss, grad clipping, Adam), metrics
                  (per-class accuracy, F1), epoch loops, checkpointing.
- ``data/``     — host-side input pipeline: mp4/npy decode, 1-of-4 random frame
                  subsampling into fixed [35, 160, 208, 3] u8 tensors,
                  double-buffered device feed, synthetic fixtures.
- ``parallel/`` — mesh construction and sharding rules (DP over ICI via GSPMD,
                  optional model-axis sharding of large projections).
- ``kernels/``  — Pallas TPU kernels for the hot fused ops.
- ``datagen/``  — offline dataset generation tooling (question templates, engine,
                  encoders, label/split writers) with the renderer behind a
                  pluggable interface.

Reference behavior is documented per-module with `file:line` citations into the
reference repo so parity can be audited.
"""

__version__ = "0.1.0"
