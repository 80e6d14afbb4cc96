"""Pallas TPU kernels for the recurrent hot ops (inference/serving path).

Both kernels fuse a whole recurrence into a single VMEM-resident kernel and
are exact against their XLA-scan references (tests/test_kernels.py), gated by
``ModelConfig.use_pallas_kernels``:

- ``lstm_pallas``      — full-sequence masked LSTM (question/frame encoders);
- ``attn_tail_pallas`` — film_attn's 35-step attention-LSTM tail with the
  phantom-corrected masked softmax fused in.

Measured on a v5e chip (B=32): the XLA scans are already excellent here —
lstm 0.03 ms scan vs 0.02 ms pallas; the attention tail is sub-millisecond
against a 62 ms FiLM trunk forward either way. The step time is dominated by
MXU convolutions that XLA tiles at ~75-85% of roofline, so these kernels are
kept as a serving-path option and a base for future fused ops rather than
being switched on by default.
"""

from videonavqa_tpu.kernels.lstm_pallas import lstm_pallas  # noqa: F401
from videonavqa_tpu.kernels.attn_tail_pallas import attn_tail_pallas  # noqa: F401
