"""Model registry and shared configuration.

Every model in the zoo is a pair of pure functions over an explicit parameter
pytree:

    init(key, cfg)                          -> (params, state)
    apply(params, state, batch, cfg, *, train, rng) -> (logits [B, num_classes], new_state)

``state`` holds BatchNorm running statistics (empty dict for q-only models).
``batch`` is a dict with any of:
    question [B, 56] i32, q_len [B] i32,
    video    [B, 35, 160, 208, 3] f32 (pixels/255),
    v_features [B, 35, 10, 13, 512] f32 (frozen-stem output),
    v_len    [B] i32.

``rng`` supplies dropout masks and the reference's stochastic initial hidden
states; it is consumed even at eval time where the reference is stochastic
(models/q_only_lstm.py:51-54).

Unlike the reference (whose models hardcode ``self.batch_size`` and require
length-sorted batches), these models read the batch size from the input and are
order-independent — masked scans make sorting unnecessary.
"""

from __future__ import annotations

import dataclasses

from videonavqa_tpu.utils import constants as C


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Union of the reference harness flags (eval/q_and_v_eval.py:29-66,
    eval/q_only_eval.py:22-34)."""

    model: str = "film_attn_pt"
    num_classes: int = C.NUM_CLASSES
    vocab_size: int = C.VOCAB_SIZE
    q_encoder: str = "lstm"            # 'lstm' | 'bow' (FiLM models)
    embed_size: int = 128
    hidden_size: int = 128
    at_hidden_size: int = 128
    num_res_blocks: int = 1
    num_res_block_channels: int = 512
    num_input_channels: int = 512
    num_tail_channels: int = 16
    mac_dim: int = 512
    mac_max_step: int = 12
    mac_dropout: float = 0.15
    max_num_frames: int = C.MAX_ALLOWED_NUM_FRAMES_DROPPING
    max_q_len: int = C.MAX_Q_LEN
    # Compute dtype for conv trunks / big matmuls ('bfloat16' or 'float32').
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas recurrence kernels on the inference path (the
    # training path always uses XLA scans for autodiff).
    use_pallas_kernels: bool = False
    # Run the FiLM trunk convs int8 on the inference path (dynamic per-tensor
    # activation scales, per-out-channel weights — ops/quant.py). 1.78x per
    # conv on v5e; small logit drift, so opt-in for paper-comparable numbers.
    use_int8_trunk: bool = False
    # Calibration pass for STATIC int8 trunk activation scales: an f32 eval
    # forward that records each trunk conv's input absmax into the returned
    # state ('int8_scales'); later int8 forwards with those scales in state
    # skip the per-batch absmax reductions that make dynamic int8 lose at
    # batch-1 (PERF.md). Serving self-calibrates on its first micro-batch.
    int8_trunk_calibrate: bool = False
    # Rematerialize FiLM residual blocks in the backward pass (jax.checkpoint):
    # trades ~25% extra trunk FLOPs for ~NxC activation memory, unlocking
    # batch 64+ at the eval.sh preset on a 16GB v5e.
    remat_film_blocks: bool = False
    # Parity registers (SURVEY §8): the reference's FiLM 1x1-conv skip layers are
    # invisible to the optimizer/state_dict (defect 9). False (default) makes
    # them ordinary trainable params; True freezes them at init for strict
    # reference-dynamics parity.
    freeze_film_conv1x1: bool = False


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    init: object
    apply: object
    needs_video: bool
    needs_question: bool
    uses_stem: bool  # consumes v_features (frozen stem) rather than raw video


MODEL_REGISTRY: dict[str, ModelSpec] = {}


def register_model(name, init_fn, apply_fn, *, needs_video, needs_question, uses_stem):
    MODEL_REGISTRY[name] = ModelSpec(
        name, init_fn, apply_fn, needs_video, needs_question, uses_stem)


def get_model(name: str) -> ModelSpec:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
