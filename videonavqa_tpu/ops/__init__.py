from videonavqa_tpu.ops import initializers, linear, conv, norm, lstm, masking  # noqa: F401
