from videonavqa_tpu.data.pipeline import (  # noqa: F401
    BatchLoader, DataPaths, VNQADataset, load_json,
)
