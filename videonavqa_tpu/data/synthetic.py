"""Synthetic dataset fixture generator.

Produces a tiny on-disk dataset with the exact layout of the generated
VideoNavQA dataset (videos/*.mp4, encoded_questions/*.npy, labels.json,
q_ids.json, split.json — eval/utils.py:8-16) so the full pipeline and CLI
harnesses run end-to-end without House3D/SUNCG. Used by tests and by
``cli.make_synthetic_data``.
"""

from __future__ import annotations

import json
import os

import numpy as np

from videonavqa_tpu.utils import constants as C

NUM_Q_TEMPLATES = 29  # scripts/question_gen.py:31-308


def generate_synthetic_dataset(out_dir, *, num_houses=3, trajs_per_house=6,
                               seed=0, video_format="mp4", min_frames=8,
                               max_frames=120):
    """Returns the list of example ids written."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out_dir, "videos"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "encoded_questions"), exist_ok=True)

    labels, q_ids, split = {}, {}, {"train": [], "val": [], "test": []}
    split_names = ["train"] * max(1, num_houses - 2) + ["val", "test"][: max(0, num_houses - 1)]

    for h in range(num_houses):
        house = f"house{h:04d}"
        part = split_names[h % len(split_names)]
        for t in range(trajs_per_house):
            ex_id = f"{house}_{t:04d}"
            T = int(rng.randint(min_frames, max_frames + 1))
            video = _smooth_video(rng, T)
            base = os.path.join(out_dir, "videos", ex_id)
            if video_format == "mp4":
                _write_mp4(base + ".mp4", video)
            else:
                np.save(base + ".npy", video)

            q_len = int(rng.randint(3, 13))
            tokens = rng.randint(1, C.VOCAB_SIZE, size=q_len).astype(np.int64)
            np.save(os.path.join(out_dir, "encoded_questions", ex_id + ".npy"), tokens)

            labels[ex_id] = int(rng.randint(0, C.NUM_CLASSES))
            q_ids[ex_id] = int(rng.randint(0, NUM_Q_TEMPLATES))
            split[part].append(ex_id)

    for name, obj in [("labels.json", labels), ("q_ids.json", q_ids), ("split.json", split)]:
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(obj, f)
    return sorted(labels)


def _smooth_video(rng, T):
    """Temporally-correlated random frames [T, 160, 208, 3] u8 (mp4-compressible)."""
    small = rng.randint(0, 256, size=(10, 13, 3)).astype(np.float32)
    frames = np.empty((T, C.VID_HEIGHT, C.VID_WIDTH, 3), dtype=np.uint8)
    for t in range(T):
        small = 0.9 * small + 0.1 * rng.randint(0, 256, size=small.shape)
        up = np.kron(small, np.ones((16, 16, 1), dtype=np.float32))
        frames[t] = np.clip(up, 0, 255).astype(np.uint8)
    return frames


def _write_mp4(path, video):
    """mp4v at 10 fps, matching the generator (scripts/trajectory_gen.py:156-158)."""
    import cv2

    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (C.VID_WIDTH, C.VID_HEIGHT))
    for frame in video:
        writer.write(frame)
    writer.release()
