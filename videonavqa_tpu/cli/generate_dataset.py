"""End-to-end dataset generation over the synthetic renderer backend.

Replaces the reference's per-house drivers
(scripts/generate_questions_for_trajectories.py,
scripts/generate_trajectories.py, scripts/generate_videos_for_trajectories.py)
for the hermetic backend: per house it builds a scene graph, samples random
room-to-room trajectories with look-arounds, renders mp4 videos, observes
seen rooms/objects, generates balanced questions, then writes labels.json,
q_ids.json, split.json and encoded_questions/ — a complete dataset the
training harnesses consume directly.

SUNCG/House3D generation remains an external backend: plug a renderer with
the same three-mode interface plus ground-truth rooms into the same pipeline.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from videonavqa_tpu.data.synthetic import _write_mp4
from videonavqa_tpu.datagen.encode import encode_questions
from videonavqa_tpu.datagen.engine import QuestionEngine
from videonavqa_tpu.datagen.labels import write_labels
from videonavqa_tpu.datagen.renderer import (
    SyntheticRenderer, generate_path, generate_synthetic_house,
)
from videonavqa_tpu.datagen.scene import SceneGraph
from videonavqa_tpu.datagen.split import build_split, split_houses
from videonavqa_tpu.datagen.trajectory import TrajectoryObserver, add_lookarounds


def generate_house(house_idx, out_dir, engine, rng, nprng, *, trajs_per_house,
                   num_rooms, verbose=False, resume=False):
    """Generates one house. With ``resume``, houses whose question JSON already
    exists are skipped (idempotent restartable generation — the reference's
    skip-if-output-exists pattern, scripts/generate_questions_for_trajectories.py:68-72)."""
    house_id = f"synth{house_idx:04d}"
    if resume and os.path.exists(os.path.join(engine.save_dir, house_id + ".json")):
        return house_id, 0
    house = generate_synthetic_house(nprng, num_rooms=num_rooms)
    renderer = SyntheticRenderer(house)
    videos_dir = os.path.join(out_dir, "videos")
    os.makedirs(videos_dir, exist_ok=True)

    generated = 0
    trajectories = []
    video_lengths = {}
    for traj_id in range(trajs_per_house):
        scene = SceneGraph(house.rooms)  # fresh seen/visited state per trajectory
        a, b = nprng.choice(len(house.rooms), size=2, replace=False)
        coors = generate_path(house, int(a), int(b), nprng)
        coors = add_lookarounds(coors, scene)
        trajectories.append(np.asarray(coors, dtype=np.float32))

        observer = TrajectoryObserver(scene, renderer)
        observer.observe(coors)

        example = engine.generate_for_trajectory(traj_id, scene, verbose=verbose)
        if example is None:
            continue
        frames = observer.render_video(coors)
        _write_mp4(os.path.join(videos_dir, "%s_%04d.mp4" % (house_id, traj_id)), frames)
        video_lengths[traj_id] = int(frames.shape[0])
        generated += 1

    # per-house trajectory archive (the reference's <house>_trajs.npy artifact,
    # scripts/generate_trajectories.py:23-54) and video-length JSON
    # (scripts/generate_videos_for_trajectories.py:51-65)
    traj_dir = os.path.join(out_dir, "trajectories")
    os.makedirs(traj_dir, exist_ok=True)
    np.save(os.path.join(traj_dir, house_id + ".npy"),
            np.array(trajectories, dtype=object), allow_pickle=True)
    import json

    with open(os.path.join(traj_dir, house_id + "_video_lengths.json"), "w") as f:
        json.dump(video_lengths, f)

    engine.dump_dataset(house_id)
    return house_id, generated


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--num_houses", type=int, default=4)
    parser.add_argument("--trajs_per_house", type=int, default=8)
    parser.add_argument("--num_rooms", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="skip houses whose question JSON already exists")
    args = parser.parse_args(argv)

    questions_dir = os.path.join(args.out, "questions")
    rng = random.Random(args.seed)
    nprng = np.random.RandomState(args.seed)
    engine = QuestionEngine(questions_dir, rng)

    house_ids = []
    total = 0
    for h in range(args.num_houses):
        house_id, generated = generate_house(
            h, args.out, engine, rng, nprng,
            trajs_per_house=args.trajs_per_house, num_rooms=args.num_rooms,
            verbose=args.verbose, resume=args.resume)
        house_ids.append(house_id)
        total += generated
        print(f"{house_id}: {generated} examples")

    write_labels(questions_dir,
                 os.path.join(args.out, "labels.json"),
                 os.path.join(args.out, "q_ids.json"))
    vocab, _ = encode_questions(questions_dir, os.path.join(args.out, "encoded_questions"))
    with open(os.path.join(args.out, "vocab.json"), "w") as f:
        import json

        json.dump(vocab, f)
    build_split(questions_dir, split_houses(house_ids, seed=args.seed),
                os.path.join(args.out, "split.json"))
    print(f"wrote {total} examples ({len(vocab)} vocab tokens) to {args.out}")


if __name__ == "__main__":
    main()
