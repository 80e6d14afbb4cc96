"""Train the ObjDetectCNN stem (27-way multi-label object detection).

The reference trains this model offline (models/obj_detector.py is used frozen
by the eval stack via obj_detect.pt, eval/utils.py:42-51) but ships no
training harness. This one trains it TPU-side on top of the frozen VGG-16
partial: sigmoid/BCE multi-label loss over per-frame visible-class targets,
Adam, per-epoch accuracy/F1, checkpoints in framework format and optional
torch .pt export so the result drops into the reference's obj_detect.pt slot.

Without a real SUNCG frame dataset, --synthetic N renders N labeled frames
from procedurally generated houses (labels = classes visible in the semantic
render).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from videonavqa_tpu.stem import (
    init_obj_detector, init_vgg_partial, obj_detector, vgg_partial,
)
from videonavqa_tpu.utils import checkpoint as ckpt
from videonavqa_tpu.datagen.ontology import QUERY_OBJECTS

#: class list for detection targets; the reference's obj_detect.pt used 27
#: classes whose exact list is not recorded in-repo — configurable here.
DEFAULT_DETECTOR_CLASSES = sorted(QUERY_OBJECTS)[:27]


def make_synthetic_detector_data(n, seed=0):
    """(frames u8 [N,160,208,3], targets f32 [N,27]) from synthetic houses."""
    from videonavqa_tpu.datagen.renderer import (
        RenderMode, SyntheticRenderer, generate_synthetic_house,
    )
    from videonavqa_tpu.datagen.vision import objects_in_frame

    rng = np.random.RandomState(seed)
    cls_index = {c: i for i, c in enumerate(DEFAULT_DETECTOR_CLASSES)}
    frames = np.empty((n, 160, 208, 3), dtype=np.uint8)
    targets = np.zeros((n, len(cls_index)), dtype=np.float32)
    i = 0
    while i < n:
        house = generate_synthetic_house(rng, num_rooms=3)
        renderer = SyntheticRenderer(house)
        for _ in range(min(16, n - i)):
            room = house.rooms[rng.randint(len(house.rooms))]
            b = room.bbox
            pose = (rng.uniform(b["min"][0] + 0.5, b["max"][0] - 0.5), 1.2,
                    rng.uniform(b["min"][2] + 0.5, b["max"][2] - 0.5),
                    rng.uniform(0, 360))
            frames[i] = renderer.render(pose, RenderMode.RGB)
            semantic = renderer.render(pose, RenderMode.SEMANTIC)
            depth = renderer.render(pose, RenderMode.DEPTH)
            for name in objects_in_frame(semantic, renderer.rgb_to_obj, depth):
                if name in cls_index:
                    targets[i, cls_index[name]] = 1.0
            i += 1
    return frames, targets


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, help=".npz with 'images' u8 and 'targets'")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="render N synthetic labeled frames instead")
    parser.add_argument("--num_filters", type=int, default=512)
    parser.add_argument("--tail_hidden_dim", type=int, default=1024)
    parser.add_argument("--tail_dropout_p", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--l_rate", type=float, default=1e-4)
    parser.add_argument("--num_epochs", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint_path", type=str)
    parser.add_argument("--export_pt", type=str,
                        help="also export a reference-compatible obj_detect.pt")
    parser.add_argument("--frcnn_pretrained_path", type=str)
    args = parser.parse_args(argv)

    if args.synthetic:
        images, targets = make_synthetic_detector_data(args.synthetic, args.seed)
    elif args.data:
        with np.load(args.data) as z:
            images, targets = z["images"], z["targets"].astype(np.float32)
    else:
        raise SystemExit("need --data or --synthetic N")
    nb_classes = targets.shape[1]
    print(f"{images.shape[0]} frames, {nb_classes} classes, "
          f"{targets.mean():.3f} positive rate")

    key = jax.random.PRNGKey(args.seed)
    if args.frcnn_pretrained_path and os.path.exists(args.frcnn_pretrained_path):
        from videonavqa_tpu.utils import torch_import as ti

        vgg_params = ti.import_vgg_partial(
            ti.load_torch_state_dict(args.frcnn_pretrained_path, key=None))
    else:
        vgg_params = init_vgg_partial(key)
    params, state = init_obj_detector(
        key, nb_classes=nb_classes, num_filters=args.num_filters,
        tail_hidden_dim=args.tail_hidden_dim)

    optimizer = optax.adam(args.l_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, state, opt_state, images_u8, y, rng):
        def loss_fn(p):
            x = images_u8.astype(jnp.float32) / 255.0
            feats = jax.lax.stop_gradient(vgg_partial(vgg_params, x))
            logits, new_state = obj_detector(
                p, state, feats, train=True, logits=True, dropout_rng=rng,
                tail_dropout_p=args.tail_dropout_p)
            loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
            return loss, (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(((logits > 0) == (y > 0.5)).astype(jnp.float32))
        return params, new_state, opt_state, loss, acc

    rng = jax.random.PRNGKey(args.seed + 1)
    n = images.shape[0]
    B = args.batch_size
    for epoch in range(args.num_epochs):
        order = np.random.RandomState(epoch).permutation(n)
        losses, accs = [], []
        for s in range(0, n - B + 1, B):
            idx = order[s: s + B]
            rng, sub = jax.random.split(rng)
            params, state, opt_state, loss, acc = train_step(
                params, state, opt_state, jnp.asarray(images[idx]),
                jnp.asarray(targets[idx]), sub)
            losses.append(float(loss))
            accs.append(float(acc))
        print(f"Epoch {epoch}: loss {np.mean(losses):.4f} "
              f"elementwise-acc {np.mean(accs):.4f}")

    if args.checkpoint_path:
        ckpt.save_checkpoint(args.checkpoint_path, params=params, state=state,
                             meta={"model": "obj_detector", "nb_classes": nb_classes})
    if args.export_pt:
        from videonavqa_tpu.utils.torch_import import export_obj_detector_pt

        export_obj_detector_pt(params, state, args.export_pt)
        print("exported", args.export_pt)


if __name__ == "__main__":
    main()
