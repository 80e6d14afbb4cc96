"""PyTorch checkpoint importers.

The reference ecosystem ships three kinds of .pt/.pth artifacts (README.md:24-31):
- ``vgg16_caffe.pth`` — the Caffe-weights VGG-16 used by the Faster-RCNN fork,
- ``obj_detect.pt`` — the trained ObjDetectCNN ({'state_dict': ...}),
- per-model training checkpoints saved by the harness
  ({'epoch', 'model', 'state_dict', 'optimizer', ...}, eval/q_and_v_eval.py:148-156).

These importers map torch state_dicts onto this framework's parameter pytrees:
Linear/LSTM weights keep torch layout; conv kernels transpose OIHW -> HWIO
(OIDHW -> DHWIO for 3D).

torch is only required when an importer is actually called (it is a baked-in
host-side dependency, never on the device path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_torch_state_dict(path: str, key: str | None = "state_dict"):
    """Load a torch checkpoint into a {name: np.ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def conv2d_from_torch(sd, prefix):
    """torch Conv2d '{prefix}.weight' [O,I,KH,KW] -> {'weight' HWIO, 'bias'}."""
    w = np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))
    out = {"weight": jnp.asarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def conv3d_from_torch(sd, prefix):
    w = np.transpose(sd[f"{prefix}.weight"], (2, 3, 4, 1, 0))
    return {"weight": jnp.asarray(w), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def linear_from_torch(sd, prefix):
    out = {"weight": jnp.asarray(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def bn_from_torch(sd, prefix):
    """-> (params, state) for ops.norm.batch_norm."""
    params = {"weight": jnp.asarray(sd[f"{prefix}.weight"]),
              "bias": jnp.asarray(sd[f"{prefix}.bias"])}
    state = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])}
    return params, state


def lstm_from_torch(sd, prefix, suffix="l0"):
    return {"w_ih": jnp.asarray(sd[f"{prefix}.weight_ih_{suffix}"]),
            "w_hh": jnp.asarray(sd[f"{prefix}.weight_hh_{suffix}"]),
            "b_ih": jnp.asarray(sd[f"{prefix}.bias_ih_{suffix}"]),
            "b_hh": jnp.asarray(sd[f"{prefix}.bias_hh_{suffix}"])}


def lstm_cell_from_torch(sd, prefix):
    return {"w_ih": jnp.asarray(sd[f"{prefix}.weight_ih"]),
            "w_hh": jnp.asarray(sd[f"{prefix}.weight_hh"]),
            "b_ih": jnp.asarray(sd[f"{prefix}.bias_ih"]),
            "b_hh": jnp.asarray(sd[f"{prefix}.bias_hh"])}


def embedding_from_torch(sd, prefix):
    return {"weight": jnp.asarray(sd[f"{prefix}.weight"])}


def layer_norm_from_torch(sd, prefix):
    return {"weight": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def export_obj_detector_pt(params, state, path):
    """Inverse of import_obj_detector: write a {'state_dict': ...} torch .pt so
    detectors trained in this framework drop into the reference's
    obj_detect.pt slot (eval/utils.py:42-51)."""
    import torch

    sd = {}

    def put_bn(prefix, p, s):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.array(p["weight"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.array(p["bias"]))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.array(s["mean"]))
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.array(s["var"]))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def put_conv(prefix, p):
        w = np.array(np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1)))  # HWIO -> OIHW
        sd[f"{prefix}.weight"] = torch.from_numpy(w)
        sd[f"{prefix}.bias"] = torch.from_numpy(np.array(p["bias"]))

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.array(p["weight"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.array(p["bias"]))

    put_bn("bn_input", params["bn_input"], state["bn_input"])
    for b in range(1, 4):
        put_conv(f"conv{b}1", params[f"conv{b}1"])
        put_conv(f"conv{b}2", params[f"conv{b}2"])
        put_bn(f"bn{b}", params[f"bn{b}"], state[f"bn{b}"])
    put_linear("fc_tail1", params["fc_tail1"])
    put_bn("bn_tail1", params["bn_tail1"], state["bn_tail1"])
    put_linear("fc_tail2", params["fc_tail2"])
    torch.save({"state_dict": sd}, path)


def import_vgg_partial(sd):
    """Map a torchvision-style VGG-16 state_dict (``features.N.*`` keys, as in
    vgg16_caffe.pth) onto the partial stem's four convs."""
    # Strip an optional module prefix (e.g. 'RCNN_base.').
    keys = [k for k in sd if k.endswith("features.0.weight") or k == "features.0.weight"]
    prefix = keys[0][: -len("features.0.weight")] if keys else ""
    name_to_idx = {"conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7}
    return {name: conv2d_from_torch(sd, f"{prefix}features.{idx}")
            for name, idx in name_to_idx.items()}


def import_obj_detector(sd):
    """Map obj_detect.pt's state_dict (models/obj_detector.py layer names) onto
    (params, state) for stem.obj_detector."""
    params, state = {}, {}
    params["bn_input"], state["bn_input"] = bn_from_torch(sd, "bn_input")
    for b in range(1, 4):
        params[f"conv{b}1"] = conv2d_from_torch(sd, f"conv{b}1")
        params[f"conv{b}2"] = conv2d_from_torch(sd, f"conv{b}2")
        params[f"bn{b}"], state[f"bn{b}"] = bn_from_torch(sd, f"bn{b}")
    if "fc_tail1.weight" in sd:
        params["fc_tail1"] = linear_from_torch(sd, "fc_tail1")
        params["bn_tail1"], state["bn_tail1"] = bn_from_torch(sd, "bn_tail1")
        params["fc_tail2"] = linear_from_torch(sd, "fc_tail2")
    return params, state
