"""Model-zoo checkpoint exporters: framework parameter pytrees -> reference
PyTorch state_dicts.

The inverse of ``zoo_import.import_model_checkpoint``: models trained in this
framework export to the exact layer names/layouts the reference's torch
classes declare (models/*.py), so a checkpoint trained here drops into the
reference's resume/eval slots (torch.load at eval/q_and_v_eval.py:148-156).
Conv kernels transpose back HWIO -> OIHW (DHWIO -> OIDHW for 3D);
Linear/LSTM already share torch layout.

Reference fidelity note: the FiLM models' conv1x1 skip layers live in plain
Python lists OUTSIDE the reference's state_dict
(models/film_global_pooling_pt_stem.py:93-96, SURVEY §8.9), so reference
checkpoints never contain them — exports mirror that (the leaves are
dropped, and re-imports regenerate them seeded, exactly like a real
reference checkpoint). Round-trip fidelity for ALL leaves is the job of the
framework's native npz checkpoints (utils/checkpoint.py), not this
interchange format.

Usage:
    sd = export_model_checkpoint('film_gp_pt', params, state, cfg)
    save_reference_checkpoint('model.pt', 'film_gp_pt', params, state, cfg,
                              epoch=3)
"""

from __future__ import annotations

import numpy as np

from videonavqa_tpu.utils.zoo_import import _VGG11_CONV_IDX


def _np(x):
    return np.asarray(x)


def _conv2d(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["weight"]).transpose(3, 2, 0, 1)  # HWIO->OIHW
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _conv3d(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["weight"]).transpose(4, 3, 0, 1, 2)
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["weight"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _bn(sd, prefix, p, s):
    sd[f"{prefix}.weight"] = _np(p["weight"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(s["mean"])
    sd[f"{prefix}.running_var"] = _np(s["var"])
    # torch >= 0.4.1 BN state_dicts carry this buffer; the reference's
    # load_state_dict is strict (eval/q_and_v_eval.py:148-156), so exports
    # must include it or every BN-bearing model is rejected on load
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _lstm(sd, prefix, p, suffix="l0"):
    sd[f"{prefix}.weight_ih_{suffix}"] = _np(p["w_ih"])
    sd[f"{prefix}.weight_hh_{suffix}"] = _np(p["w_hh"])
    sd[f"{prefix}.bias_ih_{suffix}"] = _np(p["b_ih"])
    sd[f"{prefix}.bias_hh_{suffix}"] = _np(p["b_hh"])


def _lstm_cell(sd, prefix, p):
    sd[f"{prefix}.weight_ih"] = _np(p["w_ih"])
    sd[f"{prefix}.weight_hh"] = _np(p["w_hh"])
    sd[f"{prefix}.bias_ih"] = _np(p["b_ih"])
    sd[f"{prefix}.bias_hh"] = _np(p["b_hh"])


def _embedding(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["weight"])


def _layer_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["weight"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _frame_trunk(sd, prefix, p, s):
    for i, idx in enumerate(_VGG11_CONV_IDX):
        _conv2d(sd, f"{prefix}.{idx}", p[f"conv{i}"])
        _bn(sd, f"{prefix}.{idx + 1}", p[f"bn{i}"], s[f"bn{i}"])


def _c3d_trunk(sd, p, s):
    _bn(sd, "bn_input", p["bn_input"], s["bn_input"])
    for name in ("conv1", "conv2", "conv3a"):
        _conv3d(sd, name, p[name])
    for b in ("bn1", "bn2", "bn3", "bn6", "bn7"):
        _bn(sd, b, p[b], s[b])
    _linear(sd, "fc6", p["fc6"])
    _linear(sd, "fc7", p["fc7"])


def _film_common(sd, params, state, cfg):
    _embedding(sd, "embed", params["embed"])
    if "w_ih" in params["encoder"]:
        _lstm(sd, "film_layer.0", params["encoder"])
    else:
        _linear(sd, "film_layer.0", params["encoder"])
    _linear(sd, "film_layer.1", params["decoder"])
    trunk, trunk_state = params["trunk"], state["trunk"]
    _conv2d(sd, "conv_init", trunk["conv_init"])
    _bn(sd, "bn_init", trunk["bn_init"], trunk_state["bn_init"])
    for k in range(cfg.num_res_blocks):
        _conv2d(sd, f"film_pipeline.{k}", trunk[f"conv3x3_{k}"])
        # conv1x1_{k} intentionally dropped: absent from reference
        # checkpoints (plain-list layers, SURVEY §8.9)


def export_model_checkpoint(model_name, params, state, cfg):
    """Framework pytrees -> {reference layer name: np.ndarray} state_dict."""
    sd = {}

    if model_name == "bow":
        _embedding(sd, "embed", params["embed"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "lstm":
        _embedding(sd, "embed", params["embed"])
        _lstm(sd, "lstm", params["lstm"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "v_only_cnn3d":
        _c3d_trunk(sd, params, state)
        _linear(sd, "fc8", params["fc8"])
    elif model_name == "v_only_cnn2d_lstm":
        _bn(sd, "input_bn", params["input_bn"], state["input_bn"])
        _frame_trunk(sd, "per_frame_feature_extractor",
                     params["trunk"], state["trunk"])
        _lstm(sd, "lstm", params["lstm"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "concat2d":
        _frame_trunk(sd, "per_frame_feature_extractor",
                     params["trunk"], state["trunk"])
        _lstm(sd, "v_lstm", params["v_lstm"])
        _embedding(sd, "embed", params["embed"])
        _lstm(sd, "q_lstm", params["q_lstm"])
        _linear(sd, "fc_tail", params["fc_tail"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "concat3d":
        _c3d_trunk(sd, params, state)
        _embedding(sd, "embed", params["embed"])
        _lstm(sd, "q_lstm", params["q_lstm"])
        _linear(sd, "fc_tail", params["fc_tail"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "film_gp_pt":
        _film_common(sd, params, state, cfg)
        _conv2d(sd, "c1x1_tail", params["c1x1_tail"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "film_attn_pt":
        _film_common(sd, params, state, cfg)
        _linear(sd, "fc_embed_attn", params["fc_embed_attn"])
        _linear(sd, "fc_attn_1", params["fc_attn_1"])
        _linear(sd, "fc_hidden_attn", params["fc_hidden_attn"])
        _lstm_cell(sd, "lstm_attn", params["lstm_attn"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "time_multi_hop":
        _embedding(sd, "embed", params["embed"])
        _lstm(sd, "q_encoder", params["q_encoder"])
        _layer_norm(sd, "encoder_norm", params["encoder_norm"])
        _linear(sd, "fc_hidden_attn", params["fc_hidden_attn"])
        _linear(sd, "fc_attn_out", params["fc_attn_out"])
        _layer_norm(sd, "decoder_norm", params["decoder_norm"])
        trunk, trunk_state = params["trunk"], state["trunk"]
        _conv2d(sd, "conv_init", trunk["conv_init"])
        _bn(sd, "bn_init", trunk["bn_init"], trunk_state["bn_init"])
        for k in range(cfg.num_res_blocks):
            _conv2d(sd, f"film_pipeline.{k}", trunk[f"conv3x3_{k}"])
        _conv2d(sd, "c1x1_tail", params["c1x1_tail"])
        _linear(sd, "out_linear", params["out_linear"])
    elif model_name == "mac":
        _embedding(sd, "embed", params["embed"])
        _lstm(sd, "lstm", params["lstm_fwd"])
        _lstm(sd, "lstm", params["lstm_bwd"], suffix="l0_reverse")
        _linear(sd, "lstm_proj", params["lstm_proj"])
        _conv2d(sd, "conv.0", params["conv0"])
        _conv2d(sd, "conv.2", params["conv1"])
        _conv2d(sd, "conv.4", params["conv2"])
        _lstm(sd, "lstm_tail", params["lstm_tail"])
        _linear(sd, "classifier.0", params["classifier0"])
        _linear(sd, "classifier.2", params["classifier2"])
        mac = params["mac"]
        for i in range(cfg.mac_max_step):
            _linear(sd, f"mac.control.position_aware.{i}",
                    mac["position_aware"][i])
        _linear(sd, "mac.control.control_question", mac["control_question"])
        _linear(sd, "mac.control.attn", mac["control_attn"])
        _linear(sd, "mac.read.mem", mac["read_mem"])
        _linear(sd, "mac.read.concat", mac["read_concat"])
        _linear(sd, "mac.read.attn", mac["read_attn"])
        _linear(sd, "mac.write.concat", mac["write_concat"])
        sd["mac.mem_0"] = _np(mac["mem_0"])
        sd["mac.control_0"] = _np(mac["control_0"])
    else:
        raise KeyError(f"no exporter for model {model_name!r}")

    def finish(v):
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.integer):  # e.g. num_batches_tracked
            return np.ascontiguousarray(v)
        return np.ascontiguousarray(v.astype(np.float32))

    return {k: finish(v) for k, v in sd.items()}


def save_reference_checkpoint(path, model_name, params, state, cfg, *,
                              epoch=0, extra=None):
    """torch.save a checkpoint in the reference harness's on-disk format
    ({'epoch', 'model', 'state_dict'}, eval/q_and_v_eval.py:148-156) so the
    reference's resume/eval tooling loads it unmodified."""
    import torch

    sd = export_model_checkpoint(model_name, params, state, cfg)
    obj = {"epoch": int(epoch), "model": model_name,
           "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}
    if extra:
        obj.update(extra)
    torch.save(obj, path)
    return path
