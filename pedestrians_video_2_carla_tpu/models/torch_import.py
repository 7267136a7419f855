"""Torch-checkpoint importers: map reference-model state_dicts onto this
framework's flax parameter trees, weight-for-weight.

Covers the BASELINE.json weight-compatibility set (SURVEY.md §2.9): LinearAE,
Seq2SeqEmbeddings, the VideoPose3D temporal-conv lifter and PoseFormer.
Conventions handled: torch Linear ``weight (out,in)`` -> flax ``kernel
(in,out)``; torch LSTM packed i,f,g,o gates -> flax per-gate kernels with
``bias_ih+bias_hh`` folded into the h-side bias; Conv1d ``(out,in,k)`` -> flax
``(k,in,out)``; timm packed qkv -> flax per-head query/key/value kernels.
"""
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_checkpoint(path: str, prefix: Optional[str] = None
                          ) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, unwrapping Lightning's
    ``state_dict`` and an optional submodule prefix (the reference stores the
    movements model under ``movements_model.``)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = data.get("state_dict", data) if isinstance(data, dict) \
        else data
    out = {}
    for k, v in state_dict.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    return out


def _linear(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.copy(),
            "bias": sd[f"{name}.bias"].copy()}


def _lstm_cell(sd, prefix, layer):
    """torch nn.LSTM layer -> flax OptimizedLSTMCell params."""
    w_ih = sd[f"{prefix}.weight_ih_l{layer}"]
    w_hh = sd[f"{prefix}.weight_hh_l{layer}"]
    b = sd.get(f"{prefix}.bias_ih_l{layer}", 0) \
        + sd.get(f"{prefix}.bias_hh_l{layer}", 0)
    H = w_hh.shape[1]
    gates = ("i", "f", "g", "o")
    cell = {}
    for gi, g in enumerate(gates):
        sl = slice(gi * H, (gi + 1) * H)
        cell[f"i{g}"] = {"kernel": w_ih[sl].T.copy()}
        cell[f"h{g}"] = {"kernel": w_hh[sl].T.copy(),
                        "bias": np.asarray(b)[sl].copy()
                        if not np.isscalar(b) else np.zeros(H, np.float32)}
    return cell


def import_linear_ae(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``LinearAE`` (``movements/linear_ae/linear_ae.py``): name-
    mangled ``_LinearAE__encoder.{0,2,4}`` + ``_LinearAE__decoder.{0,2,4}``
    Sequential Linears -> Dense_0..Dense_5."""
    params = {}
    for i, idx in enumerate((0, 2, 4)):
        params[f"Dense_{i}"] = _linear(state_dict,
                                       f"_LinearAE__encoder.{idx}")
    for i, idx in enumerate((0, 2, 4)):
        params[f"Dense_{i + 3}"] = _linear(state_dict,
                                           f"_LinearAE__decoder.{idx}")
    return params


def import_seq2seq_embeddings(state_dict: Dict[str, np.ndarray],
                              num_layers: int = 2) -> Dict[str, Any]:
    """Reference ``Seq2SeqEmbeddings``: per-joint ``embeddings.{j}`` Linears +
    ``encoder.rnn`` / ``decoder.rnn`` stacked LSTMs + ``decoder.fc_out``."""
    params: Dict[str, Any] = {}
    joints = sorted({int(k.split(".")[1]) for k in state_dict
                     if k.startswith("embeddings.")})
    params["joint_embeddings"] = np.stack(
        [state_dict[f"embeddings.{j}.weight"].T for j in joints])
    params["joint_embeddings_bias"] = np.stack(
        [state_dict[f"embeddings.{j}.bias"] for j in joints])
    for layer in range(num_layers):
        params[f"OptimizedLSTMCell_{layer}"] = _lstm_cell(
            state_dict, "encoder.rnn", layer)
    decoder: Dict[str, Any] = {
        "fc_out": _linear(state_dict, "decoder.fc_out")}
    for layer in range(num_layers):
        decoder[f"lstm_{layer}"] = _lstm_cell(state_dict, "decoder.rnn",
                                              layer)
    params["decoder"] = decoder
    return params


def import_video_pose_3d(state_dict: Dict[str, np.ndarray],
                         num_blocks: Optional[int] = None
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Public VideoPose3D ``TemporalModel``: ``expand_conv``/``expand_bn``,
    ``layers_conv.{2i,2i+1}``/``layers_bn.{2i,2i+1}``, ``shrink``.
    Returns ``(params, batch_stats)``."""
    def conv(name):
        w = state_dict[f"{name}.weight"]
        p = {"kernel": np.transpose(w, (2, 1, 0)).copy()}
        if f"{name}.bias" in state_dict:
            p["bias"] = state_dict[f"{name}.bias"].copy()
        return p

    def bn(name):
        return ({"scale": state_dict[f"{name}.weight"].copy(),
                 "bias": state_dict[f"{name}.bias"].copy()},
                {"mean": state_dict[f"{name}.running_mean"].copy(),
                 "var": state_dict[f"{name}.running_var"].copy()})

    if num_blocks is None:
        num_blocks = len({int(k.split(".")[1]) for k in state_dict
                          if k.startswith("layers_conv.")}) // 2

    params: Dict[str, Any] = {"expand_conv": conv("expand_conv")}
    batch_stats: Dict[str, Any] = {}
    p, s = bn("expand_bn")
    params["BatchNorm_0"], batch_stats["BatchNorm_0"] = p, s
    bn_idx = 1
    for i in range(num_blocks):
        params[f"layer{i}_conv1"] = conv(f"layers_conv.{2 * i}")
        p, s = bn(f"layers_bn.{2 * i}")
        params[f"BatchNorm_{bn_idx}"], batch_stats[f"BatchNorm_{bn_idx}"] \
            = p, s
        bn_idx += 1
        params[f"layer{i}_conv2"] = conv(f"layers_conv.{2 * i + 1}")
        p, s = bn(f"layers_bn.{2 * i + 1}")
        params[f"BatchNorm_{bn_idx}"], batch_stats[f"BatchNorm_{bn_idx}"] \
            = p, s
        bn_idx += 1
    shrink_w = state_dict["shrink.weight"]  # (out, in, 1)
    shrink = {"kernel": shrink_w[..., 0].T.copy()}
    if "shrink.bias" in state_dict:
        shrink["bias"] = state_dict["shrink.bias"].copy()
    else:
        shrink["bias"] = np.zeros(shrink_w.shape[0], np.float32)
    params["shrink"] = shrink
    return params, batch_stats


def _attention(sd, prefix, num_heads):
    """timm packed-qkv attention -> the fused ``_Attention`` module
    (``pose_former.py``): the qkv projection stays PACKED, so the mapping is
    a plain transpose — torch's (3D, D) row-major [q; k; v] output ordering
    is exactly the flax kernel's column ordering."""
    qkv_w = sd[f"{prefix}.qkv.weight"]       # (3D, D)
    D = qkv_w.shape[1]
    qkv_b = sd.get(f"{prefix}.qkv.bias", np.zeros(3 * D, np.float32))
    out_w = sd[f"{prefix}.proj.weight"]      # (D, D)
    out_b = sd.get(f"{prefix}.proj.bias", np.zeros(D, np.float32))
    return {
        "qkv": {"kernel": qkv_w.T.copy(), "bias": qkv_b.copy()},
        "proj": {"kernel": out_w.T.copy(), "bias": out_b.copy()},
    }


def _layer_norm(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(),
            "bias": sd[f"{name}.bias"].copy()}


def import_pose_former(state_dict: Dict[str, np.ndarray],
                       depth: int = 4, num_heads: int = 8) -> Dict[str, Any]:
    """Public PoseFormer ``PoseTransformer`` (zczcwh/PoseFormer
    model_poseformer.py): spatial/temporal pre-norm blocks with packed qkv,
    weighted-mean Conv1d and a LayerNorm+Linear head."""
    def block(prefix):
        return {
            "LayerNorm_0": _layer_norm(state_dict, f"{prefix}.norm1"),
            "_Attention_0": _attention(
                state_dict, f"{prefix}.attn", num_heads),
            "LayerNorm_1": _layer_norm(state_dict, f"{prefix}.norm2"),
            "_Mlp_0": {
                "Dense_0": _linear(state_dict, f"{prefix}.mlp.fc1"),
                "Dense_1": _linear(state_dict, f"{prefix}.mlp.fc2"),
            },
        }

    params: Dict[str, Any] = {
        "spatial_patch_embed": _linear(state_dict,
                                       "Spatial_patch_to_embedding"),
        "spatial_pos_embed": state_dict["Spatial_pos_embed"]
        .reshape(1, 1, *state_dict["Spatial_pos_embed"].shape[-2:]).copy(),
        "temporal_pos_embed": state_dict["Temporal_pos_embed"].copy(),
        "spatial_norm": _layer_norm(state_dict, "Spatial_norm"),
        "temporal_norm": _layer_norm(state_dict, "Temporal_norm"),
        # weighted_mean is a Conv1d(num_frame, 1, 1): weight (1, rf, 1)
        "weighted_mean": state_dict["weighted_mean.weight"]
        .reshape(-1).copy(),
        "weighted_mean_bias": state_dict.get(
            "weighted_mean.bias", np.zeros(1, np.float32)).copy(),
        "head_norm": _layer_norm(state_dict, "head.0"),
        "head": _linear(state_dict, "head.1"),
    }
    for i in range(depth):
        params[f"spatial_block_{i}"] = block(f"Spatial_blocks.{i}")
        params[f"temporal_block_{i}"] = block(f"blocks.{i}")
    return params


def graft_resnet_backbone(state_dict: Dict[str, np.ndarray],
                          params: Dict[str, Any],
                          batch_stats: Dict[str, Any],
                          module_name: str = "ResNet_0"
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Inject torchvision ResNet-50/101 pretrained weights into an
    initialized UniPoseLSTM/P0 variables tree (the reference monkey-patches
    torchvision pretrained weights into the UniPose backbone,
    ``modules/pose_estimation/unipose/overrides.py:33-46``).

    The first conv is special-cased: UniPose feeds RGB + the centermap
    channel (4 input channels), so the torchvision (7,7,3,64) kernel fills
    the RGB slice and the extra-channel slice keeps its init (the reference
    override rebuilds conv1 at in_channels=4 the same way). Returns new
    (params, batch_stats) trees with the backbone subtree replaced."""
    from .backbones.resnet import import_torchvision_resnet

    stage_sizes = (3, 4, 23, 3) if any(
        k.startswith("layer3.10.") for k in state_dict) else (3, 4, 6, 3)
    bb_params, bb_stats = import_torchvision_resnet(state_dict, stage_sizes)

    target_conv1 = params[module_name]["conv1"]["kernel"]
    tv_conv1 = bb_params["conv1"]["kernel"]
    in_ch = target_conv1.shape[2]
    if in_ch != tv_conv1.shape[2]:
        merged = np.array(target_conv1)
        merged[:, :, :tv_conv1.shape[2], :] = tv_conv1
        bb_params["conv1"]["kernel"] = merged

    new_params = dict(params)
    new_params[module_name] = bb_params
    new_stats = dict(batch_stats or {})
    new_stats[module_name] = bb_stats
    return new_params, new_stats


IMPORTERS = {
    "LinearAE": import_linear_ae,
    "Seq2SeqEmbeddings": import_seq2seq_embeddings,
    "VideoPose3D": import_video_pose_3d,
    "PoseFormer": import_pose_former,
}
