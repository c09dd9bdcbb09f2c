"""PyTorch-checkpoint -> EFGH-TPU parameter converter.

One-way converter from the reference's torch ``state_dict`` layout
(reference main.py:132-176) to our Flax param/batch_stats trees, including
the ``convert_dict`` key-remapping hook (reference main.py:212-225).  Used
by the golden-activation parity harness (tests/test_reference_parity.py)
and for loading any externally trained reference checkpoint.

Layout transforms:
  Conv2d          (O, I, kh, kw) -> (kh, kw, I, O)
  ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O)
  Conv1d k=1      (O, I, 1)      -> Dense (I, O)
  Linear          (O, I)         -> Dense (I, O)
  BCL blur conv0  (O, I, F, 1)   -> (F*I, O)   [gather order is f-major]
  BatchNorm       weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import unflatten_dict


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convt2d(w):
    return np.transpose(w, (2, 3, 0, 1))


def _conv1d(w):
    return np.transpose(w[:, :, 0], (1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


def _blur0(w):
    # (O, I, F, 1) -> (F, I, O) -> (F*I, O)
    return np.transpose(w[:, :, :, 0], (2, 1, 0)).reshape(-1, w.shape[0])


def _conv_bn(dst: Dict, sd: Dict, tname: str, jprefix: str, conv_idx=0,
             bn_idx=1, jconv="Conv_0", jbn="BatchNorm_0", has_bias=False):
    """conv_bn_relu Sequential (reference nets/net_utils.py:45-64)."""
    dst[("params",) + tuple(jprefix.split("/")) + (jconv, "Conv_0", "kernel")] = (
        _conv2d(sd[f"{tname}.{conv_idx}.weight"])
    )
    if has_bias:
        dst[("params",) + tuple(jprefix.split("/")) + (jconv, "Conv_0", "bias")] = (
            sd[f"{tname}.{conv_idx}.bias"]
        )
    _bn(dst, sd, f"{tname}.{bn_idx}", f"{jprefix}/{jbn}/BatchNorm_0")


def _bn(dst: Dict, sd: Dict, tname: str, jpath: str):
    parts = tuple(jpath.split("/"))
    dst[("params",) + parts + ("scale",)] = sd[f"{tname}.weight"]
    dst[("params",) + parts + ("bias",)] = sd[f"{tname}.bias"]
    dst[("batch_stats",) + parts + ("mean",)] = sd[f"{tname}.running_mean"]
    dst[("batch_stats",) + parts + ("var",)] = sd[f"{tname}.running_var"]


def _convt_bn(dst: Dict, sd: Dict, tname: str, jprefix: str, bias=False):
    """convt_bn_relu Sequential: ConvT(0), BN(1), LReLU, Conv(3), BN(4)
    (reference nets/net_utils.py:66-98)."""
    p = tuple(jprefix.split("/"))
    dst[("params",) + p + ("ConvTransposeTorch_0", "kernel")] = _convt2d(
        sd[f"{tname}.0.weight"])
    if f"{tname}.0.bias" in sd:
        dst[("params",) + p + ("ConvTransposeTorch_0", "bias")] = sd[f"{tname}.0.bias"]
    _bn(dst, sd, f"{tname}.1", f"{jprefix}/BatchNorm_0/BatchNorm_0")
    dst[("params",) + p + ("Conv_0", "Conv_0", "kernel")] = _conv2d(
        sd[f"{tname}.3.weight"])
    if f"{tname}.3.bias" in sd:
        dst[("params",) + p + ("Conv_0", "Conv_0", "bias")] = sd[f"{tname}.3.bias"]
    _bn(dst, sd, f"{tname}.4", f"{jprefix}/BatchNorm_1/BatchNorm_0")


def _dense(dst: Dict, sd: Dict, tname: str, jprefix: str, conv1d=False):
    p = tuple(jprefix.split("/"))
    w = sd[f"{tname}.weight"]
    dst[("params",) + p + ("kernel",)] = _conv1d(w) if conv1d else _linear(w)
    dst[("params",) + p + ("bias",)] = sd[f"{tname}.bias"]


def _vgg(dst: Dict, sd: Dict, tname: str, jprefix: str, cfg: str):
    """VGG features Sequential: conv/bn/relu triples + pools
    (reference nets/vgg.py:69-83)."""
    widths = {"A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
              "C": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]}[cfg]
    t_idx = 0
    j = 0
    for v in widths:
        if v == "M":
            t_idx += 1
            continue
        p = tuple(jprefix.split("/"))
        dst[("params",) + p + (f"Conv_{j}", "Conv_0", "kernel")] = _conv2d(
            sd[f"{tname}.{t_idx}.weight"])
        dst[("params",) + p + (f"Conv_{j}", "Conv_0", "bias")] = sd[
            f"{tname}.{t_idx}.bias"]
        _bn(dst, sd, f"{tname}.{t_idx + 1}",
            f"{jprefix}/BatchNorm_{j}/BatchNorm_0")
        t_idx += 3  # conv, bn, relu
        j += 1


def _basic_block(dst: Dict, sd: Dict, tname: str, jprefix: str):
    p = tuple(jprefix.split("/"))
    dst[("params",) + p + ("Conv_0", "Conv_0", "kernel")] = _conv2d(
        sd[f"{tname}.conv1.weight"])
    _bn(dst, sd, f"{tname}.bn1", f"{jprefix}/BatchNorm_0/BatchNorm_0")
    dst[("params",) + p + ("Conv_1", "Conv_0", "kernel")] = _conv2d(
        sd[f"{tname}.conv2.weight"])
    _bn(dst, sd, f"{tname}.bn2", f"{jprefix}/BatchNorm_1/BatchNorm_0")
    if f"{tname}.downsample.0.weight" in sd:
        dst[("params",) + p + ("Conv_2", "Conv_0", "kernel")] = _conv2d(
            sd[f"{tname}.downsample.0.weight"])
        _bn(dst, sd, f"{tname}.downsample.1",
            f"{jprefix}/BatchNorm_2/BatchNorm_0")


def _resnet_trunk(dst: Dict, sd: Dict, layer_names, jprefix: str):
    """Four torch resnet layers (each 2 BasicBlocks) -> ResNetStage tree."""
    for li, tname in enumerate(layer_names):
        for bi in range(2):
            _basic_block(dst, sd, f"{tname}.{bi}",
                         f"{jprefix}/layer{li + 1}/BasicBlock_{bi}")


def _feature_tower(dst: Dict, sd: Dict, prefix_map, jprefix: str):
    """F-net tower: vgg11_bn_modified + 3 convt_bn_relu deconvs
    (reference nets/fnet.py:22-31)."""
    vgg_t, d1_t, d2_t, d3_t = prefix_map
    _vgg(dst, sd, f"{vgg_t}.features", f"{jprefix}/vgg", "C")
    _convt_bn(dst, sd, d1_t, f"{jprefix}/deconv1")
    _convt_bn(dst, sd, d2_t, f"{jprefix}/deconv2")
    _convt_bn(dst, sd, d3_t, f"{jprefix}/deconv3")


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    num_bcn: int = 5,
    convert_dict: Dict[str, str] = None,
) -> Tuple[Dict, Dict]:
    """Convert a reference EFGHBackbone state_dict to (params, batch_stats).

    Args:
      sd: {torch_name: numpy array}; DataParallel 'module.' prefixes and
        `convert_dict` renames (reference main.py:212-225) are applied first.
      num_bcn: number of BCL stages in E.
    Returns:
      (params, batch_stats) nested dicts matching EFGHBackbone.init.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}
    for old, new in (convert_dict or {}).items():
        sd = {k.replace(old, new): v for k, v in sd.items()}

    dst: Dict[tuple, np.ndarray] = {}

    # ---- E ----
    for i in range(3):
        _dense(dst, sd, f"E.conv_in.{i}.0", f"E/conv_in_{i}/Dense_0",
               conv1d=True)
    for k in range(1, num_bcn + 1):
        # blur_conv Sequential: Conv(0), ReLU, Conv(2)[, ReLU]
        dst[("params", "E", f"bcn{k}", "blur_kernel_0")] = _blur0(
            sd[f"E.bcn{k}.blur_conv.0.weight"])
        dst[("params", "E", f"bcn{k}", "blur_bias_0")] = sd[
            f"E.bcn{k}.blur_conv.0.bias"]
        dst[("params", "E", f"bcn{k}", "blur_kernel_1")] = sd[
            f"E.bcn{k}.blur_conv.2.weight"][:, :, 0, 0].T
        dst[("params", "E", f"bcn{k}", "blur_bias_1")] = sd[
            f"E.bcn{k}.blur_conv.2.bias"]
    for i in (1, 2, 3):
        _dense(dst, sd, f"E.conv_gn_{i}", f"E/conv_gn_{i}/Dense_0", conv1d=True)
        # E head uses MaskedBatchNorm (stats over real cells only); its
        # scale/bias/mean/var live directly under the module name
        _bn(dst, sd, f"E.bn_gn_{i}", f"E/bn_gn_{i}")
        _dense(dst, sd, f"E.lin_gn_{i}", f"E/lin_gn_{i}/Dense_0")
    _dense(dst, sd, "E.lin_gn_abs", "E/lin_gn_abs/Dense_0")
    _dense(dst, sd, "E.lin_gn_sgn", "E/lin_gn_sgn/Dense_0")

    # ---- H ----
    _vgg(dst, sd, "H.vgg.features", "H/vgg", "A")
    for i in (1, 2, 3):
        _dense(dst, sd, f"H.conv_hrzn_{i}", f"H/conv_hrzn_{i}/Dense_0",
               conv1d=True)
        _bn(dst, sd, f"H.bn_hrzn_{i}", f"H/bn_hrzn_{i}/BatchNorm_0")
        _dense(dst, sd, f"H.lin_hrzn_{i}", f"H/lin_hrzn_{i}/Dense_0")
    _dense(dst, sd, "H.lin_hrzn_abs", "H/lin_hrzn_abs/Dense_0")
    _dense(dst, sd, "H.lin_hrzn_sgn", "H/lin_hrzn_sgn/Dense_0")

    # ---- F ----
    _feature_tower(dst, sd, ("F.vgg_camera", "F.vgg_5_1_camera",
                             "F.vgg_5_2_camera", "F.vgg_5_3_camera"),
                   "F/camera_tower")
    _conv_bn(dst, sd, "F.conv_range", "F/conv_range")
    _feature_tower(dst, sd, ("F.vgg_range", "F.vgg_5_1_range",
                             "F.vgg_5_2_range", "F.vgg_5_3_range"),
                   "F/range_tower")

    # ---- G ----
    _conv_bn(dst, sd, "G.conv_i0", "G/conv_i0")
    _resnet_trunk(dst, sd, ["G.conv_img2", "G.conv_img3", "G.conv_img4",
                            "G.conv_img5"], "G/img_encoder")
    for name in ("convt_img4", "convt_img3", "convt_img2", "convt_dimg",
                 "convt_mask"):
        _convt_bn(dst, sd, f"G.{name}", f"G/{name}")
    _conv_bn(dst, sd, "G.conv_i1", "G/conv_i1")
    _conv_bn(dst, sd, "G.conv_d1", "G/conv_d1")
    _resnet_trunk(dst, sd, ["G.conv2", "G.conv3", "G.conv4", "G.conv5"],
                  "G/fusion_encoder")
    for i in (1, 2, 3):
        _conv_bn(dst, sd, f"G.conv_trs_{i}", f"G/conv_trs_{i}")
    _dense(dst, sd, "G.conv_trs_4", "G/conv_trs_4/DenseTorch_0/Dense_0",
           conv1d=True)

    params = unflatten_dict(
        {k[1:]: v for k, v in dst.items() if k[0] == "params"})
    batch_stats = unflatten_dict(
        {k[1:]: v for k, v in dst.items() if k[0] == "batch_stats"})
    return params, batch_stats


def load_torch_checkpoint(path: str):
    """Load a reference .pth.tar and return its state_dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()}
