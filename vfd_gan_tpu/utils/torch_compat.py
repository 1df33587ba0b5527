"""PyTorch checkpoint interop: map reference ``state_dict``s to our pytrees.

Enables (a) importing reference ``.pth`` checkpoints
(``torch.save({'epoch', 'state_dict'})`` — lib/train_gan.py:52-57) into the
TPU-native models, and (b) golden parity tests that load identical weights
into both frameworks and compare activations.

Layout conventions translated here:
* torch Conv3d weight ``(O, I, kt, kh, kw)``
    -> spatial kernel ``(kh, kw, I, O)``   (when kt == 1)
    -> temporal kernel ``(kt, I, O)``      (when kh == kw == 1)
    -> full kernel ``(kt, kh, kw, I, O)``
* torch Conv2d weight ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)``
* torch Linear weight ``(O, I)`` -> Dense kernel ``(I, O)``; when the input
  was a flattened feature map the row order changes from torch's (C, ...)
  flatten to our channels-last flatten — ``linear_from_torch`` takes the
  pre-flatten shape and permutes rows accordingly.
* BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.

A ``module.``-prefix strip handles DataParallel checkpoints
(fix_model_state_dict behaviour, lib/utils.py:15-22).
"""

from __future__ import annotations

import numpy as np


def strip_module_prefix(state_dict: dict) -> dict:
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv3d_full(w):
    return _np(w).transpose(2, 3, 4, 1, 0)


def conv3d_spatial(w):
    w = _np(w)
    assert w.shape[2] == 1, f"not a spatial kernel: {w.shape}"
    return w[:, :, 0].transpose(2, 3, 1, 0)


def conv3d_temporal(w):
    w = _np(w)
    assert w.shape[3] == w.shape[4] == 1, f"not a temporal kernel: {w.shape}"
    return w[:, :, :, 0, 0].transpose(2, 1, 0)


def conv2d(w):
    return _np(w).transpose(2, 3, 1, 0)


def linear_from_torch(w, pre_flatten_shape=None):
    """torch Linear weight (O, I) -> Dense kernel (I, O), optionally
    permuting rows from a torch (C, *spatial) flatten to our
    (*spatial, C) flatten.  ``pre_flatten_shape`` is torch-order
    ``(C, d1, d2, ...)``."""
    w = _np(w)
    if pre_flatten_shape is not None:
        o = w.shape[0]
        w = w.reshape(o, *pre_flatten_shape)          # (O, C, d1, d2, ...)
        nd = len(pre_flatten_shape)
        perm = (0, *range(2, nd + 1), 1)              # (O, d1, ..., C)
        w = w.transpose(perm).reshape(o, -1)
    return w.T


def bn(sd: dict, prefix: str):
    """BatchNorm params+stats from a torch prefix."""
    return (
        {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def _stconv(sd, prefix):
    """Reference SpatioTemporalConv -> our STConv params/stats
    (spatial conv + mid BN + temporal conv, spatiotempconv.py:49-65)."""
    bn_p, bn_s = bn(sd, f"{prefix}.bn")
    params = {
        "spatial_kernel": conv3d_spatial(sd[f"{prefix}.spatial_conv.weight"]),
        "spatial_bias": _np(sd[f"{prefix}.spatial_conv.bias"]),
        "temporal_kernel": conv3d_temporal(sd[f"{prefix}.temporal_conv.weight"]),
        "temporal_bias": _np(sd[f"{prefix}.temporal_conv.bias"]),
        "mid_bn": {"BatchNorm_0": bn_p},
    }
    stats = {"mid_bn": {"BatchNorm_0": bn_s}}
    return params, stats


def _gen_block(sd, prefix):
    """Reference NetgConv/NetdConv (STConv + BN) -> GenConvBlock/DiscConvBlock."""
    st_p, st_s = _stconv(sd, f"{prefix}.conv")
    bn_p, bn_s = bn(sd, f"{prefix}.bn")
    params = {"stconv": st_p, "bn": {"BatchNorm_0": bn_p}}
    stats = {"stconv": st_s, "bn": {"BatchNorm_0": bn_s}}
    return params, stats


def mygan_generator_from_torch(state_dict: dict) -> dict:
    """Reference NetG (models/mygannet.py:31-101) -> our Generator variables."""
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}
    for name in ("dconv1", "dconv2", "dconv3", "dconv4", "dconv5",
                 "uconv5", "uconv4", "uconv3", "uconv2", "uconv1"):
        params[name], stats[name] = _gen_block(sd, name)
    params["head_kernel"] = conv3d_full(sd["conv_last.weight"])
    return {"params": params, "batch_stats": stats}


def mygan_dualdisc_from_torch(state_dict: dict) -> dict:
    """Reference NetD (models/mygannet.py:200-213) -> our DualDisc variables."""
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}
    for branch, n_blocks, feat_shape in (
            ("spatdisc", 6, None), ("tempdisc", 3, None)):
        bp, bs = {}, {}
        for i in range(1, n_blocks + 1):
            bp[f"dconv{i}"], bs[f"dconv{i}"] = _gen_block(
                sd, f"{branch}.dconv{i}")
        # linear: torch flattens (C, T, H, W); our flatten is (T, H, W, C)
        w = sd[f"{branch}.linear.weight"]
        i_dim = _np(w).shape[1]
        if branch == "spatdisc":
            c = i_dim // 4                      # ndf*32 x 1 x 2 x 2
            pre = (c, 1, 2, 2)
        else:
            c = i_dim // 2                      # ndf*4 x 2 x 1 x 1
            pre = (c, 2, 1, 1)
        bp["linear"] = {"Dense_0": {
            "kernel": linear_from_torch(w, pre),
            "bias": _np(sd[f"{branch}.linear.bias"])}}
        params[branch], stats[branch] = bp, bs
    return {"params": params, "batch_stats": stats}


def stcnn_autoencoder_from_torch(state_dict: dict) -> dict:
    """Reference AutoEncoder (models/mystcnn.py:52-88) -> our AutoEncoder."""
    sd = strip_module_prefix(state_dict)
    name_map = {"down1": "down_sep1", "down2": "down_sep2",
                "down3": "down_sep3", "down4": "down_sep4",
                "up1": "up_sep1", "up2": "up_sep2", "up3": "up_sep3",
                "up4": "up_sep4"}
    params, stats = {}, {}
    for ours, ref in name_map.items():
        bn1_p, bn1_s = bn(sd, f"{ref}.bn1")
        bn2_p, bn2_s = bn(sd, f"{ref}.bn2")
        params[ours] = {
            "space_kernel": conv3d_spatial(sd[f"{ref}.spaceconv.weight"]),
            "time_kernel": conv3d_temporal(sd[f"{ref}.pointwise.weight"]),
            "proj_kernel": conv3d_full(sd[f"{ref}.conv.weight"]),
            "proj_bias": _np(sd[f"{ref}.conv.bias"]),
            "fuse_kernel": conv3d_full(sd[f"{ref}.conv_last.weight"]),
            "bn1": {"BatchNorm_0": bn1_p},
            "bn2": {"BatchNorm_0": bn2_p},
        }
        stats[ours] = {"bn1": {"BatchNorm_0": bn1_s},
                       "bn2": {"BatchNorm_0": bn2_s}}
    params["head_kernel"] = conv3d_full(sd["conv_last.weight"])
    return {"params": params, "batch_stats": stats}


def convlstm_from_torch(state_dict: dict) -> dict:
    """Reference ConvLSTMModel (models/convlstm.py:173-218) -> our model."""
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}
    for i in (1, 2, 3):
        params[f"clstm{i}"] = {"gate_kernel": conv2d(
            sd[f"clstm{i}.cell_list.0.conv.weight"])}
        bn_p, bn_s = bn(sd, f"bn{i}")
        params[f"bn{i}"] = {"BatchNorm_0": bn_p}
        stats[f"bn{i}"] = {"BatchNorm_0": bn_s}
    params["head_kernel"] = conv3d_full(sd["conv_last.weight"])
    return {"params": params, "batch_stats": stats}


def conv3d_transpose_w(w):
    """torch ConvTranspose3d weight (Cin, Cout, kt, kh, kw) ->
    (kt, kh, kw, Cin, Cout)."""
    return _np(w).transpose(2, 3, 4, 0, 1)


def anogan_generator_from_torch(state_dict: dict, nfr: int = 16,
                                isize: int = 128) -> dict:
    """Reference AnoGAN NetG (models/anogan.py:39-79) -> our AnoGenerator.

    The seed Dense layer's output features are reordered from torch's
    (C, T, H, W) reshape to our (T, H, W, C); the 1-D BatchNorm params and
    stats get the same permutation.
    """
    sd = strip_module_prefix(state_dict)
    t0, s0 = nfr // 8, isize // 8
    perm = np.arange(512 * t0 * s0 * s0).reshape(512, t0, s0, s0) \
        .transpose(1, 2, 3, 0).ravel()

    params, stats = {}, {}
    w = _np(sd["layer1.0.weight"])            # (O, 100)
    params["fc"] = {"Dense_0": {"kernel": w.T[:, perm],
                                "bias": _np(sd["layer1.0.bias"])[perm]}}
    params["fc_bn"] = {"scale": _np(sd["layer1.1.weight"])[perm],
                       "bias": _np(sd["layer1.1.bias"])[perm]}
    stats["fc_bn"] = {"mean": _np(sd["layer1.1.running_mean"])[perm],
                      "var": _np(sd["layer1.1.running_var"])[perm]}

    # stage -> (transpose-conv key, conv key, bn key or None)
    layout = {
        "up1": ("layer2.1", "layer2.2", "layer2.3"),
        "up2": ("layer2.6", "layer2.7", "layer2.8"),
        "up3": ("layer3.1", "layer3.2", "layer3.3"),
        "up4": ("layer3.6", "layer3.7", None),
    }
    for i, (name, (tk, ck, bk)) in enumerate(layout.items(), start=1):
        params[f"{name}_tkernel"] = conv3d_transpose_w(sd[f"{tk}.weight"])
        params[f"{name}_tbias"] = _np(sd[f"{tk}.bias"])
        params[f"{name}_ckernel"] = conv3d_full(sd[f"{ck}.weight"])
        params[f"{name}_cbias"] = _np(sd[f"{ck}.bias"])
        if bk is not None:
            p, s = bn(sd, bk)
            params[f"bn{i}"] = {"BatchNorm_0": p}
            stats[f"bn{i}"] = {"BatchNorm_0": s}
    return {"params": params, "batch_stats": stats}


def anogan_discriminator_from_torch(state_dict: dict) -> dict:
    """Reference AnoGAN NetD (models/anogan.py:81-119) -> our
    AnoDiscriminator."""
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}
    conv_map = {"conv1": "layer1.0", "conv2": "layer1.3", "conv3": "layer1.4",
                "conv4": "layer2.0", "conv5": "layer2.1", "conv6": "layer2.5"}
    for ours, ref in conv_map.items():
        params[f"{ours}_kernel"] = conv3d_full(sd[f"{ref}.weight"])
        params[f"{ours}_bias"] = _np(sd[f"{ref}.bias"])
    bn_map = {"bn1": "layer1.1", "bn2": "layer1.5", "bn3": "layer2.2",
              "bn4": "layer2.6"}
    for ours, ref in bn_map.items():
        p, s = bn(sd, ref)
        params[ours] = {"BatchNorm_0": p}
        stats[ours] = {"BatchNorm_0": s}
    w = sd["fc.0.weight"]
    i_dim = _np(w).shape[1]
    spatial = i_dim // 256                    # T*H*W after three /2 pools
    # torch pre-flatten order (C, T, H, W); infer T from C=256, H=W
    hw = int(round((spatial // 2) ** 0.5))
    params["fc"] = {"Dense_0": {
        "kernel": linear_from_torch(w, (256, 2, hw, hw)),
        "bias": _np(sd["fc.0.bias"])}}
    return {"params": params, "batch_stats": stats}


def _sepa(sd, prefix):
    """Reference SepaConv (xception.py:7-21) -> our SepaConv params."""
    return {"space_kernel": conv3d_spatial(sd[f"{prefix}.conv1.weight"]),
            "point_kernel": conv3d_spatial(sd[f"{prefix}.pointwise.weight"])}


def xception_from_torch(state_dict: dict) -> dict:
    """Reference Xception (models/xception.py:92-174) -> our Xception3D.

    Sequential ``rep`` indices depend on the block flavour: entry blocks
    (reps=2, start_with_relu=False) hold SepaConvs at rep.{0,3} and BNs at
    rep.{1,4}; middle blocks (reps=3, start_with_relu=True) at rep.{1,4,7} /
    rep.{2,5,8}; the exit block (reps=2, start_with_relu=True) at rep.{1,4}
    / rep.{2,5} (xception.py:34-60).
    """
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}

    params["stem1_kernel"] = conv3d_spatial(sd["conv1.weight"])
    params["stem2_kernel"] = conv3d_spatial(sd["conv2.weight"])
    for ours, ref in (("stem1_bn", "bn1"), ("stem2_bn", "bn2")):
        p, s = bn(sd, ref)
        params[ours] = {"BatchNorm_0": p}
        stats[ours] = {"BatchNorm_0": s}

    def block(ours, ref, sepa_idx, bn_idx, has_skip):
        bp, bs = {}, {}
        for j, (si, bi) in enumerate(zip(sepa_idx, bn_idx), start=1):
            bp[f"sepa{j}"] = _sepa(sd, f"{ref}.rep.{si}")
            p, s = bn(sd, f"{ref}.rep.{bi}")
            bp[f"bn{j}"] = {"BatchNorm_0": p}
            bs[f"bn{j}"] = {"BatchNorm_0": s}
        if has_skip:
            bp["skip_kernel"] = conv3d_spatial(sd[f"{ref}.skip.weight"])
            p, s = bn(sd, f"{ref}.skipbn")
            bp["skip_bn"] = {"BatchNorm_0": p}
            bs["skip_bn"] = {"BatchNorm_0": s}
        params[ours], stats[ours] = bp, bs

    for i in (1, 2, 3):
        block(f"entry{i}", f"block{i}", (0, 3), (1, 4), True)
    for i in range(8):
        block(f"middle{i + 1}", f"block{i + 4}", (1, 4, 7), (2, 5, 8), False)
    block("exit", "block12", (1, 4), (2, 5), True)

    params["head1"] = _sepa(sd, "conv3")
    params["head2"] = _sepa(sd, "conv4")
    for ours, ref in (("head1_bn", "bn3"), ("head2_bn", "bn4")):
        p, s = bn(sd, ref)
        params[ours] = {"BatchNorm_0": p}
        stats[ours] = {"BatchNorm_0": s}

    for i in (1, 2, 3, 4):
        bp = {"kernel": conv3d_spatial(sd[f"uconv{i}.conv.weight"])}
        p, s = bn(sd, f"uconv{i}.bn")
        bp["bn"] = {"BatchNorm_0": p}
        params[f"deconv{i}"] = bp
        stats[f"deconv{i}"] = {"bn": {"BatchNorm_0": s}}

    params["head_kernel"] = conv3d_spatial(sd["conv_last.weight"])
    params["head_bias"] = _np(sd["conv_last.bias"])
    return {"params": params, "batch_stats": stats}


CONVERTERS = {
    "mygan_generator": mygan_generator_from_torch,
    "mygan_dualdisc": mygan_dualdisc_from_torch,
    "c2plus1d": stcnn_autoencoder_from_torch,
    "clstm": convlstm_from_torch,
    "xception": xception_from_torch,
    "anogan_generator": anogan_generator_from_torch,
    "anogan_discriminator": anogan_discriminator_from_torch,
}


def load_pth(path: str, kind: str, *, trust_pickle: bool = False) -> dict:
    """Load a reference ``.pth`` checkpoint into our variables tree.

    Reference checkpoints are plain ``{'epoch', 'state_dict'}`` tensor dicts
    (lib/train_gan.py:52-57), loadable with ``weights_only=True`` — the safe
    default for untrusted external artifacts.  ``trust_pickle=True`` opts in
    to full pickle loading for exotic checkpoints.
    """
    import torch
    blob = torch.load(path, map_location="cpu",
                      weights_only=not trust_pickle)
    sd = blob.get("state_dict", blob)
    return CONVERTERS[kind](sd)
