"""Export our checkpoints back to reference-format ``.pth`` state dicts.

The exact inverse of ``utils/torch_compat.py``: every converter there maps a
reference ``torch.save({'epoch', 'state_dict'})`` checkpoint
(lib/train_gan.py:52-57) into our pytrees; this module maps the pytrees back,
so TPU-trained weights can be loaded by the reference's own ``test.py``
(``/root/reference/test.py:115-144``) or any existing torch deployment of it.

Layout inverses (see torch_compat.py's forward table):
* spatial kernel ``(kh, kw, I, O)`` -> torch Conv3d ``(O, I, 1, kh, kw)``
* temporal kernel ``(kt, I, O)``    -> torch Conv3d ``(O, I, kt, 1, 1)``
* full kernel ``(kt, kh, kw, I, O)``-> torch Conv3d ``(O, I, kt, kh, kw)``
* Dense kernel ``(I, O)`` -> torch Linear ``(O, I)``, un-permuting rows from
  our channels-last flatten back to torch's ``(C, *spatial)`` flatten.
* scale/bias/mean/var -> BN weight/bias/running_mean/running_var, plus a
  zero ``num_batches_tracked`` (irrelevant at the reference's momentum=0.1).

Round-trip exactness (reference sd -> from_torch -> to_torch == reference sd
for every key and model family) is pinned by tests/test_torch_export.py.
"""

from __future__ import annotations

import numpy as np

_F32 = np.float32


def _np(x) -> np.ndarray:
    a = np.asarray(x)
    return a.astype(_F32) if a.dtype != _F32 else a


def full_to_conv3d(k):
    return _np(k).transpose(4, 3, 0, 1, 2)


def spatial_to_conv3d(k):
    return _np(k).transpose(3, 2, 0, 1)[:, :, None]


def temporal_to_conv3d(k):
    return _np(k).transpose(2, 1, 0)[:, :, :, None, None]


def kernel_to_conv2d(k):
    return _np(k).transpose(3, 2, 0, 1)


def transpose_to_conv3d_transpose(k):
    """(kt, kh, kw, Cin, Cout) -> torch ConvTranspose3d (Cin, Cout, kt, kh, kw)."""
    return _np(k).transpose(3, 4, 0, 1, 2)


def linear_to_torch(kernel, pre_flatten_shape=None):
    """Inverse of ``torch_compat.linear_from_torch``: Dense kernel (I, O) ->
    torch Linear weight (O, I); ``pre_flatten_shape`` is torch-order
    ``(C, d1, d2, ...)`` of the flattened feature map."""
    w = _np(kernel).T                                   # (O, I)
    if pre_flatten_shape is not None:
        o = w.shape[0]
        c, *spatial = pre_flatten_shape
        nd = len(pre_flatten_shape)
        w = w.reshape(o, *spatial, c)                   # (O, d1, ..., C)
        w = w.transpose((0, nd, *range(1, nd)))         # (O, C, d1, ...)
        w = w.reshape(o, -1)
    return w


def _bn(out: dict, prefix: str, p: dict, s: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _unwrap_bn(node):
    """Our BN subtrees nest under flax's ``BatchNorm_0``; AnoGAN's fc_bn is
    stored flat.  Accept both."""
    return node.get("BatchNorm_0", node) if isinstance(node, dict) else node


def _stconv(out, prefix, p, s):
    """Inverse of torch_compat._stconv (reference SpatioTemporalConv,
    spatiotempconv.py:49-65)."""
    out[f"{prefix}.spatial_conv.weight"] = spatial_to_conv3d(p["spatial_kernel"])
    out[f"{prefix}.spatial_conv.bias"] = _np(p["spatial_bias"])
    out[f"{prefix}.temporal_conv.weight"] = temporal_to_conv3d(p["temporal_kernel"])
    out[f"{prefix}.temporal_conv.bias"] = _np(p["temporal_bias"])
    _bn(out, f"{prefix}.bn", _unwrap_bn(p["mid_bn"]), _unwrap_bn(s["mid_bn"]))


def _gen_block(out, prefix, p, s):
    """Inverse of torch_compat._gen_block (reference NetgConv/NetdConv)."""
    _stconv(out, f"{prefix}.conv", p["stconv"], s["stconv"])
    _bn(out, f"{prefix}.bn", _unwrap_bn(p["bn"]), _unwrap_bn(s["bn"]))


def mygan_generator_to_torch(variables: dict) -> dict:
    """Our Generator variables -> reference NetG state_dict
    (models/mygannet.py:31-101)."""
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    for name in ("dconv1", "dconv2", "dconv3", "dconv4", "dconv5",
                 "uconv5", "uconv4", "uconv3", "uconv2", "uconv1"):
        _gen_block(out, name, p[name], s[name])
    out["conv_last.weight"] = full_to_conv3d(p["head_kernel"])
    return out


def mygan_dualdisc_to_torch(variables: dict) -> dict:
    """Our DualDisc variables -> reference NetD state_dict
    (models/mygannet.py:200-213).

    Assumes the reference's isize=128 feature geometry (its Linear sizes
    hardcode 128 — models/mygannet.py:134,176 — so only 128-sized
    checkpoints are loadable by the reference anyway); the import
    direction makes the same assumption."""
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    for branch, n_blocks in (("spatdisc", 6), ("tempdisc", 3)):
        bp, bs = p[branch], s[branch]
        for i in range(1, n_blocks + 1):
            _gen_block(out, f"{branch}.dconv{i}", bp[f"dconv{i}"],
                       bs[f"dconv{i}"])
        dense = bp["linear"]["Dense_0"]
        i_dim = np.asarray(dense["kernel"]).shape[0]
        if branch == "spatdisc":
            pre = (i_dim // 4, 1, 2, 2)         # ndf*32 x 1 x 2 x 2
        else:
            pre = (i_dim // 2, 2, 1, 1)         # ndf*4 x 2 x 1 x 1
        out[f"{branch}.linear.weight"] = linear_to_torch(dense["kernel"], pre)
        out[f"{branch}.linear.bias"] = _np(dense["bias"])
    return out


def stcnn_autoencoder_to_torch(variables: dict) -> dict:
    """Our AutoEncoder variables -> reference AutoEncoder state_dict
    (models/mystcnn.py:52-88)."""
    p, s = variables["params"], variables["batch_stats"]
    name_map = {"down1": "down_sep1", "down2": "down_sep2",
                "down3": "down_sep3", "down4": "down_sep4",
                "up1": "up_sep1", "up2": "up_sep2", "up3": "up_sep3",
                "up4": "up_sep4"}
    out: dict = {}
    for ours, ref in name_map.items():
        bp, bs = p[ours], s[ours]
        out[f"{ref}.spaceconv.weight"] = spatial_to_conv3d(bp["space_kernel"])
        out[f"{ref}.pointwise.weight"] = temporal_to_conv3d(bp["time_kernel"])
        out[f"{ref}.conv.weight"] = full_to_conv3d(bp["proj_kernel"])
        out[f"{ref}.conv.bias"] = _np(bp["proj_bias"])
        out[f"{ref}.conv_last.weight"] = full_to_conv3d(bp["fuse_kernel"])
        _bn(out, f"{ref}.bn1", _unwrap_bn(bp["bn1"]), _unwrap_bn(bs["bn1"]))
        _bn(out, f"{ref}.bn2", _unwrap_bn(bp["bn2"]), _unwrap_bn(bs["bn2"]))
    out["conv_last.weight"] = full_to_conv3d(p["head_kernel"])
    return out


def convlstm_to_torch(variables: dict) -> dict:
    """Our ConvLSTMModel variables -> reference state_dict
    (models/convlstm.py:173-218)."""
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    for i in (1, 2, 3):
        out[f"clstm{i}.cell_list.0.conv.weight"] = kernel_to_conv2d(
            p[f"clstm{i}"]["gate_kernel"])
        _bn(out, f"bn{i}", _unwrap_bn(p[f"bn{i}"]), _unwrap_bn(s[f"bn{i}"]))
    out["conv_last.weight"] = full_to_conv3d(p["head_kernel"])
    return out


def anogan_generator_to_torch(variables: dict, nfr: int = 16,
                              isize: int = 128) -> dict:
    """Our AnoGenerator variables -> reference AnoGAN NetG state_dict
    (models/anogan.py:39-79).  Un-permutes the seed Dense features from our
    (T, H, W, C) order back to torch's (C, T, H, W) reshape order."""
    p, s = variables["params"], variables["batch_stats"]
    t0, s0 = nfr // 8, isize // 8
    perm = np.arange(512 * t0 * s0 * s0).reshape(512, t0, s0, s0) \
        .transpose(1, 2, 3, 0).ravel()
    inv = np.argsort(perm)

    out: dict = {}
    dense = p["fc"]["Dense_0"]
    out["layer1.0.weight"] = _np(dense["kernel"])[:, inv].T
    out["layer1.0.bias"] = _np(dense["bias"])[inv]
    out["layer1.1.weight"] = _np(p["fc_bn"]["scale"])[inv]
    out["layer1.1.bias"] = _np(p["fc_bn"]["bias"])[inv]
    out["layer1.1.running_mean"] = _np(s["fc_bn"]["mean"])[inv]
    out["layer1.1.running_var"] = _np(s["fc_bn"]["var"])[inv]
    out["layer1.1.num_batches_tracked"] = np.asarray(0, np.int64)

    layout = {
        "up1": ("layer2.1", "layer2.2", "layer2.3"),
        "up2": ("layer2.6", "layer2.7", "layer2.8"),
        "up3": ("layer3.1", "layer3.2", "layer3.3"),
        "up4": ("layer3.6", "layer3.7", None),
    }
    for i, (name, (tk, ck, bk)) in enumerate(layout.items(), start=1):
        out[f"{tk}.weight"] = transpose_to_conv3d_transpose(
            p[f"{name}_tkernel"])
        out[f"{tk}.bias"] = _np(p[f"{name}_tbias"])
        out[f"{ck}.weight"] = full_to_conv3d(p[f"{name}_ckernel"])
        out[f"{ck}.bias"] = _np(p[f"{name}_cbias"])
        if bk is not None:
            _bn(out, bk, _unwrap_bn(p[f"bn{i}"]), _unwrap_bn(s[f"bn{i}"]))
    return out


def anogan_discriminator_to_torch(variables: dict) -> dict:
    """Our AnoDiscriminator variables -> reference AnoGAN NetD state_dict
    (models/anogan.py:81-119)."""
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    conv_map = {"conv1": "layer1.0", "conv2": "layer1.3", "conv3": "layer1.4",
                "conv4": "layer2.0", "conv5": "layer2.1", "conv6": "layer2.5"}
    for ours, ref in conv_map.items():
        out[f"{ref}.weight"] = full_to_conv3d(p[f"{ours}_kernel"])
        out[f"{ref}.bias"] = _np(p[f"{ours}_bias"])
    bn_map = {"bn1": "layer1.1", "bn2": "layer1.5", "bn3": "layer2.2",
              "bn4": "layer2.6"}
    for ours, ref in bn_map.items():
        _bn(out, ref, _unwrap_bn(p[ours]), _unwrap_bn(s[ours]))
    dense = p["fc"]["Dense_0"]
    i_dim = np.asarray(dense["kernel"]).shape[0]
    spatial = i_dim // 256
    hw = int(round((spatial // 2) ** 0.5))
    out["fc.0.weight"] = linear_to_torch(dense["kernel"], (256, 2, hw, hw))
    out["fc.0.bias"] = _np(dense["bias"])
    return out


def _sepa(out, prefix, p):
    out[f"{prefix}.conv1.weight"] = spatial_to_conv3d(p["space_kernel"])
    out[f"{prefix}.pointwise.weight"] = spatial_to_conv3d(p["point_kernel"])


def xception_to_torch(variables: dict) -> dict:
    """Our Xception3D variables -> reference Xception state_dict
    (models/xception.py:92-174).  Sequential ``rep`` indices follow the block
    flavours documented in torch_compat.xception_from_torch."""
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}

    out["conv1.weight"] = spatial_to_conv3d(p["stem1_kernel"])
    out["conv2.weight"] = spatial_to_conv3d(p["stem2_kernel"])
    for ours, ref in (("stem1_bn", "bn1"), ("stem2_bn", "bn2")):
        _bn(out, ref, _unwrap_bn(p[ours]), _unwrap_bn(s[ours]))

    def block(ours, ref, sepa_idx, bn_idx, has_skip):
        bp, bs = p[ours], s[ours]
        for j, (si, bi) in enumerate(zip(sepa_idx, bn_idx), start=1):
            _sepa(out, f"{ref}.rep.{si}", bp[f"sepa{j}"])
            _bn(out, f"{ref}.rep.{bi}", _unwrap_bn(bp[f"bn{j}"]),
                _unwrap_bn(bs[f"bn{j}"]))
        if has_skip:
            out[f"{ref}.skip.weight"] = spatial_to_conv3d(bp["skip_kernel"])
            _bn(out, f"{ref}.skipbn", _unwrap_bn(bp["skip_bn"]),
                _unwrap_bn(bs["skip_bn"]))

    for i in (1, 2, 3):
        block(f"entry{i}", f"block{i}", (0, 3), (1, 4), True)
    for i in range(8):
        block(f"middle{i + 1}", f"block{i + 4}", (1, 4, 7), (2, 5, 8), False)
    block("exit", "block12", (1, 4), (2, 5), True)

    _sepa(out, "conv3", p["head1"])
    _sepa(out, "conv4", p["head2"])
    for ours, ref in (("head1_bn", "bn3"), ("head2_bn", "bn4")):
        _bn(out, ref, _unwrap_bn(p[ours]), _unwrap_bn(s[ours]))

    for i in (1, 2, 3, 4):
        out[f"uconv{i}.conv.weight"] = spatial_to_conv3d(
            p[f"deconv{i}"]["kernel"])
        _bn(out, f"uconv{i}.bn", _unwrap_bn(p[f"deconv{i}"]["bn"]),
            _unwrap_bn(s[f"deconv{i}"]["bn"]))

    out["conv_last.weight"] = spatial_to_conv3d(p["head_kernel"])
    out["conv_last.bias"] = _np(p["head_bias"])
    return out


EXPORTERS = {
    "mygan_generator": mygan_generator_to_torch,
    "mygan_dualdisc": mygan_dualdisc_to_torch,
    "c2plus1d": stcnn_autoencoder_to_torch,
    "clstm": convlstm_to_torch,
    "xception": xception_to_torch,
    "anogan_generator": anogan_generator_to_torch,
    "anogan_discriminator": anogan_discriminator_to_torch,
}


def save_pth(path: str, variables: dict, kind: str, epoch: int = 0) -> None:
    """Write a reference-format ``{'epoch', 'state_dict'}`` ``.pth`` file
    (lib/train_gan.py:52-57) loadable with ``weights_only=True``."""
    import torch
    # copy=True: exporter outputs may be non-writable views of jax buffers
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in EXPORTERS[kind](variables).items()}
    torch.save({"epoch": int(epoch), "state_dict": sd}, path)
