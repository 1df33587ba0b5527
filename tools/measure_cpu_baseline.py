#!/usr/bin/env python
"""Measure the PyTorch-reference-equivalent MyGAN train step on CPU.

Freshly-written torch measurement harness reproducing the reference's
per-step work (models/mygannet.py:350-367 + lib/utils.py:94-129) at the
default workload (batch 4 x 3 x 16 x 128 x 128):

  G forward (5-level (2+1)D U-Net) -> cv2 Farneback flow of gt + predicted
  mask videos (CPU, per frame pair) -> dual D forward on real and fake
  pairs -> G backward (weighted BCE) -> D backward (BCE) -> 2x Adam step.

Writes BASELINE_CPU.json with clips/sec for bench.py's ``vs_baseline``.
This is the "CPU baseline" named in BASELINE.json's north star (the
reference publishes no numbers and no GPU is available here).
"""

from __future__ import annotations

import json
import os
import time

import cv2
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

B, C, T, S = 4, 3, 16, 128
NGF, NDF = 32, 32


def factored_conv(cin, cout, k=3, variant="full"):
    """(2+1)D conv block: spatial conv + BN + ReLU + temporal conv, mid
    width from the R(2+1)D formula."""
    if variant == "spatial":
        return nn.Sequential(nn.Conv3d(cin, cout, (1, 3, 3), padding=(0, 1, 1)),
                             nn.BatchNorm3d(cout), nn.LeakyReLU())
    if variant == "temporal":
        return nn.Sequential(nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0)),
                             nn.BatchNorm3d(cout), nn.LeakyReLU())
    mid = (k * k * k * cin * cout) // (k * k * cin + k * cout)
    return nn.Sequential(
        nn.Conv3d(cin, mid, (1, k, k), padding=(0, k // 2, k // 2)),
        nn.BatchNorm3d(mid), nn.ReLU(),
        nn.Conv3d(mid, cout, (k, 1, 1), padding=(k // 2, 0, 0)),
        nn.BatchNorm3d(cout), nn.LeakyReLU(0.2))


class UNetG(nn.Module):
    def __init__(self):
        super().__init__()
        g = NGF
        self.d1 = factored_conv(C, g)
        self.d2 = factored_conv(g, g * 2)
        self.d3 = factored_conv(g * 2, g * 4)
        self.d4 = factored_conv(g * 4, g * 8)
        self.d5 = factored_conv(g * 8, g * 16)
        self.u5 = factored_conv(g * 16, g * 8)
        self.u4 = factored_conv(g * 16, g * 8)
        self.u3 = factored_conv(g * 12, g * 4)
        self.u2 = factored_conv(g * 6, g * 2)
        self.u1 = factored_conv(g * 3, g)
        self.head = nn.Conv3d(g, 1, 3, padding=1, bias=False)
        self.pool = nn.AvgPool3d(2)
        self.up = nn.Upsample(scale_factor=2, mode="trilinear",
                              align_corners=True)
        self.drop = nn.Dropout(0.25)

    def forward(self, x):
        d1 = self.d1(x)
        d2 = self.d2(self.pool(d1))
        d3 = self.d3(self.pool(d2))
        d4 = self.d4(self.pool(d3))
        z = self.d5(self.pool(d4))
        y = self.up(self.drop(self.u5(z)))
        y = self.up(self.drop(self.u4(torch.cat([y, d4], 1))))
        y = self.up(self.drop(self.u3(torch.cat([y, d3], 1))))
        y = self.up(self.drop(self.u2(torch.cat([y, d2], 1))))
        y = self.u1(torch.cat([y, d1], 1))
        return torch.sigmoid(self.head(y))


class DualD(nn.Module):
    def __init__(self):
        super().__init__()
        f = NDF
        self.spatial = nn.ModuleList(
            [factored_conv(ci, co, variant="spatial") for ci, co in
             [(3, f), (f, f * 2), (f * 2, f * 4), (f * 4, f * 8),
              (f * 8, f * 16), (f * 16, f * 32)]])
        self.temporal = nn.ModuleList(
            [factored_conv(ci, co, variant="temporal") for ci, co in
             [(3, f), (f, f * 2), (f * 2, f * 4)]])
        self.s_fc = nn.Linear(f * 32 * 2 * 2, 1)
        self.t_fc = nn.Linear(f * 4 * 2, 1)

    def forward(self, x, flow):
        for m in self.spatial:
            x = F.avg_pool3d(m(x), (1, 2, 2))
        s_feat = x
        x = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.s_fc(x.flatten(1)))
        for m in self.temporal:
            flow = F.avg_pool3d(m(flow), (2, 1, 1))
        t_feat = flow
        flow = flow.mean(dim=(3, 4), keepdim=True)
        t = torch.sigmoid(self.t_fc(flow.flatten(1)))
        return s, s_feat, t, t_feat


def cv2_flow_video(video_b1thw: torch.Tensor) -> torch.Tensor:
    """Reference-style per-frame-pair Farneback flow + HSV encode on CPU."""
    v = video_b1thw.detach().numpy()
    out = np.zeros((v.shape[0], 3, T, S, S), np.float32)
    for b in range(v.shape[0]):
        prev = None
        for t in range(T):
            img = np.uint8(255 * np.clip(v[b, 0, t], 0, 1))
            if prev is not None:
                flow = cv2.calcOpticalFlowFarneback(prev, img, None, 0.5, 3,
                                                    15, 3, 5, 1.2, 0)
                mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1],
                                           angleInDegrees=True)
                hsv = np.zeros((S, S, 3), np.uint8)
                hsv[..., 0] = (ang / 2).astype(np.uint8)
                hsv[..., 1] = 255
                hsv[..., 2] = cv2.normalize(mag, None, 0, 255,
                                            cv2.NORM_MINMAX).astype(np.uint8)
                rgb = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
                out[b, :, t - 1] = rgb.transpose(2, 0, 1) / 127.5 - 1.0
        out[b, :, T - 1] = out[b, :, T - 2]
    return torch.from_numpy(out)


def main(steps: int = 2):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    netg, netd = UNetG(), DualD()
    opt_g = torch.optim.Adam(netg.parameters(), lr=2e-5, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(netd.parameters(), lr=2e-5, betas=(0.5, 0.999))
    bcel = nn.BCELoss()

    x = torch.rand(B, C, T, S, S) * 2 - 1
    gt = (torch.rand(B, 1, T, S, S) > 0.9).float()
    ones = torch.ones(B, 1)
    zeros = torch.zeros(B, 1)

    times = []
    comp: dict[str, list] = {k: [] for k in
                             ("g_fwd", "flow", "d_fwd", "g_bwd", "d_bwd")}
    for i in range(steps + 1):
        t0 = time.perf_counter()
        pred = netg(x)
        gt3 = gt.repeat(1, 3, 1, 1, 1)
        pr3 = pred.detach().repeat(1, 3, 1, 1, 1)
        t1 = time.perf_counter()
        gt_flow = cv2_flow_video(gt)
        pr_flow = cv2_flow_video(pred.detach()[:, :1])
        t2 = time.perf_counter()
        s_r, sf_r, t_r, tf_r = netd(gt3, gt_flow)
        s_f, sf_f, t_f, tf_f = netd(pr3, pr_flow)
        t3 = time.perf_counter()

        opt_g.zero_grad()
        p = pred.clamp(1e-8, 1 - 1e-8)
        con = -(gt * p.log() + 2 * (1 - gt) * (1 - p).log()).mean()
        adv = ((sf_r - sf_f) ** 2).mean() + ((tf_r - tf_f) ** 2).mean()
        (adv.detach() + con * 10).backward(retain_graph=True)
        opt_g.step()
        t4 = time.perf_counter()

        opt_d.zero_grad()
        d_loss = 0.5 * (0.5 * (bcel(s_r, ones) + bcel(t_r, ones))
                        + 0.5 * (bcel(s_f, zeros) + bcel(t_f, zeros)))
        d_loss.backward()
        opt_d.step()
        dt = time.perf_counter() - t0
        times.append(dt)
        for k, v in zip(comp, (t1 - t0, t2 - t1, t3 - t2, t4 - t3,
                               time.perf_counter() - t4)):
            comp[k].append(v)
        print(f"step {i}: {dt:.1f}s  (g_fwd {t1-t0:.1f} flow {t2-t1:.1f} "
              f"d_fwd {t3-t2:.1f} g_bwd {t4-t3:.1f})")

    med = float(np.median(times[1:])) if len(times) > 1 else times[0]
    result = {"clips_per_sec": B / med, "sec_per_step": med, "batch": B,
              "shape": [C, T, S, S], "device": "cpu",
              "threads": torch.get_num_threads(),
              # median seconds per step, same phase boundaries as the TPU
              # step budget in BENCH_NOTES.md (G fwd / flow / dual-D fwd /
              # G bwd+Adam / D bwd+Adam)
              "components_sec": {
                  k: float(np.median(v[1:]) if len(v) > 1 else v[0])
                  for k, v in comp.items()}}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "BASELINE_CPU.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
