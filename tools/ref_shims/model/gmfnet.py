"""Torch gmfnet twin for executing /root/reference end to end.

The reference dynamically imports ``model.gmfnet.Net`` but ships no
model code (SURVEY.md §0), so any execution of its pipeline needs one
supplied.  This is the torch expression of dmfusion's own gmfnet design
(dmfusion/models/gmfnet.py — dual conv branches, sigmoid-gated fusion,
two stride-2 residual stages, pooled MLP head) so the A/B in
tools/reference_ab.py compares the same architecture family trained by
the reference's torch loop vs dmfusion's jitted loop.  Interface
contract: ``Net(args=cfg)`` called as ``model(ms, pan)`` on CHW batches
(solver/mainsolver.py:52, train/dataset.py:168-185).
"""

import torch
import torch.nn as nn


def _gn(c):
    g = min(8, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(g, c)


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, stride=stride, padding=1)
        self.norm = _gn(cout)
        self.act = nn.ReLU()

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class _ResBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.b1 = _ConvBlock(cin, cout, stride)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.n2 = _gn(cout)
        self.sc = (nn.Conv2d(cin, cout, 1, stride=stride)
                   if (cin != cout or stride != 1) else nn.Identity())
        self.act = nn.ReLU()

    def forward(self, x):
        return self.act(self.n2(self.c2(self.b1(x))) + self.sc(x))


class Net(nn.Module):
    def __init__(self, args):
        super().__init__()
        w = int(args.get("model_width", 64))
        ncls = int(args["Categories_Number"])
        self.ms_stem = _ConvBlock(4, w // 2)
        self.ms_block = _ResBlock(w // 2, w)
        # PAN branch: 4x space-to-depth then stride-1 convs at MS
        # resolution (the dmfusion default, models/common.py
        # PanSpaceToDepth).
        self.pan_stem1 = _ConvBlock(16, w // 2)
        self.pan_stem2 = _ConvBlock(w // 2, w)
        self.pan_block = _ResBlock(w, w)
        self.gate = nn.Conv2d(2 * w, w, 1)
        self.trunk1 = _ResBlock(w, 2 * w, stride=2)
        self.trunk2 = _ResBlock(2 * w, 2 * w)
        self.trunk3 = _ResBlock(2 * w, 4 * w, stride=2)
        self.head = nn.Sequential(nn.Linear(4 * w, 2 * w), nn.ReLU(),
                                  nn.Linear(2 * w, ncls))

    def forward(self, ms, pan):
        b, _, h4, w4 = pan.shape
        p = pan.reshape(b, 1, h4 // 4, 4, w4 // 4, 4)
        p = p.permute(0, 3, 5, 1, 2, 4).reshape(b, 16, h4 // 4, w4 // 4)
        h_ms = self.ms_block(self.ms_stem(ms))
        h_pan = self.pan_block(self.pan_stem2(self.pan_stem1(p)))
        z = torch.sigmoid(self.gate(torch.cat([h_ms, h_pan], dim=1)))
        x = z * h_ms + (1.0 - z) * h_pan
        x = self.trunk3(self.trunk2(self.trunk1(x)))
        return self.head(x.mean(dim=(2, 3)))
