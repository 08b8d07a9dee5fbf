"""Reference-equivalent torch CPU baseline for bench.py.

The reference's baseline workload is smp.Unet(resnet34) + BCE+Dice +
AdamW on a single device (train_bce_dice.py:293-311); smp/timm are not
installed here, so this module states the identical architecture in
plain torch (resnet34 basic-block encoder, smp decoder channels
256/128/64/32/16, 3x3 head) and measures images/sec of the full
fwd+loss+bwd+AdamW step on CPU — the "GPU-free PyTorch" number
BASELINE.md targets 10x against.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class ResNet34Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        widths = (64, 128, 256, 512)
        sizes = (3, 4, 6, 3)
        cin = 64
        self.layers = nn.ModuleList()
        for li, (n, w) in enumerate(zip(sizes, widths)):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(BasicBlock(cin, w, stride))
                cin = w
            self.layers.append(nn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        y = F.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = F.max_pool2d(y, 3, 2, 1)
        for layer in self.layers:
            y = layer(y)
            feats.append(y)
        return feats


class DecoderBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
                                   nn.BatchNorm2d(cout), nn.ReLU(True))
        self.conv2 = nn.Sequential(nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
                                   nn.BatchNorm2d(cout), nn.ReLU(True))

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], 1)
        return self.conv2(self.conv1(x))


class UNetResNet34(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = ResNet34Encoder()
        enc_ch = [64, 64, 128, 256, 512]
        dec_ch = [256, 128, 64, 32, 16]
        ins = [512 + 256, 256 + 128, 128 + 64, 64 + 64, 32]
        self.blocks = nn.ModuleList(
            DecoderBlock(i, o) for i, o in zip(ins, dec_ch))
        self.head = nn.Conv2d(16, 1, 3, 1, 1)

    def forward(self, x):
        feats = self.encoder(x)
        head, *skips = feats[::-1]
        y = head
        for i, b in enumerate(self.blocks):
            y = b(y, skips[i] if i < len(skips) else None)
        return self.head(y)


def bce_dice(logits, targets, w=0.5, smooth=1.0):
    bce = F.binary_cross_entropy_with_logits(logits, targets)
    probs = torch.sigmoid(logits)
    inter = (probs * targets).sum((2, 3))
    denom = probs.sum((2, 3)) + targets.sum((2, 3))
    dice = 1 - ((2 * inter + smooth) / (denom + smooth)).mean()
    return w * bce + (1 - w) * dice


def measure_cpu_images_per_sec(img: int = 224, batch: int = 6,
                               warmup: int = 2, steps: int = 6) -> float:
    torch.manual_seed(0)
    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = UNetResNet34().train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-4)
    x = torch.randn(batch, 3, img, img)
    y = (torch.rand(batch, 1, img, img) > 0.7).float()
    for _ in range(warmup):
        opt.zero_grad()
        bce_dice(model(x), y).backward()
        opt.step()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        bce_dice(model(x), y).backward()
        opt.step()
    dt = time.time() - t0
    return batch * steps / dt


if __name__ == "__main__":
    print(measure_cpu_images_per_sec())
