"""Seeded torch replica of the WeSpeaker ResNet34 r-vector with the
published checkpoint's key names (pyannote/wespeaker-voxceleb-resnet34-LM,
the embedding stage of speaker-diarization-3.1 —
modules/cloning/speaker_separation.py:39-45).  Used only as the parity
oracle for utils/convert.convert_wespeaker."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class ResNet34(nn.Module):
    def __init__(self, feat_dim=80, embed_dim=256, m_channels=32,
                 num_blocks=(3, 4, 6, 3), two_emb_layer=False):
        super().__init__()
        self.two_emb_layer = two_emb_layer
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        in_planes = m_channels
        for li, (nb, stride) in enumerate(zip(num_blocks, (1, 2, 2, 2)),
                                          start=1):
            planes = m_channels * (2 ** (li - 1))
            blocks = []
            for bi in range(nb):
                blocks.append(BasicBlock(in_planes, planes,
                                         stride if bi == 0 else 1))
                in_planes = planes
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        stats_dim = (feat_dim // 8) * m_channels * 8
        self.seg_1 = nn.Linear(stats_dim * 2, embed_dim)
        if two_emb_layer:
            self.seg_bn_1 = nn.BatchNorm1d(embed_dim, affine=False)
            self.seg_2 = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        # x (B, T, feat) -> (B, 1, feat, T) image (wespeaker ResNet.forward)
        x = x.permute(0, 2, 1).unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        for li in range(1, 5):
            out = getattr(self, f"layer{li}")(out)
        # TSTP: flatten (B, C, F, T) -> (B, C*F, T); mean ++ unbiased std
        b, c, f, t = out.shape
        out = out.reshape(b, c * f, t)
        mean = out.mean(dim=-1)
        std = torch.sqrt(out.var(dim=-1, unbiased=True) + 1e-7)
        stats = torch.cat([mean, std], dim=-1)
        embed_a = self.seg_1(stats)
        if not self.two_emb_layer:
            return embed_a
        return self.seg_2(self.seg_bn_1(F.relu(embed_a)))


def randomize_running_stats(model: torch.nn.Module, seed: int = 0) -> None:
    """BN running stats must differ from init or bnfold parity is vacuous."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, (nn.BatchNorm2d, nn.BatchNorm1d)):
            with torch.no_grad():
                mod.running_mean.add_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.3)
                mod.running_var.mul_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
