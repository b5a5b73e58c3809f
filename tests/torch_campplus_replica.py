"""Seeded torch replica of the 3D-Speaker/modelscope CAMPPlus that the
published chatterbox package bundles in s3gen.safetensors under
``speaker_encoder.`` (chatterbox models/s3gen/xvector.py).  Exact
state-dict key layout; numeric + layout oracle for
audiolab_tpu/models/campplus.py.

Also carries an independent torch implementation of the Kaldi fbank
(torchaudio.compliance.kaldi.fbank semantics with dither=0 — torchaudio
itself is not in this image) to cross-check kernels/kaldi.py."""

import math
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_nonlinear(config_str, channels):
    nonlinear = nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            nonlinear.add_module("relu", nn.ReLU(inplace=True))
        elif name == "batchnorm":
            nonlinear.add_module("batchnorm", nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            nonlinear.add_module("batchnorm",
                                 nn.BatchNorm1d(channels, affine=False))
        else:
            raise ValueError(name)
    return nonlinear


def statistics_pooling(x, dim=-1, unbiased=True):
    mean = x.mean(dim=dim)
    std = x.std(dim=dim, unbiased=unbiased)
    return torch.cat([mean, std], dim=-1)


class StatsPool(nn.Module):
    def forward(self, x):
        return statistics_pooling(x)


class TDNNLayer(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 dilation=1, padding=0, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        if padding < 0:
            padding = (kernel_size - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_channels, out_channels, kernel_size,
                                stride=stride, padding=padding,
                                dilation=dilation, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_channels)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(nn.Module):
    def __init__(self, bn_channels, out_channels, kernel_size, stride,
                 padding, dilation, bias, reduction=2):
        super().__init__()
        self.linear_local = nn.Conv1d(bn_channels, out_channels,
                                      kernel_size, stride=stride,
                                      padding=padding, dilation=dilation,
                                      bias=bias)
        self.linear1 = nn.Conv1d(bn_channels, bn_channels // reduction, 1)
        self.relu = nn.ReLU(inplace=True)
        self.linear2 = nn.Conv1d(bn_channels // reduction, out_channels, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = self.relu(self.linear1(context))
        m = self.sigmoid(self.linear2(context))
        return y * m

    def seg_pooling(self, x, seg_len=100):
        seg = F.avg_pool1d(x, kernel_size=seg_len, stride=seg_len,
                           ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, seg_len).reshape(
            *shape[:-1], -1)
        return seg[..., : x.shape[-1]]


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_channels, out_channels, bn_channels, kernel_size,
                 stride=1, dilation=1, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        padding = (kernel_size - 1) // 2 * dilation
        self.nonlinear1 = get_nonlinear(config_str, in_channels)
        self.linear1 = nn.Conv1d(in_channels, bn_channels, 1, bias=False)
        self.nonlinear2 = get_nonlinear(config_str, bn_channels)
        self.cam_layer = CAMLayer(bn_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, bias=bias)

    def forward(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class CAMDenseTDNNBlock(nn.ModuleList):
    def __init__(self, num_layers, in_channels, out_channels, bn_channels,
                 kernel_size, stride=1, dilation=1, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        for i in range(num_layers):
            layer = CAMDenseTDNNLayer(
                in_channels=in_channels + i * out_channels,
                out_channels=out_channels, bn_channels=bn_channels,
                kernel_size=kernel_size, stride=stride, dilation=dilation,
                bias=bias, config_str=config_str)
            self.add_module("tdnnd%d" % (i + 1), layer)

    def forward(self, x):
        for layer in self:
            x = torch.cat([x, layer(x)], dim=1)
        return x


class TransitLayer(nn.Module):
    def __init__(self, in_channels, out_channels, bias=True,
                 config_str="batchnorm-relu"):
        super().__init__()
        self.nonlinear = get_nonlinear(config_str, in_channels)
        self.linear = nn.Conv1d(in_channels, out_channels, 1, bias=bias)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(nn.Module):
    def __init__(self, in_channels, out_channels, bias=False,
                 config_str="batchnorm_"):
        super().__init__()
        self.linear = nn.Conv1d(in_channels, out_channels, 1, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_channels)

    def forward(self, x):
        if len(x.shape) == 2:
            x = self.linear(x.unsqueeze(-1)).squeeze(-1)
        else:
            x = self.linear(x)
        return self.nonlinear(x)


class BasicResBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, kernel_size=3,
                               stride=(stride, 1), padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, kernel_size=3, stride=1,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != self.expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, self.expansion * planes,
                          kernel_size=1, stride=(stride, 1), bias=False),
                nn.BatchNorm2d(self.expansion * planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out += self.shortcut(x)
        return F.relu(out)


class FCM(nn.Module):
    def __init__(self, block=BasicResBlock, num_blocks=(2, 2),
                 m_channels=32, feat_dim=80):
        super().__init__()
        self.in_planes = m_channels
        self.conv1 = nn.Conv2d(1, m_channels, kernel_size=3, stride=1,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = self._make_layer(block, m_channels, num_blocks[0],
                                       stride=2)
        self.layer2 = self._make_layer(block, m_channels, num_blocks[1],
                                       stride=2)
        self.conv2 = nn.Conv2d(m_channels, m_channels, kernel_size=3,
                               stride=(2, 1), padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def _make_layer(self, block, planes, num_blocks, stride):
        strides = [stride] + [1] * (num_blocks - 1)
        layers = []
        for s in strides:
            layers.append(block(self.in_planes, planes, s))
            self.in_planes = planes * block.expansion
        return nn.Sequential(*layers)

    def forward(self, x):
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        shape = out.shape
        return out.reshape(shape[0], shape[1] * shape[2], shape[3])


class CAMPPlusReplica(nn.Module):
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                 bn_size=4, init_channels=128,
                 config_str="batchnorm-relu",
                 block_layers=(12, 24, 16), block_dilations=(1, 2, 2),
                 m_channels=32):
        super().__init__()
        self.head = FCM(feat_dim=feat_dim, m_channels=m_channels)
        channels = self.head.out_channels
        self.xvector = nn.Sequential(OrderedDict([
            ("tdnn", TDNNLayer(channels, init_channels, 5, stride=2,
                               dilation=1, padding=-1,
                               config_str=config_str)),
        ]))
        channels = init_channels
        for i, (num_layers, kernel_size, dilation) in enumerate(
                zip(block_layers, (3, 3, 3), block_dilations)):
            block = CAMDenseTDNNBlock(
                num_layers=num_layers, in_channels=channels,
                out_channels=growth_rate,
                bn_channels=bn_size * growth_rate,
                kernel_size=kernel_size, dilation=dilation,
                config_str=config_str)
            self.xvector.add_module("block%d" % (i + 1), block)
            channels = channels + num_layers * growth_rate
            self.xvector.add_module(
                "transit%d" % (i + 1),
                TransitLayer(channels, channels // 2, bias=False,
                             config_str=config_str))
            channels //= 2
        self.xvector.add_module("out_nonlinear",
                                get_nonlinear(config_str, channels))
        self.xvector.add_module("stats", StatsPool())
        self.xvector.add_module(
            "dense", DenseLayer(channels * 2, embedding_size,
                                config_str="batchnorm_"))

    def forward(self, x):  # (b, t, feat)
        x = x.permute(0, 2, 1)
        x = self.head(x)
        return self.xvector(x)


# ------------------------------------------------- kaldi fbank (torch)

def torch_kaldi_fbank(wav, sr=16000, n_mels=80, frame_length=400,
                      frame_shift=160, preemph=0.97, low_freq=20.0):
    """torchaudio.compliance.kaldi.fbank with dither=0 (povey window,
    snip_edges, DC removal, power spectrum, kaldi mel banks)."""
    n = wav.shape[-1]
    m = 1 + (n - frame_length) // frame_shift
    frames = torch.stack([wav[i * frame_shift: i * frame_shift
                              + frame_length] for i in range(m)])
    frames = frames - frames.mean(dim=-1, keepdim=True)
    prev = torch.cat([frames[:, :1], frames[:, :-1]], dim=-1)
    frames = frames - preemph * prev
    i = torch.arange(frame_length, dtype=torch.float64)
    win = (0.5 - 0.5 * torch.cos(2 * math.pi * i / (frame_length - 1))
           ) ** 0.85
    frames = frames * win.to(frames.dtype)
    padded = 1
    while padded < frame_length:
        padded *= 2
    spec = torch.fft.rfft(F.pad(frames, (0, padded - frame_length)))
    power = spec.real ** 2 + spec.imag ** 2

    def mel(f):
        return 1127.0 * torch.log(1.0 + torch.as_tensor(
            f, dtype=torch.float64) / 700.0)

    n_bins = padded // 2
    fft_bin_width = sr / padded
    mel_low, mel_high = mel(low_freq), mel(sr / 2.0)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    left = mel_low + torch.arange(n_mels, dtype=torch.float64)[:, None] \
        * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    mel_bin = mel(fft_bin_width * torch.arange(n_bins,
                                               dtype=torch.float64))[None]
    up = (mel_bin - left) / (center - left)
    down = (right - mel_bin) / (right - center)
    w = torch.clamp(torch.min(up, down), min=0.0)
    w = F.pad(w, (0, 1))
    out = power @ w.T.to(power.dtype)
    return torch.log(torch.clamp(out, min=1.1920928955078125e-07))
