"""Seeded torch replica of pyannote.audio's PyanNet (segmentation-3.0)
for parity testing ``models/pyannet.py`` — pyannote.audio is not
installed here, so this mirrors PyanNet.py + sincnet.py + asteroid's
ParamSincFB filter computation with the checkpoint's state-dict names
(sincnet.wav_norm1d, sincnet.conv1d.0.filterbank.low_hz_,
lstm.weight_ih_l{k}[_reverse], linear.{i}, classifier)."""

import math

import torch
import torch.nn.functional as F
from torch import nn


class ParamSincFB(nn.Module):
    """asteroid_filterbanks ParamSincFB filter synthesis (SincNet form)."""

    def __init__(self, n_filters=80, kernel_size=251, stride=10,
                 sample_rate=16000, min_low_hz=50.0, min_band_hz=50.0):
        super().__init__()
        self.n_filters = n_filters
        self.kernel_size = kernel_size
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        # mel-spaced init like SincNet (values get overwritten by seeding)
        low_hz = 30.0
        high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
        mel = torch.linspace(
            2595 * math.log10(1 + low_hz / 700),
            2595 * math.log10(1 + high_hz / 700), n_filters + 1)
        hz = 700 * (10 ** (mel / 2595) - 1)
        self.low_hz_ = nn.Parameter(hz[:-1].view(-1, 1))
        self.band_hz_ = nn.Parameter((hz[1:] - hz[:-1]).view(-1, 1))
        half = kernel_size // 2
        n_lin = torch.linspace(0, half - 1, steps=half)
        self.register_buffer(
            "window_", 0.54 - 0.46 * torch.cos(
                2 * math.pi * n_lin / kernel_size))
        self.register_buffer(
            "n_", 2 * math.pi * torch.arange(-half, 0).float()
            / sample_rate)

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(low + self.min_band_hz + torch.abs(self.band_hz_),
                           self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]
        f_low = torch.matmul(low, self.n_.view(1, -1))
        f_high = torch.matmul(high, self.n_.view(1, -1))
        left = ((torch.sin(f_high) - torch.sin(f_low))
                / (self.n_.view(1, -1) / 2)) * self.window_.view(1, -1)
        center = 2 * band.view(-1, 1)
        right = torch.flip(left, dims=[1])
        bp = torch.cat([left, center, right], dim=1)
        bp = bp / (2 * band.view(-1, 1))
        return bp.view(self.n_filters, 1, self.kernel_size)


class Encoder(nn.Module):
    def __init__(self, filterbank):
        super().__init__()
        self.filterbank = filterbank

    def forward(self, x):
        return F.conv1d(x, self.filterbank.filters(),
                        stride=self.filterbank.stride)


class SincNet(nn.Module):
    """pyannote.audio models/blocks/sincnet.py (stride=10)."""

    def __init__(self):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList([
            Encoder(ParamSincFB()),
            nn.Conv1d(80, 60, 5, stride=1),
            nn.Conv1d(60, 60, 5, stride=1),
        ])
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3, stride=3)
                                     for _ in range(3)])
        self.norm1d = nn.ModuleList([
            nn.InstanceNorm1d(80, affine=True),
            nn.InstanceNorm1d(60, affine=True),
            nn.InstanceNorm1d(60, affine=True),
        ])

    def forward(self, waveforms):
        outputs = self.wav_norm1d(waveforms)
        for c, (conv1d, pool1d, norm1d) in enumerate(
                zip(self.conv1d, self.pool1d, self.norm1d)):
            outputs = conv1d(outputs)
            if c == 0:
                outputs = torch.abs(outputs)
            outputs = F.leaky_relu(norm1d(pool1d(outputs)))
        return outputs


class PyanNet(nn.Module):
    """pyannote.audio models/segmentation/PyanNet.py with the powerset
    classifier head of segmentation-3.0."""

    def __init__(self, lstm_hidden=128, lstm_layers=4, linear_dim=128,
                 num_classes=7):
        super().__init__()
        self.sincnet = SincNet()
        self.lstm = nn.LSTM(60, lstm_hidden, num_layers=lstm_layers,
                            batch_first=True, bidirectional=True)
        self.linear = nn.ModuleList([
            nn.Linear(2 * lstm_hidden, linear_dim),
            nn.Linear(linear_dim, linear_dim),
        ])
        self.classifier = nn.Linear(linear_dim, num_classes)

    def forward(self, waveforms):
        """(b, 1, n) -> (b, t, num_classes) log-probs."""
        outputs = self.sincnet(waveforms)
        outputs, _ = self.lstm(outputs.permute(0, 2, 1))
        for linear in self.linear:
            outputs = F.leaky_relu(linear(outputs))
        return F.log_softmax(self.classifier(outputs), dim=-1)
