"""Seeded torch replica of ZFTurbo's mdx23c_tfc_tdf_v3 network with the
exact state-dict key names of published MDX23C checkpoints
(MDX23C-8KFFT-InstVoc_HQ.ckpt and the DrumSep variant, loaded by the
reference through audio-separator — stem_separator.py:111,113,534-541).

Key layout: first_conv.weight,
encoder_blocks.{i}.tfc_tdf.blocks.{j}.{tfc1,tdf,tfc2,shortcut}.*,
encoder_blocks.{i}.downscale.{0,2}.*, bottleneck_block.blocks.{j}.*,
decoder_blocks.{i}.upscale.{0,2}.*, decoder_blocks.{i}.tfc_tdf.blocks.*,
final_conv.{0,2}.weight.
"""

import torch
import torch.nn as nn


def _norm(kind, c):
    if kind == "InstanceNorm":
        return nn.InstanceNorm2d(c, affine=True)
    if kind.startswith("GroupNorm"):
        return nn.GroupNorm(int(kind.replace("GroupNorm", "")), c)
    return nn.Identity()


def _act(kind):
    if kind == "gelu":
        return nn.GELU()
    if kind == "relu":
        return nn.ReLU()
    return nn.LeakyReLU(float(kind.replace("leakyrelu", "") or 0.01))


class TFC_TDF(nn.Module):
    def __init__(self, in_c, c, l, f, bn, norm, act):
        super().__init__()
        self.blocks = nn.ModuleList()
        for _ in range(l):
            block = nn.Module()
            block.tfc1 = nn.Sequential(
                _norm(norm, in_c), _act(act),
                nn.Conv2d(in_c, c, 3, 1, 1, bias=False))
            block.tdf = nn.Sequential(
                _norm(norm, c), _act(act),
                nn.Linear(f, f // bn, bias=False), _act(act),
                nn.Linear(f // bn, f, bias=False))
            block.tfc2 = nn.Sequential(
                _norm(norm, c), _act(act),
                nn.Conv2d(c, c, 3, 1, 1, bias=False))
            block.shortcut = nn.Conv2d(in_c, c, 1, 1, 0, bias=False)
            self.blocks.append(block)
            in_c = c

    def forward(self, x):
        for block in self.blocks:
            s = block.shortcut(x)
            x = block.tfc1(x)
            x = x + block.tdf(x)
            x = block.tfc2(x)
            x = x + s
        return x


class STFT:
    def __init__(self, n_fft, hop_length, dim_f):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.window = torch.hann_window(n_fft, periodic=True).double()
        self.dim_f = dim_f

    def __call__(self, x):
        batch_dims = x.shape[:-2]
        c, t = x.shape[-2:]
        x = x.reshape([-1, t])
        x = torch.stft(x, n_fft=self.n_fft, hop_length=self.hop_length,
                       window=self.window, center=True, return_complex=True)
        x = torch.view_as_real(x)
        x = x.permute([0, 3, 1, 2])
        x = x.reshape([*batch_dims, c, 2, -1, x.shape[-1]]).reshape(
            [*batch_dims, c * 2, -1, x.shape[-1]])
        return x[..., : self.dim_f, :]

    def inverse(self, x):
        batch_dims = x.shape[:-3]
        c, f, t = x.shape[-3:]
        n = self.n_fft // 2 + 1
        f_pad = torch.zeros([*batch_dims, c, n - f, t]).double()
        x = torch.cat([x, f_pad], -2)
        x = x.reshape([*batch_dims, c // 2, 2, n, t]).reshape([-1, 2, n, t])
        x = x.permute([0, 2, 3, 1]).contiguous()
        x = torch.view_as_complex(x)
        x = torch.istft(x, n_fft=self.n_fft, hop_length=self.hop_length,
                        window=self.window)
        return x.reshape([*batch_dims, 2, -1])


class TFC_TDF_net(nn.Module):
    def __init__(self, cfg):
        """cfg: audiolab_tpu MDX23CConfig (field names match the yaml)."""
        super().__init__()
        self.cfg = cfg
        self.num_target_instruments = cfg.num_targets
        self.num_subbands = cfg.num_subbands
        norm, act = cfg.norm, cfg.act
        dim_c = cfg.dim_c
        n = cfg.num_scales
        scale = tuple(cfg.scale)
        l = cfg.num_blocks_per_scale
        c = cfg.channels
        g = cfg.growth
        bn = cfg.bottleneck_factor
        f = cfg.dim_f // self.num_subbands

        self.first_conv = nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)

        self.encoder_blocks = nn.ModuleList()
        for _ in range(n):
            block = nn.Module()
            block.tfc_tdf = TFC_TDF(c, c, l, f, bn, norm, act)
            block.downscale = nn.Sequential(
                _norm(norm, c), _act(act),
                nn.Conv2d(c, c + g, scale, scale, bias=False))
            f = f // scale[1]
            c += g
            self.encoder_blocks.append(block)

        self.bottleneck_block = TFC_TDF(c, c, l, f, bn, norm, act)

        self.decoder_blocks = nn.ModuleList()
        for _ in range(n):
            block = nn.Module()
            block.upscale = nn.Sequential(
                _norm(norm, c), _act(act),
                nn.ConvTranspose2d(c, c - g, scale, scale, bias=False))
            f = f * scale[1]
            c -= g
            block.tfc_tdf = TFC_TDF(2 * c, c, l, f, bn, norm, act)
            self.decoder_blocks.append(block)

        self.final_conv = nn.Sequential(
            nn.Conv2d(c + dim_c, c, 1, 1, 0, bias=False), _act(act),
            nn.Conv2d(c, self.num_target_instruments * dim_c, 1, 1, 0,
                      bias=False))

        self.stft = STFT(cfg.n_fft, cfg.hop_length, cfg.dim_f)

    def cac2cws(self, x):
        k = self.num_subbands
        b, c, f, t = x.shape
        x = x.reshape(b, c, k, f // k, t)
        x = x.reshape(b, c * k, f // k, t)
        return x

    def cws2cac(self, x):
        k = self.num_subbands
        b, c, f, t = x.shape
        x = x.reshape(b, c // k, k, f, t)
        x = x.reshape(b, c // k, f * k, t)
        return x

    def forward(self, x):
        x = self.stft(x)
        mix = x = self.cac2cws(x)
        first_conv_out = x = self.first_conv(x)
        x = x.transpose(-1, -2)
        encoder_outputs = []
        for block in self.encoder_blocks:
            x = block.tfc_tdf(x)
            encoder_outputs.append(x)
            x = block.downscale(x)
        x = self.bottleneck_block(x)
        for block in self.decoder_blocks:
            x = block.upscale(x)
            x = torch.cat([x, encoder_outputs.pop()], 1)
            x = block.tfc_tdf(x)
        x = x.transpose(-1, -2)
        x = x * first_conv_out
        x = self.final_conv(torch.cat([mix, x], 1))
        x = self.cws2cac(x)
        if self.num_target_instruments > 1:
            b, c, f, t = x.shape
            x = x.reshape(b, self.num_target_instruments, -1, f, t)
        x = self.stft.inverse(x)
        return x
