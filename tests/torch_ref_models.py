"""Seeded torch replicas of the reference architectures, for FULL-MODULE
converter parity tests (VERDICT r1 item 3).

These are independent torch implementations of the architectures described
in /root/reference/modules/rvc/infer/lib/infer_pack/models.py (VITS
SynthesizerTrnMs768NSFsid + NSF-HiFiGAN), attentions.py (windowed relative
attention), modules.py (WN/ResBlock1/LayerNorm), and fairseq's HubertModel
(as loaded at modules/rvc/infer/modules/vc/utils.py:181-192) — written
from the behavior spec, NOT copied.  Their ``state_dict()`` key names match
the real checkpoints' names (that naming is the weight-format contract the
converter consumes), so pushing ``model.state_dict()`` through
``utils/convert.py`` exercises the exact same path a downloaded checkpoint
would take.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn
from torch.nn.utils import weight_norm

LRELU_SLOPE = 0.1


def get_padding(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


class LayerNorm(nn.Module):
    """Channel-dim LayerNorm over NCT with gamma/beta params
    (modules.py:17-29)."""

    def __init__(self, channels: int, eps: float = 1e-5):
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.channels,), self.gamma, self.beta, self.eps)
        return x.transpose(1, -1)


class MultiHeadAttention(nn.Module):
    """Windowed relative-position self-attention (attentions.py:170-330)."""

    def __init__(self, channels: int, n_heads: int, window_size: int = 10):
        super().__init__()
        self.channels = channels
        self.n_heads = n_heads
        self.k_channels = channels // n_heads
        self.window_size = window_size
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, channels, 1)
        rel_std = self.k_channels**-0.5
        self.emb_rel_k = nn.Parameter(
            torch.randn(1, 2 * window_size + 1, self.k_channels) * rel_std)
        self.emb_rel_v = nn.Parameter(
            torch.randn(1, 2 * window_size + 1, self.k_channels) * rel_std)

    def _rel_embeddings(self, emb, length):
        w = self.window_size
        pad = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        if pad > 0:
            emb = F.pad(emb, (0, 0, pad, pad))
        return emb[:, start : start + 2 * length - 1]

    @staticmethod
    def _rel_to_abs(x):
        b, h, t, _ = x.shape
        x = F.pad(x, (0, 1)).view(b, h, t * 2 * t)
        x = F.pad(x, (0, t - 1)).view(b, h, t + 1, 2 * t - 1)
        return x[:, :, :t, t - 1 :]

    @staticmethod
    def _abs_to_rel(x):
        b, h, t, _ = x.shape
        x = F.pad(x, (0, t - 1)).view(b, h, t * (2 * t - 1))
        x = F.pad(x, (t, 0)).view(b, h, t, 2 * t)
        return x[:, :, :, 1:]

    def forward(self, x, attn_mask=None):
        # x (b, c, t)
        b, _, t = x.shape
        q = self.conv_q(x).view(b, self.n_heads, self.k_channels, t).transpose(2, 3)
        k = self.conv_k(x).view(b, self.n_heads, self.k_channels, t).transpose(2, 3)
        v = self.conv_v(x).view(b, self.n_heads, self.k_channels, t).transpose(2, 3)

        scale = 1.0 / math.sqrt(self.k_channels)
        scores = torch.matmul(q * scale, k.transpose(-2, -1))
        rel_k = self._rel_embeddings(self.emb_rel_k, t)
        rel_logits = torch.matmul(q * scale, rel_k.unsqueeze(0).transpose(-2, -1))
        scores = scores + self._rel_to_abs(rel_logits)
        if attn_mask is not None:
            scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = F.softmax(scores, dim=-1)
        out = torch.matmul(p, v)
        rel_v = self._rel_embeddings(self.emb_rel_v, t)
        out = out + torch.matmul(self._abs_to_rel(p), rel_v.unsqueeze(0))
        out = out.transpose(2, 3).contiguous().view(b, self.channels, t)
        return self.conv_o(out)


class FFN(nn.Module):
    def __init__(self, channels, filter_channels, kernel_size):
        super().__init__()
        self.conv_1 = nn.Conv1d(channels, filter_channels, kernel_size,
                                padding=kernel_size // 2)
        self.conv_2 = nn.Conv1d(filter_channels, channels, kernel_size,
                                padding=kernel_size // 2)

    def forward(self, x, x_mask):
        x = self.conv_1(x * x_mask)
        x = torch.relu(x)
        x = self.conv_2(x * x_mask)
        return x * x_mask


class Encoder(nn.Module):
    """attentions.Encoder: post-norm rel-attn transformer."""

    def __init__(self, hidden, filter_channels, n_heads, n_layers, kernel_size):
        super().__init__()
        self.attn_layers = nn.ModuleList(
            [MultiHeadAttention(hidden, n_heads) for _ in range(n_layers)])
        self.norm_layers_1 = nn.ModuleList(
            [LayerNorm(hidden) for _ in range(n_layers)])
        self.ffn_layers = nn.ModuleList(
            [FFN(hidden, filter_channels, kernel_size) for _ in range(n_layers)])
        self.norm_layers_2 = nn.ModuleList(
            [LayerNorm(hidden) for _ in range(n_layers)])

    def forward(self, x, x_mask):
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
        x = x * x_mask
        for attn, n1, ffn, n2 in zip(self.attn_layers, self.norm_layers_1,
                                     self.ffn_layers, self.norm_layers_2):
            y = attn(x * x_mask, attn_mask)
            x = n1(x + y)
            y = ffn(x, x_mask)
            x = n2(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """models.py:20-82."""

    def __init__(self, in_channels, out_channels, hidden, filter_channels,
                 n_heads, n_layers, kernel_size, f0=True):
        super().__init__()
        self.out_channels = out_channels
        self.hidden_channels = hidden
        self.emb_phone = nn.Linear(in_channels, hidden)
        self.lrelu = nn.LeakyReLU(0.1)
        if f0:
            self.emb_pitch = nn.Embedding(256, hidden)
        self.encoder = Encoder(hidden, filter_channels, n_heads, n_layers,
                               kernel_size)
        self.proj = nn.Conv1d(hidden, out_channels * 2, 1)

    def forward(self, phone, pitch, lengths):
        x = self.emb_phone(phone)
        if pitch is not None:
            x = x + self.emb_pitch(pitch)
        x = x * math.sqrt(self.hidden_channels)
        x = self.lrelu(x)
        x = x.transpose(1, -1)  # (b, h, t)
        x_mask = (torch.arange(x.size(2))[None, :] < lengths[:, None]
                  ).unsqueeze(1).to(x.dtype)
        x = self.encoder(x * x_mask, x_mask)
        stats = self.proj(x) * x_mask
        m, logs = torch.split(stats, self.out_channels, dim=1)
        return m, logs, x_mask


class WN(nn.Module):
    """modules.py WN gated wavenet stack."""

    def __init__(self, hidden, kernel_size, dilation_rate, n_layers,
                 gin_channels=0):
        super().__init__()
        self.hidden_channels = hidden
        self.n_layers = n_layers
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        if gin_channels:
            self.cond_layer = weight_norm(
                nn.Conv1d(gin_channels, 2 * hidden * n_layers, 1), name="weight")
        for i in range(n_layers):
            d = dilation_rate**i
            self.in_layers.append(weight_norm(
                nn.Conv1d(hidden, 2 * hidden, kernel_size, dilation=d,
                          padding=get_padding(kernel_size, d)), name="weight"))
            out_ch = 2 * hidden if i < n_layers - 1 else hidden
            self.res_skip_layers.append(weight_norm(
                nn.Conv1d(hidden, out_ch, 1), name="weight"))

    def forward(self, x, x_mask, g=None):
        output = torch.zeros_like(x)
        h = self.hidden_channels
        if g is not None:
            g = self.cond_layer(g)
        for i in range(self.n_layers):
            x_in = self.in_layers[i](x)
            if g is not None:
                x_in = x_in + g[:, i * 2 * h : (i + 1) * 2 * h]
            acts = torch.tanh(x_in[:, :h]) * torch.sigmoid(x_in[:, h:])
            res_skip = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[:, :h]) * x_mask
                output = output + res_skip[:, h:]
            else:
                output = output + res_skip
        return output * x_mask


class ResidualCouplingLayer(nn.Module):
    """modules.py ResidualCouplingLayer (mean_only)."""

    def __init__(self, channels, hidden, kernel_size, dilation_rate, n_layers,
                 gin_channels=0):
        super().__init__()
        self.half_channels = channels // 2
        self.pre = nn.Conv1d(self.half_channels, hidden, 1)
        self.enc = WN(hidden, kernel_size, dilation_rate, n_layers,
                      gin_channels=gin_channels)
        self.post = nn.Conv1d(hidden, self.half_channels, 1)
        self.post.weight.data.zero_()
        self.post.bias.data.zero_()

    def forward(self, x, x_mask, g=None, reverse=False):
        x0, x1 = torch.split(x, [self.half_channels] * 2, 1)
        h = self.pre(x0) * x_mask
        h = self.enc(h, x_mask, g=g)
        m = self.post(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return torch.cat([x0, x1], 1)


class Flip(nn.Module):
    def forward(self, x, *args, reverse=False, **kwargs):
        return torch.flip(x, [1])


class ResidualCouplingBlock(nn.Module):
    """models.py:84-131."""

    def __init__(self, channels, hidden, kernel_size, dilation_rate, n_layers,
                 n_flows=4, gin_channels=0):
        super().__init__()
        self.flows = nn.ModuleList()
        for _ in range(n_flows):
            self.flows.append(ResidualCouplingLayer(
                channels, hidden, kernel_size, dilation_rate, n_layers,
                gin_channels=gin_channels))
            self.flows.append(Flip())

    def forward(self, x, x_mask, g=None, reverse=False):
        if not reverse:
            for flow in self.flows:
                x = flow(x, x_mask, g=g, reverse=False)
        else:
            for flow in reversed(self.flows):
                x = flow(x, x_mask, g=g, reverse=True)
        return x


class PosteriorEncoder(nn.Module):
    """models.py:149-205."""

    def __init__(self, in_channels, out_channels, hidden, kernel_size,
                 dilation_rate, n_layers, gin_channels=0):
        super().__init__()
        self.out_channels = out_channels
        self.pre = nn.Conv1d(in_channels, hidden, 1)
        self.enc = WN(hidden, kernel_size, dilation_rate, n_layers,
                      gin_channels=gin_channels)
        self.proj = nn.Conv1d(hidden, out_channels * 2, 1)

    def forward(self, y, y_lengths, g=None):
        y_mask = (torch.arange(y.size(2))[None, :] < y_lengths[:, None]
                  ).unsqueeze(1).to(y.dtype)
        h = self.pre(y) * y_mask
        h = self.enc(h, y_mask, g=g)
        stats = self.proj(h) * y_mask
        m, logs = torch.split(stats, self.out_channels, dim=1)
        z = (m + torch.randn_like(m) * torch.exp(logs)) * y_mask
        return z, m, logs, y_mask


class SineGen(nn.Module):
    """models.py:313-394 — per-frame phase ramp + wrapped frame cumsum."""

    def __init__(self, samp_rate, harmonic_num=0, sine_amp=0.1,
                 noise_std=0.003, voiced_threshold=0):
        super().__init__()
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.dim = harmonic_num + 1
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold

    def forward(self, f0, upp, deterministic=False):
        with torch.no_grad():
            f0 = f0.unsqueeze(-1)  # (b, t, 1)
            a = torch.arange(1, upp + 1, dtype=f0.dtype)
            rad = f0 / self.sampling_rate * a  # (b, t, upp)
            rad2 = torch.fmod(rad[:, :-1, -1:].float() + 0.5, 1.0) - 0.5
            rad_acc = rad2.cumsum(dim=1).fmod(1.0).to(f0)
            rad += F.pad(rad_acc, (0, 0, 1, 0))
            rad = rad.reshape(f0.shape[0], -1, 1)
            b = torch.arange(1, self.dim + 1, dtype=f0.dtype).reshape(1, 1, -1)
            rad = rad * b
            rand_ini = torch.rand(1, 1, self.dim)
            rand_ini[..., 0] = 0
            rad = rad + rand_ini
            sines = torch.sin(2 * np.pi * rad) * self.sine_amp
            uv = (f0 > self.voiced_threshold).to(f0.dtype)
            uv = F.interpolate(uv.transpose(2, 1), scale_factor=float(upp),
                               mode="nearest").transpose(2, 1)
            noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
            noise = noise_amp * (torch.zeros_like(sines) if deterministic
                                 else torch.randn_like(sines))
            sines = sines * uv + noise
        return sines, uv, noise


class SourceModuleHnNSF(nn.Module):
    def __init__(self, sampling_rate, harmonic_num=0):
        super().__init__()
        self.l_sin_gen = SineGen(sampling_rate, harmonic_num)
        self.l_linear = nn.Linear(harmonic_num + 1, 1)
        self.l_tanh = nn.Tanh()

    def forward(self, x, upp, deterministic=False):
        sine_wavs, uv, _ = self.l_sin_gen(x, upp, deterministic)
        sine_merge = self.l_tanh(self.l_linear(sine_wavs))
        return sine_merge, None, None


class ResBlock1(nn.Module):
    """modules.py ResBlock1 (HiFiGAN)."""

    def __init__(self, channels, kernel_size=3, dilation=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size, dilation=d,
                                  padding=get_padding(kernel_size, d)),
                        name="weight")
            for d in dilation])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size,
                                  padding=get_padding(kernel_size, 1)),
                        name="weight")
            for _ in dilation])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, LRELU_SLOPE)
            xt = c1(xt)
            xt = F.leaky_relu(xt, LRELU_SLOPE)
            xt = c2(xt)
            x = xt + x
        return x


class GeneratorNSF(nn.Module):
    """models.py:449-580."""

    def __init__(self, initial_channel, resblock_kernel_sizes,
                 resblock_dilation_sizes, upsample_rates,
                 upsample_initial_channel, upsample_kernel_sizes,
                 gin_channels, sr):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.m_source = SourceModuleHnNSF(sr, harmonic_num=0)
        self.conv_pre = nn.Conv1d(initial_channel, upsample_initial_channel,
                                  7, 1, padding=3)
        self.ups = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
            c_cur = upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(upsample_initial_channel // (2**i), c_cur,
                                   k, u, padding=(k - u) // 2), name="weight"))
            if i + 1 < len(upsample_rates):
                stride_f0 = int(np.prod(upsample_rates[i + 1 :]))
                self.noise_convs.append(nn.Conv1d(
                    1, c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                    padding=stride_f0 // 2))
            else:
                self.noise_convs.append(nn.Conv1d(1, c_cur, kernel_size=1))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(ResBlock1(ch, k, d))
        self.conv_post = nn.Conv1d(ch, 1, 7, 1, padding=3, bias=False)
        if gin_channels != 0:
            self.cond = nn.Conv1d(gin_channels, upsample_initial_channel, 1)
        self.upp = int(np.prod(upsample_rates))

    def forward(self, x, f0, g=None, deterministic=False):
        har_source, _, _ = self.m_source(f0, self.upp, deterministic)
        har_source = har_source.transpose(1, 2)
        x = self.conv_pre(x)
        if g is not None:
            x = x + self.cond(g)
        for i in range(self.num_upsamples):
            x = F.leaky_relu(x, LRELU_SLOPE)
            x = self.ups[i](x)
            x = x + self.noise_convs[i](har_source)
            xs = None
            for j in range(self.num_kernels):
                rb = self.resblocks[i * self.num_kernels + j](x)
                xs = rb if xs is None else xs + rb
            x = xs / self.num_kernels
        x = F.leaky_relu(x)  # default slope 0.01 (models.py:562)
        x = self.conv_post(x)
        return torch.tanh(x)


class SynthesizerTrnMs768NSFsid(nn.Module):
    """models.py:722-1052 — inference path only."""

    def __init__(self, spec_channels, segment_size, inter_channels,
                 hidden_channels, filter_channels, n_heads, n_layers,
                 kernel_size, resblock_kernel_sizes, resblock_dilation_sizes,
                 upsample_rates, upsample_initial_channel,
                 upsample_kernel_sizes, spk_embed_dim, gin_channels, sr,
                 feat_channels=768):
        super().__init__()
        self.enc_p = TextEncoder(feat_channels, inter_channels,
                                 hidden_channels, filter_channels, n_heads,
                                 n_layers, kernel_size)
        self.dec = GeneratorNSF(inter_channels, resblock_kernel_sizes,
                                resblock_dilation_sizes, upsample_rates,
                                upsample_initial_channel,
                                upsample_kernel_sizes, gin_channels, sr)
        self.enc_q = PosteriorEncoder(spec_channels, inter_channels,
                                      hidden_channels, 5, 1, 16,
                                      gin_channels=gin_channels)
        self.flow = ResidualCouplingBlock(inter_channels, hidden_channels,
                                          5, 1, 3, gin_channels=gin_channels)
        self.emb_g = nn.Embedding(spk_embed_dim, gin_channels)

    @torch.no_grad()
    def infer(self, phone, phone_lengths, pitch, nsff0, sid,
              noise_scale=0.66666, deterministic=False):
        g = self.emb_g(sid).unsqueeze(-1)
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        noise = 0.0 if deterministic else torch.randn_like(m_p)
        z_p = (m_p + torch.exp(logs_p) * noise * noise_scale) * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        o = self.dec(z * x_mask, nsff0, g=g, deterministic=deterministic)
        return o


# ------------------------------------------------------------------ HuBERT


class _FairseqConvBlock(nn.Module):
    """One fairseq conv-extractor block: indexed children 0=conv, 2=GroupNorm
    (layer 0 only) so state_dict keys read conv_layers.{i}.0.weight etc."""

    def __init__(self, in_ch, out_ch, k, s, group_norm=False):
        super().__init__()
        # fairseq uses nn.Sequential(conv, dropout, [norm,] gelu); keys come
        # out as .0 (conv) and .2 (norm) — replicate with indexed Sequential
        conv = nn.Conv1d(in_ch, out_ch, k, stride=s, bias=False)
        mods = [conv, nn.Identity()]
        if group_norm:
            mods.append(nn.GroupNorm(out_ch, out_ch, affine=True))
        mods.append(nn.GELU())
        self.block = nn.Sequential(*mods)

    def forward(self, x):
        return self.block(x)


class HubertTorch(nn.Module):
    """fairseq HubertModel replica (inference graph only): conv extractor ->
    LN -> post proj -> conv pos emb -> post-LN transformer; state_dict keys
    match the fairseq checkpoint names consumed by hubert_mapping."""

    def __init__(self, dim=768, ffn_dim=3072, heads=12, layers=12,
                 final_dim=256):
        super().__init__()
        conv_cfg = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
        blocks = []
        in_ch = 1
        for i, (ch, k, s) in enumerate(conv_cfg):
            blocks.append(_FairseqConvBlock(in_ch, ch, k, s, group_norm=(i == 0)))
            in_ch = ch
        self.feature_extractor = nn.Module()
        self.feature_extractor.conv_layers = nn.ModuleList(
            [b.block for b in blocks])
        self.layer_norm = nn.LayerNorm(512)
        self.post_extract_proj = nn.Linear(512, dim)

        self.encoder = nn.Module()
        pos_conv = nn.Conv1d(dim, dim, 128, padding=64, groups=16)
        pos_conv = weight_norm(pos_conv, name="weight", dim=2)
        self.encoder.pos_conv = nn.Sequential(pos_conv)
        self.encoder.layer_norm = nn.LayerNorm(dim)
        self.encoder.layers = nn.ModuleList(
            [_HubertLayer(dim, ffn_dim, heads) for _ in range(layers)])
        self.final_proj = nn.Linear(dim, final_dim)
        self.heads = heads
        self.dim = dim

    def extract_features(self, wav, output_layer=12):
        x = wav.unsqueeze(1)  # (b, 1, n)
        for block in self.feature_extractor.conv_layers:
            x = block(x)
        x = x.transpose(1, 2)  # (b, t, 512)
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        pos = self.encoder.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        pos = F.gelu(pos[:, : x.shape[1] , :])
        x = x + pos
        x = self.encoder.layer_norm(x)
        for i, layer in enumerate(self.encoder.layers):
            x = layer(x)
            if i + 1 == output_layer:
                break
        return x


class _HubertLayer(nn.Module):
    def __init__(self, dim, ffn_dim, heads):
        super().__init__()
        self.self_attn = _HubertAttention(dim, heads)
        self.self_attn_layer_norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, dim)
        self.final_layer_norm = nn.LayerNorm(dim)

    def forward(self, x):
        y = self.self_attn(x)
        x = self.self_attn_layer_norm(x + y)
        y = self.fc2(F.gelu(self.fc1(x)))
        x = self.final_layer_norm(x + y)
        return x


class _HubertAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.out_proj = nn.Linear(dim, dim)
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        b, t, _ = x.shape
        d = self.dim // self.heads
        q = self.q_proj(x).view(b, t, self.heads, d).transpose(1, 2)
        k = self.k_proj(x).view(b, t, self.heads, d).transpose(1, 2)
        v = self.v_proj(x).view(b, t, self.heads, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).contiguous().view(b, t, self.dim)
        return self.out_proj(o)


# ------------------------------------------------------------------ RMVPE


class _RmvpeConvBlock(nn.Module):
    """ConvBlockRes (rmvpe.py:238-267): two conv+BN+ReLU, residual add;
    keys .conv.{0,1,3,4} + optional .shortcut."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
            nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )
        if cin != cout:
            self.shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        y = self.conv(x)
        return y + (self.shortcut(x) if hasattr(self, "shortcut") else x)


class _RmvpeEncBlock(nn.Module):
    """ResEncoderBlock (rmvpe.py:307-328): n conv blocks (+ avg pool)."""

    def __init__(self, cin, cout, n_blocks, pool):
        super().__init__()
        self.conv = nn.ModuleList(
            [_RmvpeConvBlock(cin, cout)]
            + [_RmvpeConvBlock(cout, cout) for _ in range(n_blocks - 1)])
        self.do_pool = pool
        if pool:
            self.pool = nn.AvgPool2d((2, 2))

    def forward(self, x):
        for blk in self.conv:
            x = blk(x)
        if self.do_pool:
            return x, self.pool(x)
        return x


class _RmvpeDecBlock(nn.Module):
    """ResDecoderBlock (rmvpe.py:350-376): ConvT(k3,s2,p1,op1)+BN+ReLU,
    concat skip, n conv blocks; keys .conv1.{0,1} / .conv2.{j}."""

    def __init__(self, cin, cout, n_blocks):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                               output_padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )
        self.conv2 = nn.ModuleList(
            [_RmvpeConvBlock(cout * 2, cout)]
            + [_RmvpeConvBlock(cout, cout) for _ in range(n_blocks - 1)])

    def forward(self, x, skip):
        x = self.conv1(x)
        x = torch.cat((x, skip), dim=1)
        for blk in self.conv2:
            x = blk(x)
        return x


class RmvpeE2ETorch(nn.Module):
    """rmvpe.py:430-473 E2E(n_blocks, 1, (2,2)); state-dict names match
    the published rmvpe.pt (unet.encoder.layers.*, fc.0.gru.*, ...)."""

    def __init__(self, n_blocks=4, en_de_layers=5, inter_layers=4,
                 en_out_channels=16, gru_hidden=256, n_mels=128,
                 n_class=360):
        super().__init__()
        self.unet = nn.Module()
        enc = nn.Module()
        enc.bn = nn.BatchNorm2d(1)
        layers = []
        cin, cout = 1, en_out_channels
        for _ in range(en_de_layers):
            layers.append(_RmvpeEncBlock(cin, cout, n_blocks, pool=True))
            cin, cout = cout, cout * 2
        enc.layers = nn.ModuleList(layers)
        self.unet.encoder = enc

        inter = nn.Module()
        inter.layers = nn.ModuleList(
            [_RmvpeEncBlock(cin, cout, n_blocks, pool=False)]
            + [_RmvpeEncBlock(cout, cout, n_blocks, pool=False)
               for _ in range(inter_layers - 1)])
        self.unet.intermediate = inter

        dec = nn.Module()
        dlayers = []
        ch = cout
        for _ in range(en_de_layers):
            dlayers.append(_RmvpeDecBlock(ch, ch // 2, n_blocks))
            ch //= 2
        dec.layers = nn.ModuleList(dlayers)
        self.unet.decoder = dec

        self.cnn = nn.Conv2d(en_out_channels, 3, 3, padding=1)
        self.fc = nn.Sequential(
            _RmvpeBiGRU(3 * n_mels, gru_hidden),
            nn.Linear(2 * gru_hidden, n_class),
            nn.Dropout(0.25),
            nn.Sigmoid(),
        )

    def forward(self, mel):
        # mel (b, n_mels, T) -> (b, 1, T, n_mels) NCHW
        x = mel.transpose(-1, -2).unsqueeze(1)
        x = self.unet.encoder.bn(x)
        skips = []
        for layer in self.unet.encoder.layers:
            skip, x = layer(x)
            skips.append(skip)
        for layer in self.unet.intermediate.layers:
            x = layer(x)
        for i, layer in enumerate(self.unet.decoder.layers):
            x = layer(x, skips[-1 - i])
        x = self.cnn(x).transpose(1, 2).flatten(-2)  # (b, T, 3*n_mels)
        return self.fc(x)


class _RmvpeBiGRU(nn.Module):
    def __init__(self, n_in, hidden):
        super().__init__()
        self.gru = nn.GRU(n_in, hidden, num_layers=1, batch_first=True,
                          bidirectional=True)

    def forward(self, x):
        return self.gru(x)[0]


# ------------------------------------------------------------ BS-RoFormer


class _BsrRMSNorm(nn.Module):
    """bs_roformer RMSNorm: F.normalize(x,dim=-1) * sqrt(d) * gamma."""

    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.normalize(x, dim=-1) * self.scale * self.gamma


def _bsr_rope(x):
    """rotary_embedding_torch convention: interleaved (d r), r=2, rotating
    all dim_head dims with theta 10000."""
    d, t = x.shape[-1], x.shape[-2]
    half = d // 2
    freqs = 1.0 / (10000.0 ** (torch.arange(half, dtype=x.dtype) / half))
    ang = torch.arange(t, dtype=x.dtype)[:, None] * freqs[None, :]
    cos, sin = ang.cos(), ang.sin()
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return torch.stack(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1).flatten(-2)


class _BsrAttention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.norm = _BsrRMSNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_gates = nn.Linear(dim, heads)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False),
                                    nn.Dropout(0.0))
        self.heads, self.dim_head = heads, dim_head

    def forward(self, x):
        b, t, _ = x.shape
        x = self.norm(x)
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        shp = (b, t, self.heads, self.dim_head)
        q, k, v = (z.view(shp).transpose(1, 2) for z in (q, k, v))
        q, k = _bsr_rope(q), _bsr_rope(k)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o * self.to_gates(x).sigmoid().transpose(1, 2).unsqueeze(-1)
        o = o.transpose(1, 2).reshape(b, t, -1)
        return self.to_out(o)


def _bsr_ff(dim, mult=4):
    inner = dim * mult
    return nn.Sequential(_BsrRMSNorm(dim), nn.Linear(dim, inner), nn.GELU(),
                         nn.Dropout(0.0), nn.Linear(inner, dim),
                         nn.Dropout(0.0))


class _BsrFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = _bsr_ff(dim, mult)

    def forward(self, x):
        return self.net(x)


class _BsrTransformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, ff_mult):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.ModuleList([_BsrAttention(dim, heads, dim_head),
                            _BsrFeedForward(dim, ff_mult)])
             for _ in range(depth)])
        self.norm = _BsrRMSNorm(dim)

    def forward(self, x):
        for attn, ff in self.layers:
            x = x + attn(x)
            x = x + ff(x)
        return self.norm(x)


class _BsrBandSplit(nn.Module):
    def __init__(self, dim, dim_inputs):
        super().__init__()
        self.to_features = nn.ModuleList(
            [nn.Sequential(_BsrRMSNorm(din), nn.Linear(din, dim))
             for din in dim_inputs])

    def forward(self, x, dim_inputs):
        outs = []
        start = 0
        for fn, din in zip(self.to_features, dim_inputs):
            outs.append(fn(x[..., start:start + din]))
            start += din
        return torch.stack(outs, dim=-2)


def _bsr_mlp(din, dout, hidden, depth):
    dims = (din,) + (hidden,) * depth + (dout,)
    mods = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        mods.append(nn.Linear(a, b))
        if i < len(dims) - 2:
            mods.append(nn.Tanh())
    return nn.Sequential(*mods)


class _BsrMaskEstimator(nn.Module):
    def __init__(self, dim, dim_inputs, depth):
        super().__init__()
        self.to_freqs = nn.ModuleList(
            [nn.Sequential(_bsr_mlp(dim, din * 2, dim * 4, depth),
                           nn.GLU(dim=-1))
             for din in dim_inputs])

    def forward(self, x):
        # x (b, t, bands, dim) -> (b, t, sum(dim_inputs))
        outs = [fn(x[..., i, :]) for i, fn in enumerate(self.to_freqs)]
        return torch.cat(outs, dim=-1)


class BSRoformerTorch(nn.Module):
    """lucidrains/BS-RoFormer replica (inference graph); state-dict names
    match the published viperx/ZFTurbo separation checkpoints the reference
    downloads (stem_separator.py:379-386)."""

    def __init__(self, dim, depth, heads=8, dim_head=64, num_stems=1,
                 freqs_per_bands=(2, 3), n_fft=2048, hop=512, channels=2,
                 ff_mult=4, time_depth=1, freq_depth=1, mask_est_depth=2):
        super().__init__()
        self.cfgv = dict(freqs_per_bands=freqs_per_bands, n_fft=n_fft,
                         hop=hop, channels=channels)
        dim_inputs = tuple(2 * f * channels for f in freqs_per_bands)
        self.band_split = _BsrBandSplit(dim, dim_inputs)
        self.layers = nn.ModuleList(
            [nn.ModuleList(
                [_BsrTransformer(dim, time_depth, heads, dim_head, ff_mult),
                 _BsrTransformer(dim, freq_depth, heads, dim_head, ff_mult)])
             for _ in range(depth)])
        self.final_norm = _BsrRMSNorm(dim)
        self.mask_estimators = nn.ModuleList(
            [_BsrMaskEstimator(dim, dim_inputs, mask_est_depth)
             for _ in range(num_stems)])
        self.dim_inputs = dim_inputs

    def forward(self, audio):
        # audio (b, s, n) -> (b, num_stems, s, n)
        cfg = self.cfgv
        b, s, n = audio.shape
        win = torch.hann_window(cfg["n_fft"], dtype=audio.dtype)
        spec = torch.stft(audio.reshape(b * s, n), n_fft=cfg["n_fft"],
                          hop_length=cfg["hop"], window=win,
                          return_complex=True)  # (b*s, f, t)
        spec = torch.view_as_real(spec).reshape(
            b, s, spec.shape[-2], spec.shape[-1], 2)
        # 'b s f t c -> b (f s) t c' then 'b f t c -> b t (f c)'
        fs = spec.permute(0, 2, 1, 3, 4)  # b f s t c
        packed = fs.permute(0, 3, 1, 2, 4).reshape(
            b, fs.shape[3], -1)  # b t (f s c)
        x = self.band_split(packed, self.dim_inputs)  # (b, t, bands, dim)

        t_frames, bands = x.shape[1], x.shape[2]
        for time_tr, freq_tr in self.layers:
            xt = x.permute(0, 2, 1, 3).reshape(b * bands, t_frames, -1)
            xt = time_tr(xt)
            x = xt.reshape(b, bands, t_frames, -1).permute(0, 2, 1, 3)
            xf = x.reshape(b * t_frames, bands, -1)
            xf = freq_tr(xf)
            x = xf.reshape(b, t_frames, bands, -1)
        x = self.final_norm(x)

        outs = []
        for est in self.mask_estimators:
            mask = est(x)  # (b, t, (f s c))
            mask = mask.reshape(b, t_frames, -1, 2)  # (b, t, (f s), c)
            mc = torch.view_as_complex(mask.contiguous())  # (b, t, f s)
            sc = torch.view_as_complex(
                fs.reshape(b, -1, fs.shape[3], 2).contiguous())  # (b, fs, t)
            masked = sc * mc.permute(0, 2, 1)
            # '(f s)' -> per-channel istft
            f_bins = cfg["n_fft"] // 2 + 1
            masked = masked.reshape(b, f_bins, s, -1).permute(0, 2, 1, 3)
            wav = torch.istft(masked.reshape(b * s, f_bins, -1),
                              n_fft=cfg["n_fft"], hop_length=cfg["hop"],
                              window=win, length=n)
            outs.append(wav.reshape(b, s, n))
        return torch.stack(outs, dim=1)


# ------------------------------------------------------------------ CREPE


class CrepeTorch(nn.Module):
    """torchcrepe Crepe replica (state-dict names conv{i}/conv{i}_BN/
    classifier match the published crepe weights)."""

    def __init__(self, model="tiny"):
        super().__init__()
        chans = {"full": (1024, 128, 128, 128, 256, 512),
                 "tiny": (128, 16, 16, 16, 32, 64)}[model]
        cin = 1
        for i, ch in enumerate(chans):
            k, s = ((512, 1), (4, 1)) if i == 0 else ((64, 1), (1, 1))
            setattr(self, f"conv{i + 1}", nn.Conv2d(cin, ch, k, s))
            setattr(self, f"conv{i + 1}_BN", nn.BatchNorm2d(ch))
            cin = ch
        self.classifier = nn.Linear(chans[-1] * 4, 360)

    def forward(self, x):
        # x (b, 1024) normalized frames
        x = x[:, None, :, None]
        for i in range(6):
            pad = (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32)
            x = F.pad(x, pad)
            x = getattr(self, f"conv{i + 1}")(x)
            x = F.relu(x)
            x = getattr(self, f"conv{i + 1}_BN")(x)
            x = F.max_pool2d(x, (2, 1), (2, 1))
        x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)
        return torch.sigmoid(self.classifier(x))


# -------------------------------------------------------------------- DAC


class _DacSnake1d(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, ch, 1))

    def forward(self, x):
        return x + torch.sin(self.alpha * x) ** 2 / (self.alpha + 1e-9)


def _dac_wn(conv):
    return weight_norm(conv)


class _DacResUnit(nn.Module):
    def __init__(self, ch, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            _DacSnake1d(ch),
            _dac_wn(nn.Conv1d(ch, ch, 7, dilation=dilation, padding=pad)),
            _DacSnake1d(ch),
            _dac_wn(nn.Conv1d(ch, ch, 1)),
        )

    def forward(self, x):
        return x + self.block(x)


class _DacDecoderBlock(nn.Module):
    def __init__(self, cin, cout, rate):
        super().__init__()
        self.block = nn.Sequential(
            _DacSnake1d(cin),
            _dac_wn(nn.ConvTranspose1d(cin, cout, 2 * rate, stride=rate,
                                       padding=rate // 2)),
            _DacResUnit(cout, 1),
            _DacResUnit(cout, 3),
            _DacResUnit(cout, 9),
        )

    def forward(self, x):
        return self.block(x)


class _DacVQ(nn.Module):
    def __init__(self, latent, cb_dim, cb_size):
        super().__init__()
        self.codebook = nn.Embedding(cb_size, cb_dim)
        self.out_proj = _dac_wn(nn.Conv1d(cb_dim, latent, 1))


class DACDecoderTorch(nn.Module):
    """descript-audio-codec decode path; state-dict names match the
    published weights.pth (quantizer.quantizers.N, decoder.model.N)."""

    def __init__(self, latent=32, decoder_dim=64, rates=(4, 2), n_q=3,
                 cb_size=32, cb_dim=4):
        super().__init__()
        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            [_DacVQ(latent, cb_dim, cb_size) for _ in range(n_q)])
        mods = [_dac_wn(nn.Conv1d(latent, decoder_dim, 7, padding=3))]
        ch = decoder_dim
        for r in rates:
            mods.append(_DacDecoderBlock(ch, ch // 2, r))
            ch //= 2
        mods += [_DacSnake1d(ch),
                 _dac_wn(nn.Conv1d(ch, 1, 7, padding=3)), nn.Tanh()]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*mods)

    def forward(self, codes):
        # codes (b, n_q, t)
        z = 0.0
        for i, q in enumerate(self.quantizer.quantizers):
            e = q.codebook(codes[:, i]).transpose(1, 2)  # (b, cb_dim, t)
            z = z + q.out_proj(e)
        return self.decoder.model(z)


# ------------------------------------------------------------------ Vocos


class _VocosConvNeXt(nn.Module):
    def __init__(self, dim, mult=3):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim)
        self.pwconv1 = nn.Linear(dim, dim * mult)
        self.pwconv2 = nn.Linear(dim * mult, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # (b, t, d)
        h = self.dwconv(x.transpose(1, 2)).transpose(1, 2)
        h = self.norm(h)
        h = self.pwconv2(F.gelu(self.pwconv1(h)))
        return x + self.gamma * h


class VocosTorch(nn.Module):
    """charactr/vocos replica (backbone.* / head.out key names)."""

    def __init__(self, in_dim=16, dim=32, n_layers=2, mult=3, n_fft=64,
                 hop=16):
        super().__init__()
        self.backbone = nn.Module()
        self.backbone.embed = nn.Conv1d(in_dim, dim, 7, padding=3)
        self.backbone.norm = nn.LayerNorm(dim)
        self.backbone.convnext = nn.ModuleList(
            [_VocosConvNeXt(dim, mult) for _ in range(n_layers)])
        self.backbone.final_layer_norm = nn.LayerNorm(dim)
        self.head = nn.Module()
        self.head.out = nn.Linear(dim, n_fft + 2)
        self.n_fft, self.hop = n_fft, hop

    def forward(self, z):  # (b, t, in_dim) -> (b, n)
        x = self.backbone.embed(z.transpose(1, 2)).transpose(1, 2)
        x = self.backbone.norm(x)
        for blk in self.backbone.convnext:
            x = blk(x)
        x = self.backbone.final_layer_norm(x)
        out = self.head.out(x)
        mag, p = out.chunk(2, dim=-1)
        mag = torch.exp(mag).clip(max=1e2)
        spec = (mag * torch.cos(p) + 1j * mag * torch.sin(p))
        return torch.istft(spec.transpose(1, 2), self.n_fft, self.hop,
                           window=torch.hann_window(self.n_fft,
                                                    dtype=z.dtype),
                           center=True)


# ---------------------------------------------------------- LLaMA-arch LM


class _LlamaRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        v = x.pow(2).mean(-1, keepdim=True)
        return self.weight * (x * torch.rsqrt(v + self.eps))


def _llama_rope(x, pos, theta=10000.0):
    # HF convention: rotate_half over split halves
    d = x.shape[-1]
    inv = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=x.dtype) / d))
    ang = pos[:, None].to(x.dtype) * inv[None, :]
    cos = torch.cat([ang.cos(), ang.cos()], dim=-1)[None, :, None, :]
    sin = torch.cat([ang.sin(), ang.sin()], dim=-1)[None, :, None, :]
    x1, x2 = x.chunk(2, dim=-1)
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


class _LlamaAttention(nn.Module):
    def __init__(self, dim, heads, kv_heads):
        super().__init__()
        hd = dim // heads
        self.q_proj = nn.Linear(dim, heads * hd, bias=False)
        self.k_proj = nn.Linear(dim, kv_heads * hd, bias=False)
        self.v_proj = nn.Linear(dim, kv_heads * hd, bias=False)
        self.o_proj = nn.Linear(heads * hd, dim, bias=False)
        self.heads, self.kv_heads, self.hd = heads, kv_heads, hd

    def forward(self, x, pos):
        b, t, _ = x.shape
        q = self.q_proj(x).view(b, t, self.heads, self.hd)
        k = self.k_proj(x).view(b, t, self.kv_heads, self.hd)
        v = self.v_proj(x).view(b, t, self.kv_heads, self.hd)
        q, k = _llama_rope(q, pos), _llama_rope(k, pos)
        rep = self.heads // self.kv_heads
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True)
        return self.o_proj(o.transpose(1, 2).reshape(b, t, -1))


class _LlamaMLP(nn.Module):
    def __init__(self, dim, ffn):
        super().__init__()
        self.gate_proj = nn.Linear(dim, ffn, bias=False)
        self.up_proj = nn.Linear(dim, ffn, bias=False)
        self.down_proj = nn.Linear(ffn, dim, bias=False)

    def forward(self, x):
        return self.down_proj(F.silu(self.gate_proj(x)) * self.up_proj(x))


class _LlamaLayer(nn.Module):
    def __init__(self, dim, heads, kv_heads, ffn):
        super().__init__()
        self.self_attn = _LlamaAttention(dim, heads, kv_heads)
        self.mlp = _LlamaMLP(dim, ffn)
        self.input_layernorm = _LlamaRMSNorm(dim)
        self.post_attention_layernorm = _LlamaRMSNorm(dim)

    def forward(self, x, pos):
        x = x + self.self_attn(self.input_layernorm(x), pos)
        return x + self.mlp(self.post_attention_layernorm(x))


class LlamaTorch(nn.Module):
    """HF-LLaMA-named causal LM replica (model.layers.N.*, lm_head)."""

    def __init__(self, vocab=64, dim=32, layers=2, heads=4, kv_heads=2,
                 ffn=64):
        super().__init__()
        self.model = nn.Module()
        self.model.embed_tokens = nn.Embedding(vocab, dim)
        self.model.layers = nn.ModuleList(
            [_LlamaLayer(dim, heads, kv_heads, ffn) for _ in range(layers)])
        self.model.norm = _LlamaRMSNorm(dim)
        self.lm_head = nn.Linear(dim, vocab, bias=False)

    def forward(self, ids):
        x = self.model.embed_tokens(ids)
        pos = torch.arange(ids.shape[1])
        for layer in self.model.layers:
            x = layer(x, pos)
        return self.lm_head(self.model.norm(x))


# -------------------------------------------------------------------- Dia


class _DiaDG(nn.Module):
    """DenseGeneral (dia/layers.py:30-91): input-major kernel, no bias."""

    def __init__(self, in_shape, out_shape):
        super().__init__()
        self.weight = nn.Parameter(
            torch.randn(*in_shape, *out_shape) * 0.05)
        self.n_in = len(in_shape)

    def forward(self, x):
        w = self.weight.reshape(
            int(np.prod(self.weight.shape[:self.n_in])), -1)
        xf = x.reshape(*x.shape[:-self.n_in], -1)
        y = xf @ w
        return y.reshape(*x.shape[:-self.n_in],
                         *self.weight.shape[self.n_in:])


def _dia_rope(x, pos):
    """Split-half rotary, timescale 1..10000 (dia/layers.py:167-207)."""
    hd = x.shape[-1]
    frac = 2.0 * torch.arange(hd // 2, dtype=x.dtype) / hd
    timescale = 10000.0 ** frac
    ang = pos.to(x.dtype)[:, None] / timescale[None, :]  # (t, hd/2)
    sin, cos = ang.sin()[None, :, None, :], ang.cos()[None, :, None, :]
    x1, x2 = torch.chunk(x, 2, dim=-1)
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)


class _DiaAttention(nn.Module):
    def __init__(self, q_dim, kv_dim, q_heads, kv_heads, hd, out_dim):
        super().__init__()
        self.q_proj = _DiaDG((q_dim,), (q_heads, hd))
        self.k_proj = _DiaDG((kv_dim,), (kv_heads, hd))
        self.v_proj = _DiaDG((kv_dim,), (kv_heads, hd))
        self.o_proj = _DiaDG((q_heads, hd), (out_dim,))
        self.rep = q_heads // kv_heads

    def forward(self, xq, xkv, pos_q, pos_k, causal):
        q = _dia_rope(self.q_proj(xq), pos_q).transpose(1, 2)
        k = _dia_rope(self.k_proj(xkv), pos_k).transpose(1, 2)
        v = self.v_proj(xkv).transpose(1, 2)
        if self.rep > 1:
            k = k.repeat_interleave(self.rep, dim=1)
            v = v.repeat_interleave(self.rep, dim=1)
        o = F.scaled_dot_product_attention(q, k, v, is_causal=causal,
                                           scale=1.0)  # layers.py:399
        return self.o_proj(o.transpose(1, 2))


class _DiaMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.wi_fused = _DiaDG((dim,), (2, hidden))
        self.wo = _DiaDG((hidden,), (dim,))

    def forward(self, x):
        h = self.wi_fused(x)
        return self.wo(F.silu(h[..., 0, :]) * h[..., 1, :])


from torch.nn import RMSNorm as _TorchRMSNorm


class _DiaEncLayer(nn.Module):
    def __init__(self, dim, heads, hd):
        super().__init__()
        self.pre_sa_norm = _TorchRMSNorm(dim, eps=1e-5)
        self.self_attention = _DiaAttention(dim, dim, heads, heads, hd, dim)
        self.post_sa_norm = _TorchRMSNorm(dim, eps=1e-5)
        self.mlp = _DiaMlp(dim, dim * 4)

    def forward(self, x, pos):
        x = x + self.self_attention(self.pre_sa_norm(x), self.pre_sa_norm(x),
                                    pos, pos, causal=False)
        return x + self.mlp(self.post_sa_norm(x))


class _DiaDecLayer(nn.Module):
    def __init__(self, dim, enc_dim, heads, kv_heads, hd, xhd):
        super().__init__()
        self.pre_sa_norm = _TorchRMSNorm(dim, eps=1e-5)
        self.pre_ca_norm = _TorchRMSNorm(dim, eps=1e-5)
        self.pre_mlp_norm = _TorchRMSNorm(dim, eps=1e-5)
        self.self_attention = _DiaAttention(dim, dim, heads, kv_heads, hd, dim)
        self.cross_attention = _DiaAttention(dim, enc_dim, heads, heads,
                                             xhd, dim)
        self.mlp = _DiaMlp(dim, dim * 4)

    def forward(self, x, enc, pos, src_pos):
        h = self.pre_sa_norm(x)
        x = x + self.self_attention(h, h, pos, pos, causal=True)
        x = x + self.cross_attention(self.pre_ca_norm(x), enc, pos, src_pos,
                                     causal=False)
        return x + self.mlp(self.pre_mlp_norm(x))


class DiaTorch(nn.Module):
    """nari-labs Dia replica (encoder./decoder. key names, teacher-forcing
    forward returning last-position per-channel logits)."""

    def __init__(self, vocab_text=256, dim_enc=16, dim_dec=32, n_enc=1,
                 n_dec=2, heads=4, kv_heads=2, hd_dec=8, xhd=8,
                 enc_heads=2, channels=3, vocab=20):
        super().__init__()
        enc_hd = dim_enc // enc_heads
        self.encoder = nn.Module()
        self.encoder.embedding = nn.Embedding(vocab_text, dim_enc)
        self.encoder.layers = nn.ModuleList(
            [_DiaEncLayer(dim_enc, enc_heads, enc_hd) for _ in range(n_enc)])
        self.encoder.norm = _TorchRMSNorm(dim_enc, eps=1e-5)
        self.decoder = nn.Module()
        self.decoder.embeddings = nn.ModuleList(
            [nn.Embedding(vocab, dim_dec) for _ in range(channels)])
        self.decoder.layers = nn.ModuleList(
            [_DiaDecLayer(dim_dec, dim_enc, heads, kv_heads, hd_dec, xhd)
             for _ in range(n_dec)])
        self.decoder.norm = _TorchRMSNorm(dim_dec, eps=1e-5)
        self.decoder.logits_dense = _DiaDG((dim_dec,), (channels, vocab))

    def forward(self, text_ids, codes):
        # text (b, s); codes (b, C, t) -> logits (b, C, vocab) at last pos
        pos_s = torch.arange(text_ids.shape[1])
        x = self.encoder.embedding(text_ids)
        for layer in self.encoder.layers:
            x = layer(x, pos_s)
        enc = self.encoder.norm(x)

        y = sum(emb(codes[:, i]) for i, emb in
                enumerate(self.decoder.embeddings))
        pos_t = torch.arange(codes.shape[2])
        for layer in self.decoder.layers:
            y = layer(y, enc, pos_t, pos_s)
        h = self.decoder.norm(y)[:, -1]
        return self.decoder.logits_dense(h)


# ----------------------------------------------------------- xcodec (YuE)


class _XcVQ(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self._codebook = nn.Module()
        self._codebook.register_buffer("embed", torch.randn(bins, dim))


class XCodecDecoderTorch(nn.Module):
    """YuE xcodec decode path replica: encodec RVQ (quantizer.vq.layers.N.
    _codebook.embed) -> fc_post2 -> dac2 decoder_2 (NO final tanh; stride-5
    block carries output_padding 1, dac/model/dac.py:94-146)."""

    def __init__(self, n_q=2, bins=16, dim=12, acoustic=4, dec_dim=16,
                 rates=(2, 5)):
        super().__init__()
        self.quantizer = nn.Module()
        self.quantizer.vq = nn.Module()
        self.quantizer.vq.layers = nn.ModuleList(
            [_XcVQ(bins, dim) for _ in range(n_q)])
        self.fc_post2 = nn.Linear(dim, acoustic)
        mods = [_dac_wn(nn.Conv1d(acoustic, dec_dim, 7, padding=3))]
        ch = dec_dim
        for r in rates:
            blk = nn.Module()
            blk.block = nn.Sequential(
                _DacSnake1d(ch),
                _dac_wn(nn.ConvTranspose1d(
                    ch, ch // 2, 2 * r, stride=r,
                    padding=int(np.ceil(r / 2)), output_padding=r % 2)),
                _DacResUnit(ch // 2, 1),
                _DacResUnit(ch // 2, 3),
                _DacResUnit(ch // 2, 9),
            )
            mods.append(blk)
            ch //= 2
        mods += [_DacSnake1d(ch), _dac_wn(nn.Conv1d(ch, 1, 7, padding=3))]
        self.decoder_2 = nn.Module()
        self.decoder_2.model = nn.Sequential(*mods)

    def forward(self, codes):
        z = 0.0
        for i, q in enumerate(self.quantizer.vq.layers):
            z = z + F.embedding(codes[:, i], q._codebook.embed)
        z = self.fc_post2(z).transpose(1, 2)  # (b, acoustic, t)
        x = z
        for m in self.decoder_2.model:
            x = m.block(x) if hasattr(m, "block") else m(x)
        return x


# ------------------------------------------------------------------ Zonos


class _ZonosMHA(nn.Module):
    """mamba_ssm MHA (transformer-variant mixer): fused in_proj qkv,
    half-split rotary over the full head, causal SDPA, out_proj."""

    def __init__(self, dim, heads):
        super().__init__()
        self.in_proj = nn.Linear(dim, 3 * dim, bias=False)
        self.out_proj = nn.Linear(dim, dim, bias=False)
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        q, k, v = self.in_proj(x).chunk(3, dim=-1)
        q = q.view(b, t, self.heads, hd)
        k = k.view(b, t, self.heads, hd)
        v = v.view(b, t, self.heads, hd)
        pos = torch.arange(t)
        q, k = _llama_rope(q, pos), _llama_rope(k, pos)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True)
        return self.out_proj(o.transpose(1, 2).reshape(b, t, d))


class _ZonosGatedMLP(nn.Module):
    """mamba_ssm GatedMLP: fc1 -> (value, gate) -> value*silu(gate) -> fc2."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, 2 * hidden, bias=False)
        self.fc2 = nn.Linear(hidden, dim, bias=False)

    def forward(self, x):
        y, gate = self.fc1(x).chunk(2, dim=-1)
        return self.fc2(y * F.silu(gate))


class _ZonosBlock(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm = _LlamaRMSNorm(dim)
        self.mixer = _ZonosMHA(dim, heads)
        self.norm2 = _LlamaRMSNorm(dim)
        self.mlp = _ZonosGatedMLP(dim, hidden)

    def forward(self, x):
        x = x + self.mixer(self.norm(x))
        return x + self.mlp(self.norm2(x))


class ZonosTorch(nn.Module):
    """Zyphra Zonos transformer-variant replica: embeddings.N (1026-wide),
    backbone.layers.N (MHA+GatedMLP), norm_f, heads.N (1025-wide)."""

    def __init__(self, dim=32, heads=4, layers=2, n_codebooks=3,
                 emb_size=20, head_size=19, hidden=64):
        super().__init__()
        self.embeddings = nn.ModuleList(
            [nn.Embedding(emb_size, dim) for _ in range(n_codebooks)])
        self.backbone = nn.Module()
        self.backbone.layers = nn.ModuleList(
            [_ZonosBlock(dim, heads, hidden) for _ in range(layers)])
        self.backbone.norm_f = _LlamaRMSNorm(dim)
        self.heads = nn.ModuleList(
            [nn.Linear(dim, head_size, bias=False)
             for _ in range(n_codebooks)])

    def forward(self, codes):
        # codes (b, n_q, t) -> per-codebook logits (b, n_q, t, head_size)
        x = sum(emb(codes[:, i]) for i, emb in enumerate(self.embeddings))
        for layer in self.backbone.layers:
            x = layer(x)
        x = self.backbone.norm_f(x)
        return torch.stack([h(x) for h in self.heads], dim=1)


class MelBandRoformerTorch(BSRoformerTorch):
    """Mel-Band RoFormer replica: same trunk/params as BSRoformerTorch but
    bands are explicit (overlapping) STFT-bin index lists; masks scatter-
    ADD into bins and divide by the per-bin band count
    (lucidrains mel_band_roformer semantics)."""

    def __init__(self, band_bins, **kw):
        widths = tuple(len(b) for b in band_bins)
        super().__init__(freqs_per_bands=widths, **kw)
        self.band_bins = [list(b) for b in band_bins]
        n_bins = kw["n_fft"] // 2 + 1
        counts = torch.zeros(n_bins)
        for bins in band_bins:
            for bb in bins:
                counts[bb] += 1.0
        self.register_buffer("bin_counts", counts)

    def forward(self, audio):
        cfg = self.cfgv
        b, s, n = audio.shape
        win = torch.hann_window(cfg["n_fft"], dtype=audio.dtype)
        spec = torch.stft(audio.reshape(b * s, n), n_fft=cfg["n_fft"],
                          hop_length=cfg["hop"], window=win,
                          return_complex=True)
        spec = torch.view_as_real(spec).reshape(
            b, s, spec.shape[-2], spec.shape[-1], 2)
        fs = spec.permute(0, 2, 1, 3, 4)  # b f s t c
        t_frames = fs.shape[3]
        feat = fs.permute(0, 3, 1, 2, 4)  # b t f s c

        # per-band gather (overlapping)
        band_feats = []
        for bins, fn in zip(self.band_bins, self.band_split.to_features):
            g = feat[:, :, bins].reshape(b, t_frames, -1)
            band_feats.append(fn(g))
        x = torch.stack(band_feats, dim=-2)

        bands = x.shape[2]
        for time_tr, freq_tr in self.layers:
            xt = x.permute(0, 2, 1, 3).reshape(b * bands, t_frames, -1)
            xt = time_tr(xt)
            x = xt.reshape(b, bands, t_frames, -1).permute(0, 2, 1, 3)
            xf = x.reshape(b * t_frames, bands, -1)
            xf = freq_tr(xf)
            x = xf.reshape(b, t_frames, bands, -1)
        x = self.final_norm(x)

        f_bins = cfg["n_fft"] // 2 + 1
        outs = []
        for est in self.mask_estimators:
            # scatter-add per-band masks into bins, average overlaps
            summed = torch.zeros(b, t_frames, f_bins, s, 2,
                                 dtype=audio.dtype)
            for bi, (bins, fn) in enumerate(zip(self.band_bins,
                                                est.to_freqs)):
                mband = fn(x[..., bi, :])
                mband = mband.reshape(b, t_frames, len(bins), s, 2)
                summed[:, :, bins] += mband
            mask = summed / self.bin_counts.clamp(min=1.0)[None, None, :,
                                                           None, None]
            mc = torch.view_as_complex(mask.reshape(
                b, t_frames, f_bins * s, 2).contiguous())
            sc = torch.view_as_complex(
                fs.reshape(b, -1, t_frames, 2).contiguous())
            masked = sc * mc.permute(0, 2, 1)
            masked = masked.reshape(b, f_bins, s, -1).permute(0, 2, 1, 3)
            wav = torch.istft(masked.reshape(b * s, f_bins, -1),
                              n_fft=cfg["n_fft"], hop_length=cfg["hop"],
                              window=win, length=n)
            outs.append(wav.reshape(b, s, n))
        return torch.stack(outs, dim=1)


# ---------------------------------------------------------------- Whisper


class _WhisperAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.query = nn.Linear(dim, dim)
        self.key = nn.Linear(dim, dim, bias=False)
        self.value = nn.Linear(dim, dim)
        self.out = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x, xa=None, causal=False):
        b, t, d = x.shape
        src = x if xa is None else xa
        s = src.shape[1]
        hd = d // self.heads
        scale = hd ** -0.25
        q = (self.query(x) * scale).view(b, t, self.heads, hd).transpose(1, 2)
        k = (self.key(src) * scale).view(b, s, self.heads, hd).transpose(1, 2)
        v = self.value(src).view(b, s, self.heads, hd).transpose(1, 2)
        w = q @ k.transpose(-2, -1)
        if causal:
            mask = torch.full((t, s), float("-inf")).triu_(1)
            w = w + mask
        o = (w.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, t, d)
        return self.out(o)


class _WhisperBlock(nn.Module):
    def __init__(self, dim, heads, cross=False):
        super().__init__()
        self.attn = _WhisperAttention(dim, heads)
        self.attn_ln = nn.LayerNorm(dim)
        if cross:
            self.cross_attn = _WhisperAttention(dim, heads)
            self.cross_attn_ln = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Linear(4 * dim, dim))
        self.mlp_ln = nn.LayerNorm(dim)

    def forward(self, x, xa=None, causal=False):
        x = x + self.attn(self.attn_ln(x), causal=causal)
        if hasattr(self, "cross_attn") and xa is not None:
            x = x + self.cross_attn(self.cross_attn_ln(x), xa=xa)
        return x + self.mlp[2](F.gelu(self.mlp[0](self.mlp_ln(x))))


def _whisper_sinusoids(length, dim):
    inc = np.log(10000.0) / (dim // 2 - 1)
    inv = torch.exp(-inc * torch.arange(dim // 2))
    pos = torch.arange(length)[:, None] * inv[None, :]
    return torch.cat([pos.sin(), pos.cos()], dim=1)


class WhisperTorch(nn.Module):
    """OpenAI whisper replica (encoder./decoder. checkpoint key names,
    tied token-embedding logits)."""

    def __init__(self, n_mels=80, dim=64, heads=4, enc_layers=2,
                 dec_layers=2, vocab=100, n_text_ctx=32, n_audio_ctx=50):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.conv1 = nn.Conv1d(n_mels, dim, 3, padding=1)
        self.encoder.conv2 = nn.Conv1d(dim, dim, 3, stride=2, padding=1)
        self.encoder.blocks = nn.ModuleList(
            [_WhisperBlock(dim, heads) for _ in range(enc_layers)])
        self.encoder.ln_post = nn.LayerNorm(dim)
        self.decoder = nn.Module()
        self.decoder.token_embedding = nn.Embedding(vocab, dim)
        self.decoder.positional_embedding = nn.Parameter(
            torch.randn(n_text_ctx, dim) * 0.01)
        self.decoder.blocks = nn.ModuleList(
            [_WhisperBlock(dim, heads, cross=True)
             for _ in range(dec_layers)])
        self.decoder.ln = nn.LayerNorm(dim)
        self.n_audio_ctx = n_audio_ctx

    def forward(self, mel, tokens):
        # mel (b, t_mel, n_mels), tokens (b, t)
        x = F.gelu(self.encoder.conv1(mel.transpose(1, 2)))
        x = F.gelu(self.encoder.conv2(x)).transpose(1, 2)
        x = x + _whisper_sinusoids(self.n_audio_ctx,
                                   x.shape[-1])[: x.shape[1]].to(x.dtype)
        for blk in self.encoder.blocks:
            x = blk(x)
        xa = self.encoder.ln_post(x)

        y = (self.decoder.token_embedding(tokens)
             + self.decoder.positional_embedding[: tokens.shape[1]])
        for blk in self.decoder.blocks:
            y = blk(y, xa=xa, causal=True)
        y = self.decoder.ln(y)
        return y @ self.decoder.token_embedding.weight.T


# -------------------------------------------------------------- OpenVoice


class _OVRefEnc(nn.Module):
    """openvoice ReferenceEncoder (models.py:302-366): layernorm, six
    weight-normed Conv2d(3x3,s2,p1)+relu, channel-major flatten, GRU final
    state, proj."""

    def __init__(self, spec_channels, gin_channels):
        super().__init__()
        filters = [1, 32, 32, 64, 64, 128, 128]
        self.convs = nn.ModuleList([
            weight_norm(nn.Conv2d(filters[i], filters[i + 1], (3, 3),
                                  stride=(2, 2), padding=(1, 1)))
            for i in range(6)])
        out_ch = spec_channels
        for _ in range(6):
            out_ch = (out_ch - 3 + 2) // 2 + 1
        self.gru = nn.GRU(input_size=128 * out_ch, hidden_size=128,
                          batch_first=True)
        self.proj = nn.Linear(128, gin_channels)
        self.layernorm = nn.LayerNorm(spec_channels)

    def forward(self, spec):  # (b, t, spec_channels)
        n = spec.shape[0]
        out = self.layernorm(spec).view(n, 1, -1, spec.shape[-1])
        for conv in self.convs:
            out = F.relu(conv(out))
        out = out.transpose(1, 2)           # (N, T', 128, F')
        out = out.contiguous().view(n, out.shape[1], -1)
        _, h_n = self.gru(out)
        return self.proj(h_n.squeeze(0))


class _OVGenerator(nn.Module):
    """openvoice Generator (plain HiFiGAN, models.py:225-300)."""

    def __init__(self, initial, rates, kernels, init_ch, res_k, res_d,
                 gin):
        super().__init__()
        self.conv_pre = nn.Conv1d(initial, init_ch, 7, 1, padding=3)
        self.ups = nn.ModuleList()
        ch = init_ch
        for u, k in zip(rates, kernels):
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
        self.resblocks = nn.ModuleList()
        chs = init_ch
        for i in range(len(rates)):
            chs //= 2
            for k, d in zip(res_k, res_d):
                self.resblocks.append(ResBlock1(chs, k, tuple(d)))
        self.conv_post = nn.Conv1d(ch, 1, 7, 1, padding=3, bias=False)
        self.cond = nn.Conv1d(gin, init_ch, 1)
        self.num_kernels = len(res_k)

    def forward(self, x, g):
        x = self.conv_pre(x) + self.cond(g)
        for i, up in enumerate(self.ups):
            x = F.leaky_relu(x, LRELU_SLOPE)
            x = up(x)
            xs = 0.0
            for j in range(self.num_kernels):
                xs = xs + self.resblocks[i * self.num_kernels + j](x)
            x = xs / self.num_kernels
        x = F.leaky_relu(x)  # torch default slope, like the reference
        return torch.tanh(self.conv_post(x))


class OpenVoiceTorch(nn.Module):
    """OpenVoice converter replica (n_speakers=0 tone-color mode):
    ref_enc + enc_q + mean-only flow + plain-HiFiGAN dec; state-dict keys
    match converter.pth['model']."""

    def __init__(self, spec_channels=129, inter=8, hidden=16, gin=16,
                 rates=(4, 4, 2, 2), kernels=(8, 8, 4, 4), init_ch=32,
                 res_k=(3, 7, 11),
                 res_d=((1, 3, 5), (1, 3, 5), (1, 3, 5))):
        super().__init__()
        self.dec = _OVGenerator(inter, rates, kernels, init_ch, res_k,
                                res_d, gin)
        self.enc_q = PosteriorEncoder(spec_channels, inter, hidden, 5, 1,
                                      16, gin_channels=gin)
        # 4 WN layers per coupling — the real openvoice_cli value
        # (models.py:449); RVC's synthesizer uses 3
        self.flow = ResidualCouplingBlock(inter, hidden, 5, 1, 4,
                                          n_flows=4, gin_channels=gin)
        self.ref_enc = _OVRefEnc(spec_channels, gin)

    @torch.no_grad()
    def voice_conversion(self, spec, lengths, ref_src, ref_tgt):
        g_src = self.ref_enc(ref_src).unsqueeze(-1)
        g_tgt = self.ref_enc(ref_tgt).unsqueeze(-1)
        m_q, logs_q, y_mask = self.enc_q(spec, lengths, g=g_src)[1:]
        z = m_q  # tau=0 (deterministic)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        return self.dec(z_hat * y_mask, g_tgt)


class _ZonosMamba2(nn.Module):
    """mamba_ssm Mamba2 mixer replica (naive sequential SSD recurrence):
    in_proj -> [z|xBC|dt], depthwise causal conv, per-head A/D,
    softplus(dt+dt_bias), gated RMSNorm, out_proj."""

    def __init__(self, dim, d_state=16, d_conv=4, expand=2, headdim=8):
        super().__init__()
        di = expand * dim
        self.nheads = di // headdim
        self.headdim, self.d_state, self.d_conv, self.di = (headdim, d_state,
                                                            d_conv, di)
        conv_dim = di + 2 * d_state
        self.in_proj = nn.Linear(dim, 2 * di + 2 * d_state + self.nheads,
                                 bias=False)
        self.conv1d = nn.Conv1d(conv_dim, conv_dim, d_conv, groups=conv_dim,
                                padding=d_conv - 1)
        self.dt_bias = nn.Parameter(torch.randn(self.nheads) * 0.1)
        self.A_log = nn.Parameter(torch.log(torch.arange(1.0, self.nheads + 1)))
        self.D = nn.Parameter(torch.ones(self.nheads))
        self.norm = nn.Module()
        self.norm.weight = nn.Parameter(torch.ones(di))
        self.out_proj = nn.Linear(di, dim, bias=False)

    def forward(self, u):
        b, t, _ = u.shape
        di, ds, hd = self.di, self.d_state, self.headdim
        zxbcdt = self.in_proj(u)
        z = zxbcdt[..., :di]
        xbc = zxbcdt[..., di:di + di + 2 * ds]
        dt = zxbcdt[..., di + di + 2 * ds:]
        xbc = F.silu(self.conv1d(xbc.transpose(1, 2))[..., :t].transpose(1, 2))
        x = xbc[..., :di].reshape(b, t, self.nheads, hd)
        B = xbc[..., di:di + ds]
        C = xbc[..., di + ds:]
        dt = F.softplus(dt + self.dt_bias)           # (b, t, nheads)
        A = -torch.exp(self.A_log)                   # (nheads,)
        h = torch.zeros(b, self.nheads, hd, ds, dtype=u.dtype)
        ys = []
        for i in range(t):
            da = torch.exp(dt[:, i] * A[None, :])    # (b, nheads)
            h = h * da[..., None, None] + (
                dt[:, i, :, None, None] * x[:, i, :, :, None]
                * B[:, i, None, None, :])
            y = (h * C[:, i, None, None, :]).sum(-1) + self.D[None, :, None] * x[:, i]
            ys.append(y.reshape(b, di))
        y = torch.stack(ys, dim=1)
        g = y * F.silu(z)
        g = g * torch.rsqrt(g.pow(2).mean(-1, keepdim=True) + 1e-5)
        return self.out_proj(g * self.norm.weight)


class _ZonosHybridBlock(nn.Module):
    def __init__(self, dim, heads, hidden, kind, **mkw):
        super().__init__()
        self.norm = _LlamaRMSNorm(dim)
        self.mixer = (_ZonosMHA(dim, heads) if kind == "attn"
                      else _ZonosMamba2(dim, **mkw))
        self.norm2 = _LlamaRMSNorm(dim)
        self.mlp = _ZonosGatedMLP(dim, hidden)

    def forward(self, x):
        x = x + self.mixer(self.norm(x))
        return x + self.mlp(self.norm2(x))


class ZonosHybridTorch(nn.Module):
    """Zonos HYBRID backbone replica: Mamba2 mixers with attention every
    k-th layer (backbone.py create_block attn_layer_idx)."""

    def __init__(self, dim=32, heads=4, layers=3, attn_every=3,
                 n_codebooks=3, emb_size=20, head_size=19, hidden=128,
                 d_state=16, headdim=8):
        super().__init__()
        self.embeddings = nn.ModuleList(
            [nn.Embedding(emb_size, dim) for _ in range(n_codebooks)])
        self.backbone = nn.Module()
        self.backbone.layers = nn.ModuleList([
            _ZonosHybridBlock(
                dim, heads, hidden,
                "attn" if (i + 1) % attn_every == 0 else "mamba2",
                d_state=d_state, headdim=headdim)
            for i in range(layers)])
        self.backbone.norm_f = _LlamaRMSNorm(dim)
        self.heads = nn.ModuleList(
            [nn.Linear(dim, head_size, bias=False)
             for _ in range(n_codebooks)])

    def forward(self, codes):
        x = sum(emb(codes[:, i]) for i, emb in enumerate(self.embeddings))
        for layer in self.backbone.layers:
            x = layer(x)
        x = self.backbone.norm_f(x)
        return torch.stack([h(x) for h in self.heads], dim=1)


# ----------------------------------------------------------- ADaMoS vocoder


class _AdCNBlock(nn.Module):
    def __init__(self, dim, kernel=7):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, kernel, padding=kernel // 2,
                                groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):  # (b, c, t)
        h = self.dwconv(x).transpose(1, 2)
        h = self.pwconv2(F.gelu(self.pwconv1(self.norm(h))))
        return x + (self.gamma * h).transpose(1, 2)


class _AdLNcf(nn.Module):
    """channels-first LayerNorm (music_vocoder.py LayerNorm)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):  # (b, c, t)
        h = x.transpose(1, 2)
        h = F.layer_norm(h, h.shape[-1:], self.weight, self.bias, 1e-6)
        return h.transpose(1, 2)


class _AdSiLURes(nn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [_dac_wn(nn.Conv1d(ch, ch, k, dilation=d,
                               padding=(k * d - d) // 2)) for d in dil])
        self.convs2 = nn.ModuleList(
            [_dac_wn(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
             for _ in dil])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            x = x + c2(F.silu(c1(F.silu(x))))
        return x


class AdamosTorch(nn.Module):
    """ADaMoS HiFiGAN V1 replica (backbone./head. key names,
    music_vocoder.py:103-575)."""

    def __init__(self, input_channels=8, depths=(1, 1), dims=(8, 16),
                 rates=(4, 2), kernels=(8, 4), res_k=(3, 7),
                 res_d=((1, 3, 5), (1, 3, 5)), init_ch=16, pre_k=13,
                 post_k=13):
        super().__init__()
        self.backbone = nn.Module()
        stem = nn.Sequential(
            nn.Conv1d(input_channels, dims[0], 7, padding=3,
                      padding_mode="replicate"),
            _AdLNcf(dims[0]))
        layers = [stem]
        for i in range(len(depths) - 1):
            layers.append(nn.Sequential(_AdLNcf(dims[i]),
                                        nn.Conv1d(dims[i], dims[i + 1], 1)))
        self.backbone.channel_layers = nn.ModuleList(layers)
        self.backbone.stages = nn.ModuleList([
            nn.Sequential(*[_AdCNBlock(dims[i]) for _ in range(depths[i])])
            for i in range(len(depths))])
        self.backbone.norm = _AdLNcf(dims[-1])

        self.head = nn.Module()
        self.head.conv_pre = _dac_wn(
            nn.Conv1d(dims[-1], init_ch, pre_k, padding=pre_k // 2))
        self.head.ups = nn.ModuleList()
        ch = init_ch
        for u, k in zip(rates, kernels):
            self.head.ups.append(_dac_wn(
                nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
        self.head.resblocks = nn.ModuleList()
        chs = init_ch
        for i in range(len(rates)):
            chs //= 2
            for k, d in zip(res_k, res_d):
                self.head.resblocks.append(_AdSiLURes(chs, k, d))
        self.head.conv_post = _dac_wn(
            nn.Conv1d(ch, 1, post_k, padding=post_k // 2))
        self.nk = len(res_k)

    def forward(self, mel):  # (b, c, t)
        x = mel
        for cl, st in zip(self.backbone.channel_layers, self.backbone.stages):
            x = st(cl(x))
        x = self.backbone.norm(x)
        x = self.head.conv_pre(x)
        for i, up in enumerate(self.head.ups):
            x = up(F.silu(x))
            xs = 0.0
            for j in range(self.nk):
                xs = xs + self.head.resblocks[i * self.nk + j](x)
            x = xs / self.nk
        return torch.tanh(self.head.conv_post(F.silu(x)))


# ------------------------------------------------------------ ACE-Step DiT

def _ace_rope_tables(seq, dim, theta):
    inv = 1.0 / theta ** (torch.arange(0, dim, 2).double() / dim)
    freqs = torch.outer(torch.arange(seq).double(), inv)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def _ace_rope(x, cos, sin):
    # interleaved pairs against half-duplicated tables (the upstream quirk,
    # customer_attention_processor.py:34-62)
    xr, xi = x[..., 0::2], x[..., 1::2]
    rot = torch.stack([-xi, xr], dim=-1).flatten(3)
    return x * cos[None, None] + rot * sin[None, None]


class _AceRMS(nn.Module):
    def __init__(self, eps=1e-6):
        super().__init__()
        self.eps = eps

    def forward(self, x):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)


class _AceAttn(nn.Module):
    """diffusers-Attention key layout: to_q/k/v + to_out.0."""

    def __init__(self, dim, heads, head_dim, cross_dim=None):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(cross_dim or dim, inner)
        self.to_v = nn.Linear(cross_dim or dim, inner)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])


def _ace_lite_la(attn, x, mask, cos, sin):
    b, s, _ = x.shape
    h, d = attn.heads, attn.head_dim
    q = attn.to_q(x).transpose(-1, -2).reshape(b, h, d, s)
    k = attn.to_k(x).transpose(-1, -2).reshape(b, h, d, s).transpose(-1, -2)
    v = attn.to_v(x).transpose(-1, -2).reshape(b, h, d, s)
    q = _ace_rope(q.permute(0, 1, 3, 2), cos, sin).permute(0, 1, 3, 2)
    k = _ace_rope(k, cos, sin)
    if mask is not None:
        m = mask[:, None, :, None].to(k.dtype)
        q = q * m.permute(0, 1, 3, 2)
        k = k * m
        v = v * m.permute(0, 1, 3, 2)
    q, k = F.relu(q), F.relu(k)
    v = F.pad(v, (0, 0, 0, 1), value=1.0)
    out = (v @ k) @ q                         # (b, h, d+1, s)
    out = out[:, :, :-1] / (out[:, :, -1:] + 1e-15)
    out = out.reshape(b, h * d, s).permute(0, 2, 1)
    return attn.to_out[0](out)


def _ace_cross(attn, x, enc, mask, enc_mask, cos, sin, cos_c, sin_c):
    b, s, _ = x.shape
    h, d = attn.heads, attn.head_dim
    q = attn.to_q(x).view(b, -1, h, d).transpose(1, 2)
    k = attn.to_k(enc).view(b, -1, h, d).transpose(1, 2)
    v = attn.to_v(enc).view(b, -1, h, d).transpose(1, 2)
    q = _ace_rope(q, cos, sin)
    k = _ace_rope(k, cos_c, sin_c)
    am = None
    if mask is not None and enc_mask is not None:
        comb = mask[:, :, None] * enc_mask[:, None, :]
        am = torch.where(comb == 1, 0.0, -torch.inf)[:, None].double()
    out = F.scaled_dot_product_attention(q, k, v, attn_mask=am)
    out = out.transpose(1, 2).reshape(b, -1, h * d)
    return attn.to_out[0](out)


class _AceConvLayer(nn.Module):
    def __init__(self, i, o, k, groups=1, bias=True):
        super().__init__()
        self.conv = nn.Conv1d(i, o, k, padding=k // 2, groups=groups,
                              bias=bias)


class _AceGLUMB(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.inverted_conv = _AceConvLayer(dim, hidden * 2, 1)
        self.depth_conv = _AceConvLayer(hidden * 2, hidden * 2, 3,
                                        groups=hidden * 2)
        self.point_conv = _AceConvLayer(hidden, dim, 1, bias=False)

    def forward(self, x):
        x = F.silu(self.inverted_conv.conv(x.transpose(1, 2)))
        x = self.depth_conv.conv(x)
        x, gate = torch.chunk(x, 2, dim=1)
        x = self.point_conv.conv(x * F.silu(gate))
        return x.transpose(1, 2)


class _AceBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = _AceRMS()
        self.attn = _AceAttn(dim, heads, head_dim)
        self.cross_attn = _AceAttn(dim, heads, head_dim, cross_dim=dim)
        self.norm2 = _AceRMS()
        self.ff = _AceGLUMB(dim, int(dim * mlp_ratio))
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, x, enc, mask, enc_mask, cos, sin, cos_c, sin_c, temb):
        n = x.shape[0]
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = (
            self.scale_shift_table[None] + temb.reshape(n, 6, -1)
        ).chunk(6, dim=1)
        h = self.norm1(x) * (1 + sc_msa) + s_msa
        x = x + g_msa * _ace_lite_la(self.attn, h, mask, cos, sin)
        x = x + _ace_cross(self.cross_attn, x, enc, mask, enc_mask,
                           cos, sin, cos_c, sin_c)
        h = self.norm2(x) * (1 + sc_mlp) + s_mlp
        return x + g_mlp * self.ff(h)


class ACEStepDiTTorch(nn.Module):
    """Seeded stand-in for ACEStepTransformer2DModel (diffusers absent in
    this image) with the real checkpoint's key names; lyric conformer
    replaced by an external hidden-state input, matching the flax cut."""

    def __init__(self, in_ch=2, layers=2, heads=2, head_dim=4, patch_h=4,
                 spk_dim=6, text_dim=5, lyric_vocab=20, lyric_hidden=12,
                 ssl_dims=(7, 9), ssl_depths=(0, 1), theta=1e6):
        super().__init__()
        dim = heads * head_dim
        self.dim, self.heads, self.head_dim = dim, heads, head_dim
        self.patch_h, self.out_ch, self.theta = patch_h, in_ch, theta
        self.ssl_depths = ssl_depths
        self.transformer_blocks = nn.ModuleList(
            [_AceBlock(dim, heads, head_dim) for _ in range(layers)])
        self.timestep_embedder = nn.Module()
        self.timestep_embedder.linear_1 = nn.Linear(256, dim)
        self.timestep_embedder.linear_2 = nn.Linear(dim, dim)
        self.t_block = nn.Sequential(nn.SiLU(), nn.Linear(dim, 6 * dim))
        self.speaker_embedder = nn.Linear(spk_dim, dim)
        self.genre_embedder = nn.Linear(text_dim, dim)
        self.lyric_embs = nn.Embedding(lyric_vocab, lyric_hidden)
        self.lyric_proj = nn.Linear(lyric_hidden, dim)
        self.proj_in = nn.Module()
        self.proj_in.early_conv_layers = nn.Sequential(
            nn.Conv2d(in_ch, in_ch * 256, (patch_h, 1), (patch_h, 1)),
            nn.GroupNorm(32, in_ch * 256, eps=1e-6),
            nn.Conv2d(in_ch * 256, dim, 1),
        )
        self.final_layer = nn.Module()
        self.final_layer.scale_shift_table = nn.Parameter(
            torch.randn(2, dim) / dim**0.5)
        self.final_layer.linear = nn.Linear(dim, patch_h * in_ch)
        self.projectors = nn.ModuleList([
            nn.Sequential(nn.Linear(dim, 2 * dim), nn.SiLU(),
                          nn.Linear(2 * dim, 2 * dim), nn.SiLU(),
                          nn.Linear(2 * dim, sd))
            for sd in ssl_dims
        ])

    def _time_embed(self, t):
        half = 128
        freqs = torch.exp(
            -torch.log(torch.tensor(10000.0)).double()
            * torch.arange(half).double() / half)
        ang = t.double()[:, None] * freqs[None]
        emb = torch.cat([ang.cos(), ang.sin()], dim=-1)
        return self.timestep_embedder.linear_2(
            F.silu(self.timestep_embedder.linear_1(emb)))

    def forward(self, latent, mask, text_hidden, text_mask, speaker,
                timestep, lyric_hidden, lyric_mask):
        spk = self.speaker_embedder(speaker).unsqueeze(1)
        enc = torch.cat([spk, self.genre_embedder(text_hidden),
                         self.lyric_proj(lyric_hidden)], dim=1)
        enc_mask = torch.cat(
            [torch.ones(latent.shape[0], 1).double(), text_mask, lyric_mask],
            dim=1)

        emb_t = self._time_embed(timestep)
        temb = self.t_block(emb_t)
        x = self.proj_in.early_conv_layers(latent)
        x = x.flatten(2).transpose(1, 2)
        cos, sin = _ace_rope_tables(x.shape[1], self.head_dim, self.theta)
        cos_c, sin_c = _ace_rope_tables(enc.shape[1], self.head_dim,
                                        self.theta)
        inner = []
        for i, blk in enumerate(self.transformer_blocks):
            x = blk(x, enc, mask, enc_mask, cos, sin, cos_c, sin_c, temb)
            for d in self.ssl_depths:
                if i == d:
                    inner.append(x)
        shift, scale = (self.final_layer.scale_shift_table[None]
                        + emb_t[:, None]).chunk(2, dim=1)
        y = _AceRMS()(x) * (1 + scale) + shift
        y = self.final_layer.linear(y)
        b, t, _ = y.shape
        y = y.reshape(b, t, self.patch_h, self.out_ch).permute(0, 3, 2, 1)
        proj = [p(h) for p, h in zip(self.projectors, inner)]
        return y, proj


class _LyrRelAttn(nn.Module):
    """wenet RelPositionMultiHeadedAttention with the pad/reshape rel-shift
    (independent check of the flax gather formulation)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h, self.d_k = heads, dim // heads
        self.linear_q = nn.Linear(dim, dim)
        self.linear_k = nn.Linear(dim, dim)
        self.linear_v = nn.Linear(dim, dim)
        self.linear_out = nn.Linear(dim, dim)
        self.linear_pos = nn.Linear(dim, dim, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(self.h, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.randn(self.h, self.d_k))

    def _rel_shift(self, x):
        b, h, t, _ = x.shape
        x = F.pad(x, (1, 0))
        x = x.view(b, h, x.size(3), t)[:, :, 1:].view(b, h, t, -1)
        return x[..., : x.size(-1) // 2 + 1]

    def forward(self, x, mask, pos):
        b, t, _ = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.d_k)
        k = self.linear_k(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos).view(1, -1, self.h, self.d_k).transpose(1, 2)
        ac = (q + self.pos_bias_u).transpose(1, 2) @ k.transpose(-2, -1)
        bd = (q + self.pos_bias_v).transpose(1, 2) @ p.transpose(-2, -1)
        bd = self._rel_shift(bd)
        scores = (ac + bd) / math.sqrt(self.d_k)
        m = mask[:, None, None, :].eq(0)
        scores = scores.masked_fill(m, -float("inf"))
        attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        out = (attn @ v).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(out)


class _LyrBlock(nn.Module):
    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.self_attn = _LyrRelAttn(dim, heads)
        self.feed_forward = nn.Module()
        self.feed_forward.w_1 = nn.Linear(dim, ffn)
        self.feed_forward.w_2 = nn.Linear(ffn, dim)
        self.norm_mha = nn.LayerNorm(dim, eps=1e-5)
        self.norm_ff = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x, mask, pos):
        x = x + self.self_attn(self.norm_mha(x), mask, pos)
        h = self.norm_ff(x)
        return x + self.feed_forward.w_2(F.silu(self.feed_forward.w_1(h)))


class LyricConformerTorch(nn.Module):
    """ACE-Step lyric encoder replica at its instantiated defaults (no
    macaron / no conv module), published key names under the model's
    ``lyric_encoder.`` prefix."""

    def __init__(self, in_dim=12, dim=16, heads=2, ffn=24, blocks=2):
        super().__init__()
        self.dim = dim
        self.embed = nn.Module()
        self.embed.out = nn.Sequential(nn.Linear(in_dim, dim),
                                       nn.LayerNorm(dim, eps=1e-5))
        self.encoders = nn.ModuleList(
            [_LyrBlock(dim, heads, ffn) for _ in range(blocks)])
        self.after_norm = nn.LayerNorm(dim, eps=1e-5)

    def _pos(self, t):
        pos = torch.arange(t - 1, -t, -1).double()[:, None]
        div = torch.exp(torch.arange(0, self.dim, 2).double()
                        * (-math.log(10000.0) / self.dim))
        pe = torch.zeros(2 * t - 1, self.dim).double()
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        return pe[None]

    def forward(self, x, mask):
        x = self.embed.out(x) * math.sqrt(self.dim)
        pos = self._pos(x.size(1))
        for blk in self.encoders:
            x = blk(x, mask, pos)
        return self.after_norm(x)


# ------------------------------------------------------- Zonos prefix bank

class _ZpCond(nn.Module):
    def __init__(self, dim, spec):
        super().__init__()
        self.spec = spec
        cond_dim = spec.cond_dim or dim
        if spec.projection == "linear":
            self.project = nn.Linear(cond_dim, dim)
        elif spec.projection == "mlp":
            self.project = nn.Sequential(nn.Linear(cond_dim, dim), nn.SiLU(),
                                         nn.Linear(dim, dim))
        else:
            self.project = nn.Identity()
        if spec.uncond_type == "learned":
            self.uncond_vector = nn.Parameter(torch.zeros(dim))
        if spec.type == "EspeakPhonemeConditioner":
            self.phoneme_embedder = nn.Embedding(189, dim)
        elif spec.type == "FourierConditioner":
            self.register_buffer(
                "weight", torch.randn(dim // 2, spec.input_dim))
        elif spec.type == "IntegerConditioner":
            self.int_embedder = nn.Embedding(
                int(spec.max_val - spec.min_val) + 1, dim)

    def forward(self, x):
        s = self.spec
        if x is None:
            return self.uncond_vector.view(1, 1, -1)
        if s.type == "EspeakPhonemeConditioner":
            h = self.phoneme_embedder(x)
        elif s.type == "FourierConditioner":
            xn = (x - s.min_val) / (s.max_val - s.min_val)
            f = 2 * math.pi * xn.to(self.weight.dtype) @ self.weight.T
            h = torch.cat([f.cos(), f.sin()], dim=-1)
        elif s.type == "IntegerConditioner":
            h = self.int_embedder(x.squeeze(-1).long() - int(s.min_val))
        else:
            h = x
        return self.project(h)


class ZonosPrefixTorch(nn.Module):
    """Replica of conditioning.py PrefixConditioner with checkpoint key
    names (conditioners.{i}.*, project, norm)."""

    def __init__(self, dim, specs, projection="none"):
        super().__init__()
        self.conditioners = nn.ModuleList(_ZpCond(dim, s) for s in specs)
        if projection == "linear":
            self.project = nn.Linear(dim, dim)
        elif projection == "mlp":
            self.project = nn.Sequential(nn.Linear(dim, dim), nn.SiLU(),
                                         nn.Linear(dim, dim))
        else:
            self.project = nn.Identity()
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, cond: dict):
        outs = [c(cond.get(c.spec.name)) for c in self.conditioners]
        b = max(o.shape[0] for o in outs)
        outs = [o.expand(b, -1, -1) for o in outs]
        return self.norm(self.project(torch.cat(outs, dim=-2)))
