"""Seeded torch replica of facebookresearch/demucs v4 HTDemucs for parity
testing ``models/separation/htdemucs.py`` — the demucs package is not
installed here, so this mirrors demucs/htdemucs.py + hdemucs.py +
demucs.py (DConv) + transformer.py op-for-op with the checkpoint's
state-dict names (encoder.{i}.conv, tencoder.{i}.dconv.layers.{d}.{j},
decoder.{j}.conv_tr, crosstransformer.layers{,_t}.{idx}.self_attn...).

Only the inference path is replicated (dconv in encoders, cac masking,
no wiener, norm_starts beyond depth => no enc/dec GroupNorms at the
published config; the tiny test configs DO exercise the GroupNorm branch
via norm_starts=0).  Weight-init rescaling (rescale_module) only affects
initialization, not checkpoint values, so it is omitted."""

import math

import torch
import torch.nn.functional as F
from torch import nn


class LayerScale(nn.Module):
    def __init__(self, channels, init=0.0, channel_last=False):
        super().__init__()
        self.channel_last = channel_last
        self.scale = nn.Parameter(torch.full((channels,), init))

    def forward(self, x):
        if self.channel_last:
            return self.scale * x
        return self.scale[:, None] * x


class DConv(nn.Module):
    def __init__(self, channels, compress=8, depth=2, init=1e-3):
        super().__init__()
        hidden = int(channels / compress)
        self.layers = nn.ModuleList()
        for d in range(depth):
            dilation = 2 ** d
            padding = dilation * 1
            mods = [
                nn.Conv1d(channels, hidden, 3, dilation=dilation,
                          padding=padding),
                nn.GroupNorm(1, hidden), nn.GELU(),
                nn.Conv1d(hidden, 2 * channels, 1),
                nn.GroupNorm(1, 2 * channels), nn.GLU(1),
                LayerScale(channels, init),
            ]
            self.layers.append(nn.Sequential(*mods))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class HEncLayer(nn.Module):
    def __init__(self, chin, chout, kernel_size=8, stride=4, norm_groups=1,
                 empty=False, freq=True, dconv=True, norm=True, context=0,
                 dconv_kw={}, pad=True, rewrite=True):
        super().__init__()
        norm_fn = lambda d: nn.GroupNorm(norm_groups, d) if norm \
            else nn.Identity()  # noqa: E731
        pad = kernel_size // 4 if pad else 0
        klass = nn.Conv1d
        self.freq = freq
        self.kernel_size = kernel_size
        self.stride = stride
        self.empty = empty
        self.pad = pad
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            pad = [pad, 0]
            klass = nn.Conv2d
        self.conv = klass(chin, chout, kernel_size, stride, pad)
        if self.empty:
            return
        self.norm1 = norm_fn(chout)
        self.rewrite = None
        if rewrite:
            self.rewrite = klass(chout, 2 * chout, 1 + 2 * context, 1,
                                 context)
            self.norm2 = norm_fn(2 * chout)
        self.dconv = None
        if dconv:
            self.dconv = DConv(chout, **dconv_kw)

    def forward(self, x, inject=None):
        if not self.freq and x.dim() == 4:
            B, C, Fr, T = x.shape
            x = x.view(B, -1, T)
        if not self.freq:
            le = x.shape[-1]
            if not le % self.stride == 0:
                x = F.pad(x, (0, self.stride - (le % self.stride)))
        y = self.conv(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.dim() == 3 and y.dim() == 4:
                inject = inject[:, :, None]
            y = y + inject
        y = F.gelu(self.norm1(y))
        if self.dconv:
            if self.freq:
                B, C, Fr, T = y.shape
                y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            y = self.dconv(y)
            if self.freq:
                y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        if self.rewrite:
            z = self.norm2(self.rewrite(y))
            z = F.glu(z, dim=1)
        else:
            z = y
        return z


class HDecLayer(nn.Module):
    def __init__(self, chin, chout, last=False, kernel_size=8, stride=4,
                 norm_groups=1, empty=False, freq=True, dconv=False,
                 norm=True, context=1, pad=True, rewrite=True):
        super().__init__()
        norm_fn = lambda d: nn.GroupNorm(norm_groups, d) if norm \
            else nn.Identity()  # noqa: E731
        pad = kernel_size // 4 if pad else 0
        self.pad = pad
        self.last = last
        self.freq = freq
        self.chin = chin
        self.empty = empty
        self.stride = stride
        self.kernel_size = kernel_size
        klass = nn.Conv1d
        klass_tr = nn.ConvTranspose1d
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            klass = nn.Conv2d
            klass_tr = nn.ConvTranspose2d
        self.conv_tr = klass_tr(chin, chout, kernel_size, stride)
        self.norm2 = norm_fn(chout)
        if self.empty:
            return
        self.rewrite = None
        if rewrite:
            self.rewrite = klass(chin, 2 * chin, 1 + 2 * context, 1, context)
            self.norm1 = norm_fn(2 * chin)

    def forward(self, x, skip, length):
        if self.freq and x.dim() == 3:
            B, C, T = x.shape
            x = x.view(B, self.chin, -1, T)
        if not self.empty:
            x = x + skip
            if self.rewrite:
                y = F.glu(self.norm1(self.rewrite(x)), dim=1)
            else:
                y = x
        else:
            y = x
            assert skip is None
        z = self.norm2(self.conv_tr(y))
        if self.freq:
            if self.pad:
                z = z[..., self.pad:-self.pad, :]
        else:
            z = z[..., self.pad:self.pad + length]
            assert z.shape[-1] == length, (z.shape[-1], length)
        if not self.last:
            z = F.gelu(z)
        return z, y


# ----------------------------------------------------------- transformer

def create_sin_embedding(length, dim, shift=0, max_period=10000.0):
    pos = shift + torch.arange(length).view(-1, 1, 1)
    half_dim = dim // 2
    adim = torch.arange(dim // 2).view(1, 1, -1)
    phase = pos / (max_period ** (adim / (half_dim - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)


def create_2d_sin_embedding(d_model, height, width, max_period=10000.0):
    pe = torch.zeros(d_model, height, width)
    d_model = int(d_model / 2)
    div_term = torch.exp(torch.arange(0.0, d_model, 2)
                         * -(math.log(max_period) / d_model))
    pos_w = torch.arange(0.0, width).unsqueeze(1)
    pos_h = torch.arange(0.0, height).unsqueeze(1)
    pe[0:d_model:2, :, :] = torch.sin(
        pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[1:d_model:2, :, :] = torch.cos(
        pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[d_model::2, :, :] = torch.sin(
        pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    pe[d_model + 1::2, :, :] = torch.cos(
        pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    return pe[None, :]


class MyGroupNorm(nn.GroupNorm):
    def forward(self, x):
        x = x.transpose(1, 2)
        x = super().forward(x)
        return x.transpose(1, 2)


class MyTransformerEncoderLayer(nn.Module):
    def __init__(self, d_model, nhead, dim_feedforward, layer_scale=True,
                 init_values=1e-4, norm_first=True, norm_out=True):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead,
                                               batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_feedforward)
        self.linear2 = nn.Linear(dim_feedforward, d_model)
        self.norm1 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm2 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm_out = MyGroupNorm(1, d_model) if (norm_first and norm_out) \
            else None
        self.gamma_1 = LayerScale(d_model, init_values, True) if layer_scale \
            else nn.Identity()
        self.gamma_2 = LayerScale(d_model, init_values, True) if layer_scale \
            else nn.Identity()

    def forward(self, x):
        h = self.norm1(x)
        x = x + self.gamma_1(self.self_attn(h, h, h, need_weights=False)[0])
        x = x + self.gamma_2(
            self.linear2(F.gelu(self.linear1(self.norm2(x)))))
        if self.norm_out is not None:
            x = self.norm_out(x)
        return x


class CrossTransformerEncoderLayer(nn.Module):
    def __init__(self, d_model, nhead, dim_feedforward, layer_scale=True,
                 init_values=1e-4, norm_first=True, norm_out=True):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d_model, nhead,
                                                batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_feedforward)
        self.linear2 = nn.Linear(dim_feedforward, d_model)
        self.norm1 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm2 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm3 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm_out = MyGroupNorm(1, d_model) if (norm_first and norm_out) \
            else None
        self.gamma_1 = LayerScale(d_model, init_values, True)
        self.gamma_2 = LayerScale(d_model, init_values, True)

    def forward(self, q, k):
        x = q + self.gamma_1(self.cross_attn(
            self.norm1(q), self.norm2(k), self.norm2(k),
            need_weights=False)[0])
        x = x + self.gamma_2(
            self.linear2(F.gelu(self.linear1(self.norm3(x)))))
        if self.norm_out is not None:
            x = self.norm_out(x)
        return x


class CrossTransformerEncoder(nn.Module):
    def __init__(self, dim, hidden_scale=4.0, num_heads=8, num_layers=5,
                 max_period=10000.0, weight_pos_embed=1.0):
        super().__init__()
        hidden = int(dim * hidden_scale)
        self.max_period = max_period
        self.weight_pos_embed = weight_pos_embed
        self.num_layers = num_layers
        self.norm_in = nn.LayerNorm(dim)
        self.norm_in_t = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        self.layers_t = nn.ModuleList()
        for idx in range(num_layers):
            if idx % 2 == 0:
                self.layers.append(MyTransformerEncoderLayer(
                    dim, num_heads, hidden))
                self.layers_t.append(MyTransformerEncoderLayer(
                    dim, num_heads, hidden))
            else:
                self.layers.append(CrossTransformerEncoderLayer(
                    dim, num_heads, hidden))
                self.layers_t.append(CrossTransformerEncoderLayer(
                    dim, num_heads, hidden))

    def forward(self, x, xt):
        B, C, Fr, T1 = x.shape
        pos_emb_2d = create_2d_sin_embedding(C, Fr, T1, self.max_period)
        pos_emb_2d = pos_emb_2d.permute(0, 3, 2, 1).reshape(1, T1 * Fr, C)
        x = x.permute(0, 3, 2, 1).reshape(B, T1 * Fr, C)
        x = self.norm_in(x)
        x = x + self.weight_pos_embed * pos_emb_2d.to(x.dtype)

        B, C, T2 = xt.shape
        xt = xt.permute(0, 2, 1)
        pos_emb = create_sin_embedding(T2, C, max_period=self.max_period)
        pos_emb = pos_emb.permute(1, 0, 2)
        xt = self.norm_in_t(xt)
        xt = xt + self.weight_pos_embed * pos_emb.to(xt.dtype)

        for idx in range(self.num_layers):
            if idx % 2 == 0:
                x = self.layers[idx](x)
                xt = self.layers_t[idx](xt)
            else:
                old_x = x
                x = self.layers[idx](x, xt)
                xt = self.layers_t[idx](xt, old_x)
        x = x.reshape(B, T1, Fr, C).permute(0, 3, 2, 1)
        xt = xt.permute(0, 2, 1)
        return x, xt


class ScaledEmbedding(nn.Module):
    def __init__(self, num_embeddings, embedding_dim, scale=10.0):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, embedding_dim)
        self.embedding.weight.data /= scale
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


def spectro(x, n_fft, hop_length):
    *other, length = x.shape
    x = x.reshape(-1, length)
    z = torch.stft(x, n_fft, hop_length,
                   window=torch.hann_window(n_fft).to(x),
                   win_length=n_fft, normalized=True, center=True,
                   return_complex=True, pad_mode="reflect")
    _, freqs, frames = z.shape
    return z.view(*other, freqs, frames)


def ispectro(z, hop_length, length):
    *other, freqs, frames = z.shape
    n_fft = 2 * freqs - 2
    z = z.view(-1, freqs, frames)
    x = torch.istft(z, n_fft, hop_length,
                    window=torch.hann_window(n_fft).to(z.real),
                    win_length=n_fft, normalized=True, length=length,
                    center=True)
    _, length = x.shape
    return x.view(*other, length)


class HTDemucs(nn.Module):
    """Replica wrapper taking the flax-side HTDemucsConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c = cfg
        self.hop_length = c.nfft // 4
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        chin = c.audio_channels
        chin_z = chin * 2
        chout = c.channels
        chout_z = c.channels
        s = len(c.sources)
        dconv_kw = {"depth": c.dconv_depth, "compress": c.dconv_comp}
        for index in range(c.depth):
            norm = index >= c.norm_starts
            kw = dict(kernel_size=c.kernel_size, stride=c.stride,
                      norm=norm, norm_groups=c.norm_groups)
            enc = HEncLayer(chin_z, chout_z, freq=True, dconv=True,
                            context=c.context_enc, dconv_kw=dconv_kw, **kw)
            tenc = HEncLayer(chin, chout, freq=False, dconv=True,
                             context=c.context_enc, dconv_kw=dconv_kw, **kw)
            self.encoder.append(enc)
            self.tencoder.append(tenc)
            if index == 0:
                chin = c.audio_channels * s
                chin_z = chin * 2
            dec = HDecLayer(chout_z, chin_z, freq=True, last=index == 0,
                            context=c.context, **kw)
            tdec = HDecLayer(chout, chin, freq=False, last=index == 0,
                             context=c.context, **kw)
            self.decoder.insert(0, dec)
            self.tdecoder.insert(0, tdec)
            chin = chout
            chin_z = chout_z
            chout = int(c.growth * chout)
            chout_z = int(c.growth * chout_z)
            if index == 0:
                freqs_after = (c.nfft // 2) // c.stride
                self.freq_emb = ScaledEmbedding(freqs_after, chin_z,
                                                scale=c.emb_scale)
        tch = c.channels * c.growth ** (c.depth - 1)
        if c.bottom_channels:
            self.channel_upsampler = nn.Conv1d(tch, c.bottom_channels, 1)
            self.channel_downsampler = nn.Conv1d(c.bottom_channels, tch, 1)
            self.channel_upsampler_t = nn.Conv1d(tch, c.bottom_channels, 1)
            self.channel_downsampler_t = nn.Conv1d(c.bottom_channels, tch, 1)
            tch = c.bottom_channels
        self.crosstransformer = CrossTransformerEncoder(
            tch, c.t_hidden_scale, c.t_heads, c.t_layers, c.t_max_period,
            c.t_weight_pos_embed)

    def _spec(self, x):
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = F.pad(x, (pad, pad + le * hl - x.shape[-1]), mode="reflect")
        z = spectro(x, self.cfg.nfft, hl)[..., :-1, :]
        z = z[..., 2: 2 + le]
        return z

    def _ispec(self, z, length):
        hl = self.hop_length
        z = F.pad(z, (0, 0, 0, 1))
        z = F.pad(z, (2, 2))
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = ispectro(z, hl, length=le)
        return x[..., pad: pad + length]

    def forward(self, mix):
        c = self.cfg
        length = mix.shape[-1]
        length_pre_pad = None
        training_length = int(c.segment_seconds * c.samplerate)
        if mix.shape[-1] < training_length:
            length_pre_pad = mix.shape[-1]
            mix = F.pad(mix, (0, training_length - length_pre_pad))
        length = mix.shape[-1]
        z = self._spec(mix)
        B, C, Fq, T = z.shape
        mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3)
        mag = mag.reshape(B, C * 2, Fq, T)
        x = mag
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)

        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            lengths_t.append(xt.shape[-1])
            xt = self.tencoder[idx](xt)
            saved_t.append(xt)
            x = encode(x)
            if idx == 0:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + self.cfg.freq_emb_scale * emb
            saved.append(x)

        if c.bottom_channels:
            b, ch_, f_, t_ = x.shape
            x = x.reshape(b, ch_, -1)
            x = self.channel_upsampler(x)
            x = x.reshape(b, -1, f_, t_)
            xt = self.channel_upsampler_t(xt)
        x, xt = self.crosstransformer(x, xt)
        if c.bottom_channels:
            b, ch_, f_, t_ = x.shape
            x = x.reshape(b, ch_, -1)
            x = self.channel_downsampler(x)
            x = x.reshape(b, -1, f_, t_)
            xt = self.channel_downsampler_t(xt)

        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            skip_t = saved_t.pop(-1)
            xt, _ = self.tdecoder[idx](xt, skip_t, lengths_t.pop(-1))

        S = len(c.sources)
        x = x.view(B, S, -1, Fq, T)
        x = x * std[:, None] + mean[:, None]
        out = x.view(B, S, -1, 2, Fq, T).permute(0, 1, 2, 4, 5, 3)
        zout = torch.view_as_complex(out.contiguous())
        xf = self._ispec(zout, length)
        xt = xt.view(B, S, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        x = xt + xf
        if length_pre_pad:
            x = x[..., :length_pre_pad]
        return x
