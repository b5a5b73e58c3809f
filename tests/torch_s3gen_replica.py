"""Seeded torch replica of the published chatterbox-tts S3Gen
(models/s3gen/{flow,flow_matching,decoder,hifigan}.py — a CosyVoice2-style
stack), with the EXACT state-dict names ``s3gen.safetensors`` ships under
its ``flow.`` / ``mel2wav.`` prefixes.

This is the numeric + key-layout oracle for
audiolab_tpu/models/chatterbox_s3gen.py: wenet UpsampleConformerEncoder
(rel-pos ESPnet attention with the wenet rel_shift), the matcha-style
causal CFM estimator (diffusers BasicTransformerBlock with
attention_head_dim=64), and the HiFT NSF+ISTFT vocoder with Snake
resblocks."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


# ------------------------------------------------- conformer flow encoder

class LinearNoSubsampling(nn.Module):
    """wenet: Linear + LayerNorm (+ Dropout, paramless); the espnet
    rel-pos encoding then scales by sqrt(dim)."""

    def __init__(self, idim, odim):
        super().__init__()
        self.out = nn.Sequential(nn.Linear(idim, odim),
                                 nn.LayerNorm(odim, eps=1e-5))

    def forward(self, x):
        x = self.out(x)
        return x * math.sqrt(x.shape[-1])


def espnet_pos_emb(t, dim):
    pos = torch.arange(t - 1, -t, -1, dtype=torch.float64)
    inv = torch.exp(torch.arange(0, dim, 2, dtype=torch.float64)
                    * -(math.log(10000.0) / dim))
    ang = pos[:, None] * inv[None, :]
    pe = torch.zeros(2 * t - 1, dim, dtype=torch.float64)
    pe[:, 0::2] = torch.sin(ang)
    pe[:, 1::2] = torch.cos(ang)
    return pe[None]


class RelPositionMultiHeadedAttention(nn.Module):
    def __init__(self, n_head, n_feat):
        super().__init__()
        self.h, self.d_k = n_head, n_feat // n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(self.h, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.zeros(self.h, self.d_k))

    def rel_shift(self, x):
        """wenet espnet-style rel_shift: (b, h, t, 2t-1) -> (b, h, t, t)."""
        zero_pad = torch.zeros((x.size(0), x.size(1), x.size(2), 1),
                               dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(x.size(0), x.size(1), x.size(3) + 1,
                                 x.size(2))
        return x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]

    def forward(self, x, pos_emb):
        b, t, _ = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.d_k)
        k = self.linear_k(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(pos_emb.size(0), -1, self.h,
                                          self.d_k).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        matrix_ac = torch.matmul(q_u, k.transpose(-2, -1))
        matrix_bd = self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        attn = torch.softmax(scores, dim=-1)
        o = torch.matmul(attn, v).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(o)


class PositionwiseFeedForward(nn.Module):
    def __init__(self, idim, hidden):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden)
        self.w_2 = nn.Linear(hidden, idim)

    def forward(self, x):
        return self.w_2(F.silu(self.w_1(x)))


class ConformerEncoderLayer(nn.Module):
    """normalize_before, no macaron, no conv module."""

    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.self_attn = RelPositionMultiHeadedAttention(heads, dim)
        self.feed_forward = PositionwiseFeedForward(dim, ffn)
        self.norm_mha = nn.LayerNorm(dim, eps=1e-5)
        self.norm_ff = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x, pos_emb):
        x = x + self.self_attn(self.norm_mha(x), pos_emb)
        return x + self.feed_forward(self.norm_ff(x))


class PreLookaheadLayer(nn.Module):
    def __init__(self, channels, pre_lookahead_len=3):
        super().__init__()
        self.pre_lookahead_len = pre_lookahead_len
        self.conv1 = nn.Conv1d(channels, channels, pre_lookahead_len + 1)
        self.conv2 = nn.Conv1d(channels, channels, 3)

    def forward(self, inputs):
        out = inputs.transpose(1, 2)
        out = F.pad(out, (0, self.pre_lookahead_len))
        out = F.leaky_relu(self.conv1(out))
        out = F.pad(out, (2, 0))
        out = self.conv2(out).transpose(1, 2)
        return out + inputs


class Upsample1D(nn.Module):
    def __init__(self, channels, stride=2):
        super().__init__()
        self.stride = stride
        self.conv = nn.Conv1d(channels, channels, stride * 2 + 1, stride=1,
                              padding=0)

    def forward(self, x):  # (b, c, t)
        x = F.interpolate(x, scale_factor=float(self.stride), mode="nearest")
        x = F.pad(x, (self.stride * 2, 0))
        return self.conv(x)


class UpsampleConformerEncoder(nn.Module):
    def __init__(self, dim=32, heads=2, ffn=64, n_layers=2, n_up_layers=1,
                 pre_lookahead=3):
        super().__init__()
        self.embed = LinearNoSubsampling(dim, dim)
        self.pre_lookahead_layer = PreLookaheadLayer(dim, pre_lookahead)
        self.encoders = nn.ModuleList(
            [ConformerEncoderLayer(dim, heads, ffn) for _ in range(n_layers)])
        self.up_layer = Upsample1D(dim, 2)
        self.up_embed = LinearNoSubsampling(dim, dim)
        self.up_encoders = nn.ModuleList(
            [ConformerEncoderLayer(dim, heads, ffn)
             for _ in range(n_up_layers)])
        self.after_norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):  # (b, t, c)
        x = self.embed(x)
        x = self.pre_lookahead_layer(x)
        pos = espnet_pos_emb(x.shape[1], x.shape[-1]).to(x.dtype)
        for layer in self.encoders:
            x = layer(x, pos)
        x = self.up_layer(x.transpose(1, 2)).transpose(1, 2)
        x = self.up_embed(x)
        pos = espnet_pos_emb(x.shape[1], x.shape[-1]).to(x.dtype)
        for layer in self.up_encoders:
            x = layer(x, pos)
        return self.after_norm(x)


# ------------------------------------------------- causal CFM estimator

class CausalConv1d(nn.Conv1d):
    def __init__(self, in_channels, out_channels, kernel_size):
        super().__init__(in_channels, out_channels, kernel_size, padding=0)
        self.causal_padding = (kernel_size - 1, 0)

    def forward(self, x):
        return super().forward(F.pad(x, self.causal_padding))


class Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class CausalBlock1D(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.block = nn.Sequential(
            CausalConv1d(dim, dim_out, 3), Transpose(),
            nn.LayerNorm(dim_out, eps=1e-5), Transpose(), nn.Mish())

    def forward(self, x):
        return self.block(x)


class CausalResnetBlock1D(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim):
        super().__init__()
        self.mlp = nn.Sequential(nn.Mish(), nn.Linear(time_emb_dim, dim_out))
        self.block1 = CausalBlock1D(dim, dim_out)
        self.block2 = CausalBlock1D(dim_out, dim_out)
        self.res_conv = nn.Conv1d(dim, dim_out, 1)

    def forward(self, x, t):
        h = self.block1(x)
        h = h + self.mlp(t).unsqueeze(-1)
        h = self.block2(h)
        return h + self.res_conv(x)


class _GELUProj(nn.Module):
    """diffusers GELU: proj then exact gelu (key ``net.0.proj``)."""

    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="none")


class _Attention(nn.Module):
    """diffusers Attention: inner dim = heads*head_dim, out bias."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        inner = heads * head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim))

    def forward(self, x):
        b, t, _ = x.shape
        h, d = self.heads, self.head_dim
        q = self.to_q(x).view(b, t, h, d).transpose(1, 2)
        k = self.to_k(x).view(b, t, h, d).transpose(1, 2)
        v = self.to_v(x).view(b, t, h, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, t, h * d)
        return self.to_out(o)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = _Attention(dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = nn.Sequential()
        self.ff.net = nn.ModuleList(
            [_GELUProj(dim, dim * 4), nn.Identity(),
             nn.Linear(dim * 4, dim)])

    def forward(self, x):
        x = x + self.attn1(self.norm1(x))
        h = self.norm3(x)
        for mod in self.ff.net:
            h = mod(h)
        return x + h


class ConditionalDecoder(nn.Module):
    """cosyvoice decoder.py ConditionalDecoder, causal, channels=(ch,)."""

    def __init__(self, in_channels, out_channels, channels=16, n_blocks=1,
                 mid_blocks=2, heads=2, head_dim=4):
        super().__init__()
        self.in_channels = in_channels
        ch = channels
        time_dim = ch * 4
        self.time_mlp = nn.Sequential()
        self.time_mlp.linear_1 = nn.Linear(in_channels, time_dim)
        self.time_mlp.linear_2 = nn.Linear(time_dim, time_dim)
        self.down_blocks = nn.ModuleList([nn.ModuleList([
            CausalResnetBlock1D(in_channels, ch, time_dim),
            nn.ModuleList([BasicTransformerBlock(ch, heads, head_dim)
                           for _ in range(n_blocks)]),
            CausalConv1d(ch, ch, 3)])])
        self.mid_blocks = nn.ModuleList([nn.ModuleList([
            CausalResnetBlock1D(ch, ch, time_dim),
            nn.ModuleList([BasicTransformerBlock(ch, heads, head_dim)
                           for _ in range(n_blocks)])])
            for _ in range(mid_blocks)])
        self.up_blocks = nn.ModuleList([nn.ModuleList([
            CausalResnetBlock1D(2 * ch, ch, time_dim),
            nn.ModuleList([BasicTransformerBlock(ch, heads, head_dim)
                           for _ in range(n_blocks)]),
            CausalConv1d(ch, ch, 3)])])
        self.final_block = CausalBlock1D(ch, ch)
        self.final_proj = nn.Conv1d(ch, out_channels, 1)

    def _time_emb(self, t):
        half = self.in_channels // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=t.dtype) * -emb)
        emb = 1000.0 * t.unsqueeze(1) * emb.unsqueeze(0)
        return torch.cat((emb.sin(), emb.cos()), dim=-1)

    def forward(self, x, mu, spks, cond, t):
        """all (b, c, t) channel-first; t (b,)."""
        te = self.time_mlp.linear_2(F.silu(self.time_mlp.linear_1(
            self._time_emb(t))))
        spks_t = spks.unsqueeze(-1).expand(-1, -1, x.shape[-1])
        h = torch.cat([x, mu, spks_t, cond], dim=1)

        resnet, tbs, downsample = self.down_blocks[0]
        h = resnet(h, te)
        h = h.transpose(1, 2)
        for tb in tbs:
            h = tb(h)
        h = h.transpose(1, 2)
        skip = h
        h = downsample(h)

        for resnet, tbs in self.mid_blocks:
            h = resnet(h, te)
            h = h.transpose(1, 2)
            for tb in tbs:
                h = tb(h)
            h = h.transpose(1, 2)

        resnet, tbs, upsample = self.up_blocks[0]
        h = torch.cat([h[:, :, :skip.shape[-1]], skip], dim=1)
        h = resnet(h, te)
        h = h.transpose(1, 2)
        for tb in tbs:
            h = tb(h)
        h = h.transpose(1, 2)
        h = upsample(h)

        h = self.final_block(h)
        return self.final_proj(h)


class CausalConditionalCFM(nn.Module):
    def __init__(self, estimator, n_timesteps=10, cfg_rate=0.7):
        super().__init__()
        self.estimator = estimator
        self.n_timesteps = n_timesteps
        self.cfg_rate = cfg_rate

    def forward(self, mu, spks, cond, noise, n_timesteps=None):
        steps = n_timesteps or self.n_timesteps
        ts = torch.linspace(0, 1, steps + 1, dtype=mu.dtype)
        ts = 1 - torch.cos(ts * 0.5 * math.pi)
        x = noise
        for i in range(steps):
            t = torch.full((x.shape[0],), ts[i], dtype=x.dtype)
            v_c = self.estimator(x, mu, spks, cond, t)
            v_u = self.estimator(x, torch.zeros_like(mu),
                                 torch.zeros_like(spks),
                                 torch.zeros_like(cond), t)
            v = (1.0 + self.cfg_rate) * v_c - self.cfg_rate * v_u
            x = x + (ts[i + 1] - ts[i]) * v
        return x


class FlowReplica(nn.Module):
    """flow.py CausalMaskedDiffWithXvec (inference path)."""

    def __init__(self, vocab=30, dim=32, mel=8, xdim=12, heads=2, ffn=64,
                 n_layers=2, n_up_layers=1, est_channels=16, est_mid=2,
                 est_blocks=1, est_heads=2, est_head_dim=4):
        super().__init__()
        self.input_embedding = nn.Embedding(vocab, dim)
        self.spk_embed_affine_layer = nn.Linear(xdim, mel)
        self.encoder = UpsampleConformerEncoder(dim, heads, ffn, n_layers,
                                                n_up_layers)
        self.encoder_proj = nn.Linear(dim, mel)
        self.decoder = CausalConditionalCFM(
            ConditionalDecoder(4 * mel, mel, est_channels, est_blocks,
                               est_mid, est_heads, est_head_dim))

    def forward(self, tokens, xvector, prompt_mel, noise, n_timesteps=None):
        """tokens (b, s); xvector (b, xdim); prompt_mel (b, tp, mel) or
        None; noise (b, 2s, mel).  Returns the FULL mel (b, 2s, mel)."""
        spk = F.normalize(xvector, dim=1)
        spk = self.spk_embed_affine_layer(spk)
        h = self.encoder(self.input_embedding(torch.clamp(tokens, min=0)))
        mu = self.encoder_proj(h)
        cond = torch.zeros(mu.shape, dtype=mu.dtype)
        if prompt_mel is not None:
            cond[:, :prompt_mel.shape[1]] = prompt_mel
        out = self.decoder(mu.transpose(1, 2), spk, cond.transpose(1, 2),
                           noise.transpose(1, 2), n_timesteps)
        return out.transpose(1, 2)


# ----------------------------------------------------------------- HiFT

class Snake(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(channels))

    def forward(self, x):  # (b, c, t)
        a = self.alpha.unsqueeze(0).unsqueeze(-1)
        return x + (1.0 / (a + 1e-9)) * torch.sin(x * a) ** 2


class ResBlock(nn.Module):
    def __init__(self, channels, kernel_size, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size, 1,
                                  dilation=d,
                                  padding=(kernel_size * d - d) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size, 1,
                                  padding=kernel_size // 2))
            for _ in dilations])
        self.activations1 = nn.ModuleList(
            [Snake(channels) for _ in dilations])
        self.activations2 = nn.ModuleList(
            [Snake(channels) for _ in dilations])

    def forward(self, x):
        for i in range(len(self.convs1)):
            xt = self.activations1[i](x)
            xt = self.convs1[i](xt)
            xt = self.activations2[i](xt)
            xt = self.convs2[i](xt)
            x = x + xt
        return x


class ConvRNNF0Predictor(nn.Module):
    def __init__(self, in_channels=8, cond_channels=12):
        super().__init__()
        layers = []
        ch = in_channels
        for _ in range(5):
            layers += [weight_norm(nn.Conv1d(ch, cond_channels, 3,
                                             padding=1)), nn.ELU()]
            ch = cond_channels
        self.condnet = nn.Sequential(*layers)
        self.classifier = nn.Linear(cond_channels, 1)

    def forward(self, x):  # (b, c, t)
        x = self.condnet(x)
        return torch.abs(self.classifier(x.transpose(1, 2)).squeeze(-1))


class SourceModuleHnNSF(nn.Module):
    def __init__(self, nb_harmonics=8):
        super().__init__()
        self.l_linear = nn.Linear(nb_harmonics + 1, 1)

    def forward(self, sine_wavs):
        return torch.tanh(self.l_linear(sine_wavs))


class HiFTReplica(nn.Module):
    """hifigan generator.py HiFTGenerator (decode path; the stochastic
    SineGen source is injected for parity)."""

    def __init__(self, in_channels=8, base_channels=16, nb_harmonics=8,
                 upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
                 istft_n_fft=16, istft_hop=4,
                 resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilations=((1, 3, 5),) * 3,
                 source_resblock_kernel_sizes=(7, 7, 11),
                 source_resblock_dilations=((1, 3, 5),) * 3,
                 f0_cond_channels=12):
        super().__init__()
        self.istft_n_fft, self.istft_hop = istft_n_fft, istft_hop
        self.num_kernels = len(resblock_kernel_sizes)
        self.m_source = SourceModuleHnNSF(nb_harmonics)
        self.conv_pre = weight_norm(
            nn.Conv1d(in_channels, base_channels, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates,
                                       upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                base_channels // (2 ** i), base_channels // (2 ** (i + 1)),
                k, u, padding=(k - u) // 2)))
        downsample_rates = [1] + list(upsample_rates[::-1][:-1])
        downsample_cum_rates = np.cumprod(downsample_rates)
        self.source_downs = nn.ModuleList()
        self.source_resblocks = nn.ModuleList()
        for i, (u, k, d) in enumerate(zip(
                downsample_cum_rates[::-1], source_resblock_kernel_sizes,
                source_resblock_dilations)):
            ch = base_channels // (2 ** (i + 1))
            if u == 1:
                self.source_downs.append(
                    nn.Conv1d(istft_n_fft + 2, ch, 1, 1))
            else:
                self.source_downs.append(
                    nn.Conv1d(istft_n_fft + 2, ch, int(u) * 2, int(u),
                              padding=int(u) // 2))
            self.source_resblocks.append(ResBlock(ch, k, d))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = base_channels // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilations):
                self.resblocks.append(ResBlock(ch, k, d))
        self.conv_post = weight_norm(
            nn.Conv1d(ch, istft_n_fft + 2, 7, 1, padding=3))
        self.reflection_pad = nn.ReflectionPad1d((1, 0))
        self.f0_predictor = ConvRNNF0Predictor(in_channels, f0_cond_channels)
        self.register_buffer(
            "stft_window", torch.hann_window(istft_n_fft), persistent=False)

    def decode(self, x, s):
        """x (b, mel, t) mel; s (b, n) source signal -> (b, n_samples)."""
        spec = torch.stft(s, self.istft_n_fft, self.istft_hop,
                          self.istft_n_fft,
                          window=self.stft_window.to(s.dtype),
                          return_complex=True)
        s_stft = torch.cat([spec.real, spec.imag], dim=1)
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = self.reflection_pad(x)
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            x = x + si
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        nb = self.istft_n_fft // 2 + 1
        magnitude = torch.exp(x[:, :nb, :])
        phase = torch.sin(x[:, nb:, :])
        spec = torch.complex(magnitude * torch.cos(phase),
                             magnitude * torch.sin(phase))
        wav = torch.istft(spec, self.istft_n_fft, self.istft_hop,
                          self.istft_n_fft,
                          window=self.stft_window.to(magnitude.real.dtype))
        return torch.clamp(wav, -0.99, 0.99)
