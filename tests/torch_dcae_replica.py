"""Seeded torch replica of diffusers.AutoencoderDC for DCAE parity tests.

diffusers is not installed in this image (and there is no network), so the
oracle for ``models/dcae.py`` is this replica, written module-for-module
and op-for-op from diffusers/models/autoencoders/autoencoder_dc.py (the
class the reference loads at
modules/acestep/acestep/music_dcae/music_dcae_pipeline.py:11,40) and
diffusers/models/attention_processor.py::SanaMultiscaleAttnProcessor2_0.
State-dict key names match the published checkpoint layout
(encoder.down_blocks.{i}.{j}..., decoder.up_blocks.{i}.{j}...), so
``convert_dcae`` consumes this replica's state dict unchanged.
"""

import torch
import torch.nn.functional as F
from torch import nn


class RMSNorm(nn.Module):
    """diffusers RMSNorm(eps=1e-5, elementwise_affine=True, bias=True)."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        dtype = x.dtype
        var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + self.eps)
        return x.to(dtype) * self.weight + self.bias


ACT = {"silu": nn.SiLU, "relu": nn.ReLU,
       "relu6": nn.ReLU6, "gelu": nn.GELU}


class ResBlock(nn.Module):
    def __init__(self, in_channels, out_channels, norm_type="rms_norm",
                 act_fn="silu"):
        super().__init__()
        self.nonlinearity = ACT[act_fn]()
        self.conv1 = nn.Conv2d(in_channels, in_channels, 3, 1, 1)
        self.conv2 = nn.Conv2d(in_channels, out_channels, 3, 1, 1,
                               bias=False)
        self.norm = RMSNorm(out_channels)

    def forward(self, x):
        residual = x
        x = self.conv1(x)
        x = self.nonlinearity(x)
        x = self.conv2(x)
        x = self.norm(x.movedim(1, -1)).movedim(-1, 1)
        return x + residual


class SanaMultiscaleAttentionProjection(nn.Module):
    def __init__(self, in_channels, num_attention_heads, kernel_size):
        super().__init__()
        channels = 3 * in_channels
        self.proj_in = nn.Conv2d(channels, channels, kernel_size,
                                 padding=kernel_size // 2, groups=channels,
                                 bias=False)
        self.proj_out = nn.Conv2d(channels, channels, 1, 1, 0,
                                  groups=3 * num_attention_heads, bias=False)

    def forward(self, x):
        return self.proj_out(self.proj_in(x))


class SanaMultiscaleLinearAttention(nn.Module):
    def __init__(self, in_channels, out_channels, attention_head_dim=32,
                 kernel_sizes=(5,), norm_type="rms_norm",
                 residual_connection=True, eps=1e-15, mult=1.0):
        super().__init__()
        self.eps = eps
        self.attention_head_dim = attention_head_dim
        self.norm_type = norm_type
        self.residual_connection = residual_connection
        num_attention_heads = int(in_channels // attention_head_dim * mult)
        inner_dim = num_attention_heads * attention_head_dim
        self.to_q = nn.Linear(in_channels, inner_dim, bias=False)
        self.to_k = nn.Linear(in_channels, inner_dim, bias=False)
        self.to_v = nn.Linear(in_channels, inner_dim, bias=False)
        self.to_qkv_multiscale = nn.ModuleList(
            [SanaMultiscaleAttentionProjection(inner_dim,
                                               num_attention_heads, k)
             for k in kernel_sizes])
        self.nonlinearity = nn.ReLU()
        self.to_out = nn.Linear(inner_dim * (1 + len(kernel_sizes)),
                                out_channels, bias=False)
        self.norm_out = RMSNorm(out_channels)

    def apply_linear_attention(self, query, key, value):
        value = F.pad(value, (0, 0, 0, 1), mode="constant", value=1)
        scores = torch.matmul(value, key.transpose(-1, -2))
        hidden_states = torch.matmul(scores, query)
        hidden_states = hidden_states.to(dtype=torch.float32)
        hidden_states = hidden_states[:, :, :-1] / (
            hidden_states[:, :, -1:] + self.eps)
        return hidden_states

    def apply_quadratic_attention(self, query, key, value):
        scores = torch.matmul(key.transpose(-1, -2), query)
        scores = scores.to(dtype=torch.float32)
        scores = scores / (torch.sum(scores, dim=2, keepdim=True) + self.eps)
        hidden_states = torch.matmul(value, scores.to(value.dtype))
        return hidden_states

    def forward(self, hidden_states):
        height, width = hidden_states.shape[-2:]
        use_linear_attention = height * width > self.attention_head_dim
        residual = hidden_states
        batch_size = hidden_states.shape[0]
        original_dtype = hidden_states.dtype

        hidden_states = hidden_states.movedim(1, -1)
        query = self.to_q(hidden_states)
        key = self.to_k(hidden_states)
        value = self.to_v(hidden_states)
        hidden_states = torch.cat([query, key, value], dim=3)
        hidden_states = hidden_states.movedim(-1, 1)

        multi_scale_qkv = [hidden_states]
        for block in self.to_qkv_multiscale:
            multi_scale_qkv.append(block(hidden_states))
        hidden_states = torch.cat(multi_scale_qkv, dim=1)

        if use_linear_attention:
            hidden_states = hidden_states.to(dtype=torch.float32)
        hidden_states = hidden_states.reshape(
            batch_size, -1, 3 * self.attention_head_dim, height * width)
        query, key, value = hidden_states.chunk(3, dim=2)
        query = self.nonlinearity(query)
        key = self.nonlinearity(key)

        if use_linear_attention:
            hidden_states = self.apply_linear_attention(query, key, value)
            hidden_states = hidden_states.to(dtype=original_dtype)
        else:
            hidden_states = self.apply_quadratic_attention(query, key, value)

        hidden_states = torch.reshape(hidden_states,
                                      (batch_size, -1, height, width))
        hidden_states = self.to_out(
            hidden_states.movedim(1, -1)).movedim(-1, 1)
        hidden_states = self.norm_out(
            hidden_states.movedim(1, -1)).movedim(-1, 1)
        if self.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states


class GLUMBConv(nn.Module):
    def __init__(self, in_channels, out_channels, expand_ratio=4,
                 norm_type="rms_norm", residual_connection=True):
        super().__init__()
        hidden_channels = int(expand_ratio * in_channels)
        self.norm_type = norm_type
        self.residual_connection = residual_connection
        self.nonlinearity = nn.SiLU()
        self.conv_inverted = nn.Conv2d(in_channels, hidden_channels * 2, 1)
        self.conv_depth = nn.Conv2d(hidden_channels * 2, hidden_channels * 2,
                                    3, 1, 1, groups=hidden_channels * 2)
        self.conv_point = nn.Conv2d(hidden_channels, out_channels, 1,
                                    bias=False)
        if norm_type == "rms_norm":
            self.norm = RMSNorm(out_channels)

    def forward(self, x):
        residual = x
        x = self.conv_inverted(x)
        x = self.nonlinearity(x)
        x = self.conv_depth(x)
        x, gate = torch.chunk(x, 2, dim=1)
        x = x * self.nonlinearity(gate)
        x = self.conv_point(x)
        if self.norm_type == "rms_norm":
            x = self.norm(x.movedim(1, -1)).movedim(-1, 1)
        if self.residual_connection:
            x = x + residual
        return x


class EfficientViTBlock(nn.Module):
    def __init__(self, in_channels, attention_head_dim=32,
                 qkv_multiscales=(5,), norm_type="rms_norm"):
        super().__init__()
        self.attn = SanaMultiscaleLinearAttention(
            in_channels, in_channels, attention_head_dim=attention_head_dim,
            kernel_sizes=qkv_multiscales, norm_type=norm_type,
            residual_connection=True)
        self.conv_out = GLUMBConv(in_channels, in_channels,
                                  norm_type="rms_norm",
                                  residual_connection=True)

    def forward(self, x):
        x = self.attn(x)
        x = self.conv_out(x)
        return x


def get_block(block_type, in_channels, out_channels, attention_head_dim,
              norm_type, act_fn, qkv_multiscales):
    if block_type == "ResBlock":
        return ResBlock(in_channels, out_channels, norm_type, act_fn)
    if block_type == "EfficientViTBlock":
        return EfficientViTBlock(in_channels,
                                 attention_head_dim=attention_head_dim,
                                 qkv_multiscales=qkv_multiscales,
                                 norm_type=norm_type)
    raise ValueError(block_type)


class DCDownBlock2d(nn.Module):
    def __init__(self, in_channels, out_channels, downsample=False,
                 shortcut=True):
        super().__init__()
        self.downsample = downsample
        self.factor = 2
        self.stride = 1 if downsample else 2
        self.group_size = in_channels * self.factor**2 // out_channels
        self.shortcut = shortcut
        out_ratio = self.factor**2
        conv_out = out_channels
        if downsample:
            assert out_channels % out_ratio == 0
            conv_out = out_channels // out_ratio
        self.conv = nn.Conv2d(in_channels, conv_out, 3, self.stride, 1)

    def forward(self, hidden_states):
        x = self.conv(hidden_states)
        if self.downsample:
            x = F.pixel_unshuffle(x, self.factor)
        if self.shortcut:
            y = F.pixel_unshuffle(hidden_states, self.factor)
            y = y.unflatten(1, (-1, self.group_size))
            y = y.mean(dim=2)
            return x + y
        return x


class DCUpBlock2d(nn.Module):
    def __init__(self, in_channels, out_channels, interpolate=False,
                 shortcut=True, interpolation_mode="nearest"):
        super().__init__()
        self.interpolate = interpolate
        self.interpolation_mode = interpolation_mode
        self.shortcut = shortcut
        self.factor = 2
        self.repeats = out_channels * self.factor**2 // in_channels
        conv_out = out_channels if interpolate else out_channels * self.factor**2
        self.conv = nn.Conv2d(in_channels, conv_out, 3, 1, 1)

    def forward(self, hidden_states):
        if self.interpolate:
            x = F.interpolate(hidden_states, scale_factor=self.factor,
                              mode=self.interpolation_mode)
            x = self.conv(x)
        else:
            x = self.conv(hidden_states)
            x = F.pixel_shuffle(x, self.factor)
        if self.shortcut:
            y = hidden_states.repeat_interleave(self.repeats, dim=1)
            y = F.pixel_shuffle(y, self.factor)
            return x + y
        return x


class Encoder(nn.Module):
    def __init__(self, in_channels, latent_channels, attention_head_dim,
                 block_types, block_out_channels, layers_per_block,
                 qkv_multiscales, downsample_block_type="conv"):
        super().__init__()
        num_blocks = len(block_out_channels)
        first = (block_out_channels[0] if layers_per_block[0] > 0
                 else block_out_channels[1])
        if layers_per_block[0] > 0:
            self.conv_in = nn.Conv2d(in_channels, first, 3, 1, 1)
        else:
            self.conv_in = DCDownBlock2d(
                in_channels, first,
                downsample=downsample_block_type == "pixel_unshuffle",
                shortcut=False)
        down_blocks = []
        for i, (out_channel, num_layers) in enumerate(
                zip(block_out_channels, layers_per_block)):
            down_block_list = []
            for _ in range(num_layers):
                down_block_list.append(get_block(
                    block_types[i], out_channel, out_channel,
                    attention_head_dim, "rms_norm", "silu",
                    qkv_multiscales[i]))
            if i < num_blocks - 1 and num_layers > 0:
                down_block_list.append(DCDownBlock2d(
                    out_channel, block_out_channels[i + 1],
                    downsample=downsample_block_type == "pixel_unshuffle",
                    shortcut=True))
            down_blocks.append(nn.Sequential(*down_block_list))
        self.down_blocks = nn.ModuleList(down_blocks)
        self.conv_out = nn.Conv2d(block_out_channels[-1], latent_channels,
                                  3, 1, 1)
        self.out_shortcut_average_group_size = (
            block_out_channels[-1] // latent_channels)

    def forward(self, x):
        x = self.conv_in(x)
        for down_block in self.down_blocks:
            x = down_block(x)
        y = x.unflatten(1, (-1, self.out_shortcut_average_group_size))
        y = y.mean(dim=2)
        return self.conv_out(x) + y


class Decoder(nn.Module):
    def __init__(self, in_channels, latent_channels, attention_head_dim,
                 block_types, block_out_channels, layers_per_block,
                 qkv_multiscales, norm_types, act_fns,
                 upsample_block_type="interpolate"):
        super().__init__()
        num_blocks = len(block_out_channels)
        self.conv_in = nn.Conv2d(latent_channels, block_out_channels[-1],
                                 3, 1, 1)
        self.in_shortcut_repeats = block_out_channels[-1] // latent_channels
        up_blocks = []
        for i, (out_channel, num_layers) in reversed(list(enumerate(
                zip(block_out_channels, layers_per_block)))):
            up_block_list = []
            if i < num_blocks - 1 and num_layers > 0:
                up_block_list.append(DCUpBlock2d(
                    block_out_channels[i + 1], out_channel,
                    interpolate=upsample_block_type == "interpolate",
                    shortcut=True))
            for _ in range(num_layers):
                up_block_list.append(get_block(
                    block_types[i], out_channel, out_channel,
                    attention_head_dim, norm_types[i], act_fns[i],
                    qkv_multiscales[i]))
            up_blocks.insert(0, nn.Sequential(*up_block_list))
        self.up_blocks = nn.ModuleList(up_blocks)
        channels = (block_out_channels[0] if layers_per_block[0] > 0
                    else block_out_channels[1])
        self.norm_out = RMSNorm(channels)
        self.conv_act = nn.ReLU()
        if layers_per_block[0] > 0:
            self.conv_out = nn.Conv2d(channels, in_channels, 3, 1, 1)
        else:
            self.conv_out = DCUpBlock2d(
                channels, in_channels,
                interpolate=upsample_block_type == "interpolate",
                shortcut=False)

    def forward(self, z):
        x = self.conv_in(z)
        x = x + z.repeat_interleave(self.in_shortcut_repeats, dim=1)
        for up_block in reversed(self.up_blocks):
            x = up_block(x)
        x = self.norm_out(x.movedim(1, -1)).movedim(-1, 1)
        x = self.conv_act(x)
        return self.conv_out(x)


class AutoencoderDC(nn.Module):
    """Replica wrapper taking the flax-side DCAEConfig."""

    def __init__(self, cfg):
        super().__init__()
        n = len(cfg.encoder_block_out_channels)
        norms = (cfg.decoder_norm_types,) * n if isinstance(
            cfg.decoder_norm_types, str) else cfg.decoder_norm_types
        acts = (cfg.decoder_act_fns,) * n if isinstance(
            cfg.decoder_act_fns, str) else cfg.decoder_act_fns
        self.encoder = Encoder(
            cfg.in_channels, cfg.latent_channels, cfg.attention_head_dim,
            cfg.encoder_block_types, cfg.encoder_block_out_channels,
            cfg.encoder_layers_per_block, cfg.encoder_qkv_multiscales,
            cfg.downsample_block_type)
        self.decoder = Decoder(
            cfg.in_channels, cfg.latent_channels, cfg.attention_head_dim,
            cfg.decoder_block_types, cfg.decoder_block_out_channels,
            cfg.decoder_layers_per_block, cfg.decoder_qkv_multiscales,
            norms, acts, cfg.upsample_block_type)
