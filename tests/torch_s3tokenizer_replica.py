"""Seeded torch replica of xingchensong's s3tokenizer
``speech_tokenizer_v2_25hz`` (model_v2.py AudioEncoderV2 + FSQ), the
speech tokenizer the published chatterbox package bundles in
s3gen.safetensors under ``tokenizer.``.  Exact state-dict key layout;
numeric + layout oracle for audiolab_tpu/models/s3tokenizer.py."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def sinusoids(length, channels, max_timescale=10000):
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = torch.exp(
        -log_timescale_increment * torch.arange(channels // 2))
    scaled_time = (torch.arange(length)[:, None].float()
                   * inv_timescales[None, :])
    return torch.cat([torch.sin(scaled_time), torch.cos(scaled_time)],
                     dim=1)


class MultiHeadAttention(nn.Module):
    def __init__(self, n_state, n_head):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)


class FSMNMultiHeadAttention(MultiHeadAttention):
    def __init__(self, n_state, n_head, kernel_size=31):
        super().__init__(n_state, n_head)
        self.fsmn_block = nn.Conv1d(n_state, n_state, kernel_size,
                                    stride=1, padding=0, groups=n_state,
                                    bias=False)
        self.left_padding = (kernel_size - 1) // 2
        self.right_padding = kernel_size - 1 - self.left_padding
        self.pad_fn = nn.ConstantPad1d(
            (self.left_padding, self.right_padding), 0.0)

    def forward_fsmn(self, inputs):
        b, t, _, _ = inputs.size()
        inputs = inputs.view(b, t, -1)
        x = inputs.transpose(1, 2)
        x = self.pad_fn(x)
        x = self.fsmn_block(x)
        x = x.transpose(1, 2)
        return x + inputs

    def qkv_attention(self, q, k, v):
        _, _, d = q.shape
        scale = (d // self.n_head) ** -0.25
        q = q.view(*q.shape[:2], self.n_head, -1)
        k = k.view(*k.shape[:2], self.n_head, -1)
        v = v.view(*v.shape[:2], self.n_head, -1)
        fsm_memory = self.forward_fsmn(v)
        q = q.permute(0, 2, 1, 3) * scale
        k = k.permute(0, 2, 3, 1) * scale
        v = v.permute(0, 2, 1, 3)
        w = torch.softmax(q @ k, dim=-1)
        o = (w @ v).permute(0, 2, 1, 3).flatten(start_dim=2)
        return o, fsm_memory

    def forward(self, x):
        q = self.query(x)
        k = self.key(x)
        v = self.value(x)
        wv, fsm_memory = self.qkv_attention(q, k, v)
        return self.out(wv) + fsm_memory


class ResidualAttentionBlock(nn.Module):
    def __init__(self, n_state, n_head, kernel_size=31):
        super().__init__()
        self.attn = FSMNMultiHeadAttention(n_state, n_head, kernel_size)
        self.attn_ln = nn.LayerNorm(n_state)
        n_mlp = n_state * 4
        self.mlp = nn.Sequential(nn.Linear(n_state, n_mlp), nn.GELU(),
                                 nn.Linear(n_mlp, n_state))
        self.mlp_ln = nn.LayerNorm(n_state)

    def forward(self, x):
        x = x + self.attn(self.attn_ln(x))
        return x + self.mlp(self.mlp_ln(x))


class AudioEncoderV2(nn.Module):
    def __init__(self, n_mels, n_state, n_head, n_layer, stride,
                 n_ctx=1500, kernel_size=31):
        super().__init__()
        self.conv1 = nn.Conv1d(n_mels, n_state, 3, stride=stride,
                               padding=1)
        self.conv2 = nn.Conv1d(n_state, n_state, 3, stride=2, padding=1)
        self.register_buffer("positional_embedding",
                             sinusoids(n_ctx, n_state))
        self.blocks = nn.ModuleList([
            ResidualAttentionBlock(n_state, n_head, kernel_size)
            for _ in range(n_layer)])
        self.ln_post = nn.LayerNorm(n_state)

    def forward(self, x):  # (b, n_mels, t)
        x = F.gelu(self.conv1(x))
        x = F.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)
        x = x + self.positional_embedding[: x.shape[1]].to(x.dtype)
        for block in self.blocks:
            x = block(x)
        return self.ln_post(x)


class FSQCodebook(nn.Module):
    def __init__(self, dim, level=3):
        super().__init__()
        self.project_down = nn.Linear(dim, 8)
        self.level = level

    def encode(self, x):
        h = self.project_down(x).tanh()
        h = h * 0.9990000128746033
        h = h.round() + 1
        powers = torch.pow(
            torch.full((8,), float(self.level), dtype=h.dtype),
            torch.arange(8, dtype=h.dtype))
        return torch.sum(h * powers, dim=-1)


class S3TokenizerV2Replica(nn.Module):
    def __init__(self, n_mels=128, n_state=1280, n_head=20, n_layer=12,
                 stride=2, kernel_size=31):
        super().__init__()
        self.encoder = AudioEncoderV2(n_mels, n_state, n_head, n_layer,
                                      stride, kernel_size=kernel_size)
        self.quantizer = nn.Module()
        self.quantizer.vq = FSQCodebook(n_state)

    def forward(self, mel):  # (b, n_mels, t) -> (b, t_tok) ids
        h = self.encoder(mel)
        return self.quantizer.vq.encode(h)
