"""Seeded torch replica of the published chatterbox-tts T3 + voice
encoder, with the EXACT state-dict names the checkpoints ship
(t3_cfg.safetensors / ve.safetensors).

The backbone is the genuinely independent part: upstream T3 instantiates
``transformers.LlamaModel`` directly (models/t3/t3.py, llama_configs.py
"Llama_520M"), so this replica does too — key names and numerics under
``tfmr.`` come from the installed transformers package, not from code we
wrote.  The thin wrappers (embeddings, learned position embeddings,
T3CondEnc with its perceiver resampler, the two heads) follow the
published module layout (t3/modules/{cond_enc,perceiver,
learned_pos_emb}.py; voice_encoder/voice_encoder.py)."""

import math

import torch
import torch.nn as nn


class LearnedPositionEmbeddings(nn.Module):
    def __init__(self, seq_len, model_dim):
        super().__init__()
        self.emb = nn.Embedding(seq_len, model_dim)

    def forward(self, x):
        """x (B, T) token ids -> (T, dim) position embeddings."""
        return self.emb(torch.arange(x.shape[1], device=x.device))


class CrossAttention(nn.Module):
    """Diffusers-style cross-attention (to_q/k/v bias-free, to_out as a
    Sequential so the checkpoint key is ``attn.to_out.0``)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.Sequential(nn.Linear(dim, dim))

    def forward(self, q_in, kv):
        h = self.heads
        b, tq, d = q_in.shape
        hd = d // h
        q = self.to_q(q_in).view(b, tq, h, hd).transpose(1, 2)
        k = self.to_k(kv).view(b, -1, h, hd).transpose(1, 2)
        v = self.to_v(kv).view(b, -1, h, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, tq, d)
        return self.to_out(o)


class Perceiver(nn.Module):
    """Learned queries + ONE shared cross-attention applied twice."""

    def __init__(self, dim, tokens, heads):
        super().__init__()
        self.pre_attention_query = nn.Parameter(
            torch.empty(1, tokens, dim).uniform_(-0.05, 0.05))
        self.attn = CrossAttention(dim, heads)

    def forward(self, h):
        q = self.pre_attention_query.expand(h.shape[0], -1, -1)
        return self.attn(self.attn(q, h), h)


class T3CondEnc(nn.Module):
    def __init__(self, dim, spk_dim, perceiver_tokens, perceiver_heads):
        super().__init__()
        self.spkr_enc = nn.Linear(spk_dim, dim)
        self.emotion_adv_fc = nn.Linear(1, dim)
        self.perceiver = Perceiver(dim, perceiver_tokens, perceiver_heads)

    def forward(self, speaker_emb, prompt_emb, emotion_adv):
        parts = [self.spkr_enc(speaker_emb)[:, None]]
        if prompt_emb is not None:
            parts.append(self.perceiver(prompt_emb))
        parts.append(self.emotion_adv_fc(emotion_adv.view(-1, 1, 1)))
        return torch.cat(parts, dim=1)


class T3Replica(nn.Module):
    def __init__(self, dim=64, n_layers=2, heads=4, ffn=128, text_vocab=50,
                 speech_vocab=90, max_text=32, max_speech=48, spk_dim=16,
                 perceiver_tokens=8, perceiver_heads=4):
        super().__init__()
        from transformers import LlamaConfig, LlamaModel

        cfg = LlamaConfig(
            vocab_size=8, hidden_size=dim, intermediate_size=ffn,
            num_hidden_layers=n_layers, num_attention_heads=heads,
            num_key_value_heads=heads, rms_norm_eps=1e-6,
            attention_dropout=0.0, attn_implementation="eager")
        self.tfmr = LlamaModel(cfg)
        self.text_emb = nn.Embedding(text_vocab, dim)
        self.speech_emb = nn.Embedding(speech_vocab, dim)
        self.text_pos_emb = LearnedPositionEmbeddings(max_text + 2, dim)
        self.speech_pos_emb = LearnedPositionEmbeddings(max_speech + 4, dim)
        self.cond_enc = T3CondEnc(dim, spk_dim, perceiver_tokens,
                                  perceiver_heads)
        self.text_head = nn.Linear(dim, text_vocab)
        self.speech_head = nn.Linear(dim, speech_vocab)

    def forward(self, text_ids, speech_ids, speaker_emb, prompt_tokens,
                emotion_adv):
        prompt_emb = None
        if prompt_tokens is not None:
            prompt_emb = (self.speech_emb(prompt_tokens)
                          + self.speech_pos_emb(prompt_tokens))
        cond = self.cond_enc(speaker_emb, prompt_emb, emotion_adv)
        tex = self.text_emb(text_ids) + self.text_pos_emb(text_ids)
        spe = self.speech_emb(speech_ids) + self.speech_pos_emb(speech_ids)
        x = torch.cat([cond.expand(tex.shape[0], -1, -1), tex, spe], dim=1)
        h = self.tfmr(inputs_embeds=x).last_hidden_state
        n_cond, n_text = cond.shape[1], text_ids.shape[1]
        return (self.text_head(h[:, n_cond:n_cond + n_text]),
                self.speech_head(h[:, n_cond + n_text:]))


class VoiceEncoderReplica(nn.Module):
    """Resemblyzer layout: ``lstm.*`` + ``proj`` (ve.safetensors keys)."""

    def __init__(self, n_mels=40, hidden=256, out=256, n_layers=3):
        super().__init__()
        self.lstm = nn.LSTM(n_mels, hidden, num_layers=n_layers,
                            batch_first=True)
        self.proj = nn.Linear(hidden, out)

    def forward(self, mels):
        _, (hid, _) = self.lstm(mels)
        e = torch.relu(self.proj(hid[-1]))
        return e / e.norm(dim=-1, keepdim=True).clamp_min(1e-8)
