"""Seeded torch replicas of the UVR "VR architecture" nets with the exact
state-dict key names of published .pth checkpoints (tsurumeso
vocal-remover lib_v5 nets.py / nets_new.py; the reference runs them via
audio-separator — stem_separator.py:114,148,752,1048-1050).

Both replicas return the padded sigmoid MASK (the nets' eval forward
multiplies by the mix; the mask is the parametrized part)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def crop_center(h1, h2):
    if h1.size(3) == h2.size(3):
        return h1
    s = (h1.size(3) - h2.size(3)) // 2
    return h1[:, :, :, s:s + h2.size(3)]


class Conv2DBNActiv(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1,
                 activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nout, ksize, stride, pad, dilation, bias=False),
            nn.BatchNorm2d(nout), activ())

    def forward(self, x):
        return self.conv(x)


class SeperableConv2DBNActiv(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1,
                 activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nin, ksize, stride, pad, dilation, groups=nin,
                      bias=False),
            nn.Conv2d(nin, nout, 1, bias=False),
            nn.BatchNorm2d(nout), activ())

    def forward(self, x):
        return self.conv(x)


# --------------------------------------------------------- old (nets.py)

class EncoderOld(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1,
                 activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = Conv2DBNActiv(nin, nout, ksize, 1, pad, activ=activ)
        self.conv2 = Conv2DBNActiv(nout, nout, ksize, stride, pad,
                                   activ=activ)

    def forward(self, x):
        skip = self.conv1(x)
        h = self.conv2(skip)
        return h, skip


class DecoderOld(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU,
                 dropout=False):
        super().__init__()
        self.conv = Conv2DBNActiv(nin, nout, ksize, 1, pad, activ=activ)
        self.dropout = nn.Dropout2d(0.1) if dropout else None

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        if skip is not None:
            skip = crop_center(skip, x)
            x = torch.cat([x, skip], dim=1)
        h = self.conv(x)
        if self.dropout is not None:
            h = self.dropout(h)
        return h


class ASPPModuleOld(nn.Module):
    def __init__(self, nin, nout, dilations=(4, 8, 16)):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, None)),
            Conv2DBNActiv(nin, nin, 1, 1, 0))
        self.conv2 = Conv2DBNActiv(nin, nin, 1, 1, 0)
        self.conv3 = SeperableConv2DBNActiv(nin, nin, 3, 1, dilations[0],
                                            dilations[0])
        self.conv4 = SeperableConv2DBNActiv(nin, nin, 3, 1, dilations[1],
                                            dilations[1])
        self.conv5 = SeperableConv2DBNActiv(nin, nin, 3, 1, dilations[2],
                                            dilations[2])
        self.bottleneck = nn.Sequential(
            Conv2DBNActiv(nin * 5, nout, 1, 1, 0), nn.Dropout2d(0.1))

    def forward(self, x):
        _, _, h, w = x.size()
        feat1 = F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                              align_corners=True)
        out = torch.cat((feat1, self.conv2(x), self.conv3(x), self.conv4(x),
                         self.conv5(x)), dim=1)
        return self.bottleneck(out)


class BaseASPPNet(nn.Module):
    def __init__(self, nin, ch, dilations=(4, 8, 16)):
        super().__init__()
        self.enc1 = EncoderOld(nin, ch, 3, 2, 1)
        self.enc2 = EncoderOld(ch, ch * 2, 3, 2, 1)
        self.enc3 = EncoderOld(ch * 2, ch * 4, 3, 2, 1)
        self.enc4 = EncoderOld(ch * 4, ch * 8, 3, 2, 1)
        self.aspp = ASPPModuleOld(ch * 8, ch * 16, dilations)
        self.dec4 = DecoderOld(ch * (8 + 16), ch * 8, 3, 1, 1)
        self.dec3 = DecoderOld(ch * (4 + 8), ch * 4, 3, 1, 1)
        self.dec2 = DecoderOld(ch * (2 + 4), ch * 2, 3, 1, 1)
        self.dec1 = DecoderOld(ch * (1 + 2), ch, 3, 1, 1)

    def forward(self, x):
        h, e1 = self.enc1(x)
        h, e2 = self.enc2(h)
        h, e3 = self.enc3(h)
        h, e4 = self.enc4(h)
        h = self.aspp(h)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        h = self.dec1(h, e1)
        return h


class CascadedASPPNet(nn.Module):
    def __init__(self, n_fft, ch=32, dilations=(4, 8, 16)):
        super().__init__()
        self.stg1_low_band_net = BaseASPPNet(2, ch, dilations)
        self.stg1_high_band_net = BaseASPPNet(2, ch, dilations)
        self.stg2_bridge = Conv2DBNActiv(2 + ch, ch // 2, 1, 1, 0)
        self.stg2_full_band_net = BaseASPPNet(ch // 2, ch, dilations)
        self.stg3_bridge = Conv2DBNActiv(2 + 2 * ch, ch, 1, 1, 0)
        self.stg3_full_band_net = BaseASPPNet(ch, ch * 2, dilations)
        self.out = nn.Conv2d(ch * 2, 2, 1, bias=False)
        self.aux1_out = nn.Conv2d(ch, 2, 1, bias=False)
        self.aux2_out = nn.Conv2d(ch, 2, 1, bias=False)
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1

    def forward(self, x):
        x = x[:, :, :self.max_bin]
        bandw = x.size(2) // 2
        aux1 = torch.cat([
            self.stg1_low_band_net(x[:, :, :bandw]),
            self.stg1_high_band_net(x[:, :, bandw:])], dim=2)
        h = torch.cat([x, aux1], dim=1)
        aux2 = self.stg2_full_band_net(self.stg2_bridge(h))
        h = torch.cat([x, aux1, aux2], dim=1)
        h = self.stg3_full_band_net(self.stg3_bridge(h))
        mask = torch.sigmoid(self.out(h))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.size(2)),
                     mode="replicate")


# ---------------------------------------------------- new (nets_new.py)

class EncoderNew(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1,
                 activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = Conv2DBNActiv(nin, nout, ksize, stride, pad,
                                   activ=activ)
        self.conv2 = Conv2DBNActiv(nout, nout, ksize, 1, pad, activ=activ)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class DecoderNew(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU,
                 dropout=False):
        super().__init__()
        self.conv1 = Conv2DBNActiv(nin, nout, ksize, 1, pad, activ=activ)
        self.dropout = nn.Dropout2d(0.1) if dropout else None

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        if skip is not None:
            skip = crop_center(skip, x)
            x = torch.cat([x, skip], dim=1)
        h = self.conv1(x)
        if self.dropout is not None:
            h = self.dropout(h)
        return h


class ASPPModuleNew(nn.Module):
    def __init__(self, nin, nout, dilations=((4, 2), (8, 4), (12, 6)),
                 dropout=False):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, None)),
            Conv2DBNActiv(nin, nout, 1, 1, 0))
        self.conv2 = Conv2DBNActiv(nin, nout, 1, 1, 0)
        self.conv3 = Conv2DBNActiv(nin, nout, 3, 1, dilations[0],
                                   dilations[0])
        self.conv4 = Conv2DBNActiv(nin, nout, 3, 1, dilations[1],
                                   dilations[1])
        self.conv5 = Conv2DBNActiv(nin, nout, 3, 1, dilations[2],
                                   dilations[2])
        self.bottleneck = nn.Conv2d(nout * 5, nout, 1, bias=False)
        self.dropout = nn.Dropout2d(0.1) if dropout else None

    def forward(self, x):
        _, _, h, w = x.size()
        feat1 = F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                              align_corners=True)
        out = self.bottleneck(torch.cat(
            (feat1, self.conv2(x), self.conv3(x), self.conv4(x),
             self.conv5(x)), dim=1))
        if self.dropout is not None:
            out = self.dropout(out)
        return out


class LSTMModule(nn.Module):
    def __init__(self, nin_conv, nin_lstm, nout_lstm):
        super().__init__()
        self.conv = Conv2DBNActiv(nin_conv, 1, 1, 1, 0)
        self.lstm = nn.LSTM(input_size=nin_lstm,
                            hidden_size=nout_lstm // 2, bidirectional=True)
        self.dense = nn.Sequential(
            nn.Linear(nout_lstm, nin_lstm), nn.BatchNorm1d(nin_lstm),
            nn.ReLU())

    def forward(self, x):
        N, _, nbins, nframes = x.size()
        h = self.conv(x)[:, 0]
        h = h.permute(2, 0, 1)
        h, _ = self.lstm(h)
        h = self.dense(h.reshape(-1, h.size(-1)))
        h = h.reshape(nframes, N, 1, nbins)
        return h.permute(1, 2, 3, 0)


class BaseNet(nn.Module):
    def __init__(self, nin, nout, nin_lstm, nout_lstm,
                 dilations=((4, 2), (8, 4), (12, 6))):
        super().__init__()
        self.enc1 = Conv2DBNActiv(nin, nout, 3, 1, 1)
        self.enc2 = EncoderNew(nout, nout * 2, 3, 2, 1)
        self.enc3 = EncoderNew(nout * 2, nout * 4, 3, 2, 1)
        self.enc4 = EncoderNew(nout * 4, nout * 6, 3, 2, 1)
        self.enc5 = EncoderNew(nout * 6, nout * 8, 3, 2, 1)
        self.aspp = ASPPModuleNew(nout * 8, nout * 8, dilations,
                                  dropout=True)
        self.dec4 = DecoderNew(nout * (6 + 8), nout * 6, 3, 1, 1)
        self.dec3 = DecoderNew(nout * (4 + 6), nout * 4, 3, 1, 1)
        self.dec2 = DecoderNew(nout * (2 + 4), nout * 2, 3, 1, 1)
        self.lstm_dec2 = LSTMModule(nout * 2, nin_lstm, nout_lstm)
        self.dec1 = DecoderNew(nout * (1 + 2) + 1, nout * 1, 3, 1, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        e4 = self.enc4(e3)
        e5 = self.enc5(e4)
        h = self.aspp(e5)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        h = torch.cat([h, self.lstm_dec2(h)], dim=1)
        h = self.dec1(h, e1)
        return h


class CascadedNet(nn.Module):
    def __init__(self, n_fft, nout=32, nout_lstm=128):
        super().__init__()
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.nin_lstm = self.max_bin // 2
        self.stg1_low_band_net = nn.Sequential(
            BaseNet(2, nout // 2, self.nin_lstm // 2, nout_lstm),
            Conv2DBNActiv(nout // 2, nout // 4, 1, 1, 0))
        self.stg1_high_band_net = BaseNet(2, nout // 4,
                                          self.nin_lstm // 2, nout_lstm // 2)
        self.stg2_low_band_net = nn.Sequential(
            BaseNet(nout // 4 + 2, nout, self.nin_lstm // 2, nout_lstm),
            Conv2DBNActiv(nout, nout // 2, 1, 1, 0))
        self.stg2_high_band_net = BaseNet(nout // 4 + 2, nout // 2,
                                          self.nin_lstm // 2, nout_lstm // 2)
        self.stg3_full_band_net = BaseNet(3 * nout // 4 + 2, nout,
                                          self.nin_lstm, nout_lstm)
        self.out = nn.Conv2d(nout, 2, 1, bias=False)
        self.aux_out = nn.Conv2d(3 * nout // 4, 2, 1, bias=False)

    def forward(self, x):
        x = x[:, :, :self.max_bin]
        bandw = x.size(2) // 2
        l1_in = x[:, :, :bandw]
        h1_in = x[:, :, bandw:]
        l1 = self.stg1_low_band_net(l1_in)
        h1 = self.stg1_high_band_net(h1_in)
        aux1 = torch.cat([l1, h1], dim=2)
        l2_in = torch.cat([l1_in, l1], dim=1)
        h2_in = torch.cat([h1_in, h1], dim=1)
        l2 = self.stg2_low_band_net(l2_in)
        h2 = self.stg2_high_band_net(h2_in)
        aux2 = torch.cat([l2, h2], dim=2)
        f3_in = torch.cat([x, aux1, aux2], dim=1)
        f3 = self.stg3_full_band_net(f3_in)
        mask = torch.sigmoid(self.out(f3))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.size(2)),
                     mode="replicate")
