#!/usr/bin/env python
"""One-time CPU reference anchor for bench.py's ``vs_baseline``.

The reference (Keras percivaltts) publishes no throughput numbers and its
mount was empty (SURVEY.md §0, BASELINE.md), so the recorded baseline is a
faithful CPU re-implementation of the same training step in **torch eager**
(framework-on-CPU, the reference's hardware class and execution style; torch
is baked into this image): CNN+BLSTM generator → conv critic → WGAN-GP with
n_critic critic updates incl. gradient penalty + generator update with LSE
mixing, f32, same layer shapes as the headline config.

Run:  python scripts/cpu_reference_bench.py [B] [T]
Prints frames/sec = B·T·(n_critic+1)/step_time (scale-invariant in B·T on
CPU to first order).
"""

import sys
import time

import torch
import torch.nn as nn

L, SPEC, NM = 425, 65, 33
F = 1 + SPEC + NM
NC = 5
HID, CH, BLOCKS, BL = 256, 32, 4, 64


class Gen(nn.Module):
    """Same architecture family/sizes as percivaltts_tpu's CNNGenerator with
    BLSTM f0 head (ModelConfig defaults)."""

    def __init__(self):
        super().__init__()
        self.trunk = nn.Sequential(
            nn.Linear(L, HID), nn.Tanh(), nn.Linear(HID, HID), nn.Tanh()
        )
        self.f0_rnn = nn.LSTM(HID, BL, batch_first=True, bidirectional=True)
        self.f0_out = nn.Linear(2 * BL, 1)
        self.spec_seed = nn.Linear(HID, SPEC * 2)
        self.spec_in = nn.Conv2d(2, CH, 5, padding=2)
        self.blocks = nn.ModuleList(
            nn.Sequential(
                nn.GELU(), nn.Conv2d(CH, CH, 5, padding=2),
                nn.GELU(), nn.Conv2d(CH, CH, 5, padding=2),
            )
            for _ in range(BLOCKS)
        )
        self.spec_out = nn.Conv2d(CH, 1, 5, padding=2)
        self.nm_head = nn.Sequential(nn.Linear(HID, HID // 2), nn.Tanh(), nn.Linear(HID // 2, NM))

    def forward(self, lab):
        x = self.trunk(lab)
        f0 = self.f0_out(self.f0_rnn(x)[0])
        img = torch.tanh(self.spec_seed(x))
        B, T, _ = img.shape
        img = img.view(B, T, SPEC, 2).permute(0, 3, 1, 2)
        img = self.spec_in(img)
        for blk in self.blocks:
            img = img + blk(img)
        spec = self.spec_out(img)[:, 0].permute(0, 1, 2)
        nm = self.nm_head(x)
        return torch.cat([f0, spec, nm], dim=-1)


class Critic(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [CH * min(2 ** (i // 2 + 1), 8) for i in range(4)]
        convs, prev = [], 1
        for i, c in enumerate(chans):
            stride = 2 if i % 2 == 0 else 1
            convs += [nn.GELU(), nn.Conv2d(prev, c, 5, stride=stride, padding=2)]
            prev = c
        self.convs = nn.Sequential(nn.Conv2d(1, 1, 5, padding=2), *convs)
        self.cond = nn.Sequential(nn.Linear(L, HID // 2), nn.GELU())
        self.rest = nn.Sequential(nn.Linear(1 + NM, HID // 2), nn.GELU(), nn.Linear(HID // 2, HID // 2))
        self.merge = nn.Sequential(
            nn.Linear(prev + HID, HID), nn.GELU(), nn.Linear(HID, HID), nn.GELU(), nn.Linear(HID, 1)
        )

    def forward(self, cmp, lab):
        spec = cmp[..., 1 : 1 + SPEC].unsqueeze(1)
        h = self.convs(spec).mean(dim=3).permute(0, 2, 1)  # (B, T', C)
        Tp = h.shape[1]
        B, T, _ = lab.shape
        stride = T // Tp
        c = self.cond(lab)[:, : Tp * stride].view(B, Tp, stride, -1).mean(2)
        r = self.rest(torch.cat([cmp[..., :1], cmp[..., 1 + SPEC :]], -1))
        r = r[:, : Tp * stride].view(B, Tp, stride, -1).mean(2)
        s = self.merge(torch.cat([h, c, r], dim=-1))[..., 0]
        return s.mean(dim=1)


def main():
    torch.manual_seed(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    gen, critic = Gen(), Critic()
    og = torch.optim.Adam(gen.parameters(), 1e-4, betas=(0.5, 0.9))
    oc = torch.optim.Adam(critic.parameters(), 1e-4, betas=(0.5, 0.9))

    def step():
        for _ in range(NC):
            lab = torch.randn(B, T, L)
            real = torch.randn(B, T, F)
            fake = gen(lab).detach()
            eps = torch.rand(B, 1, 1)
            interp = (eps * real + (1 - eps) * fake).requires_grad_(True)
            d_i = critic(interp, lab).sum()
            g = torch.autograd.grad(d_i, interp, create_graph=True)[0]
            gp = ((g.flatten(1).norm(dim=1) - 1) ** 2).mean()
            loss_c = critic(fake, lab).mean() - critic(real, lab).mean() + 10.0 * gp
            oc.zero_grad(); loss_c.backward(); oc.step()
        lab = torch.randn(B, T, L)
        real = torch.randn(B, T, F)
        fake = gen(lab)
        loss_g = -critic(fake, lab).mean() + 0.25 * ((fake - real) ** 2).mean()
        og.zero_grad(); loss_g.backward(); og.step()
        return float(loss_g)

    step()  # warmup
    t0 = time.perf_counter()
    n = 2
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / n
    fps = B * T * (NC + 1) / dt
    print(f"torch CPU reference: {dt:.2f} s/step, {fps:,.1f} frames/s "
          f"(B={B}, T={T}, n_critic={NC}, f32, threads={torch.get_num_threads()})")


if __name__ == "__main__":
    main()
