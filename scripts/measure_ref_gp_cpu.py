#!/usr/bin/env python
"""Measures the reference-equivalent config E baseline on torch CPU.

BASELINE.json config E: dklGPR with exact covariance + Cholesky on 10k
patch embeddings. The reference's gpytorch is not installed in this
container (only an import shim), so — mirroring how config A was measured
with import shims — this script times a DOCUMENTED torch-CPU equivalent of
the reference training cycle (`/root/reference/atomai/trainers/
gptrainer.py:126-137`): per cycle, forward the MLP feature extractor
(`/root/reference/atomai/nets/gp.py:14-26` topology: indim-1000-500-50-
embedim), scale embeddings to bounds, build the exact RBF-ARD kernel
matrix, evaluate the exact marginal log-likelihood via Cholesky
(gpytorch's ExactMarginalLogLikelihood semantics, mean-reduced), backprop
through everything, Adam step. Same N=10000, indim=64, embedim=2, float32
as bench.py's config E.

Run:  python scripts/measure_ref_gp_cpu.py [n_cycles]
"""

import sys
import time

import numpy as np
import torch

N, INDIM, EMBEDIM = 10000, 64, 2


def main(cycles=3):
    torch.manual_seed(0)
    # pin the documented protocol (the recorded 122.65 s/cycle ran on a
    # 1-core container where torch defaulted to 1 thread; pinning makes
    # the number reproducible on many-core hosts too)
    torch.set_num_threads(1)
    rng = np.random.RandomState(0)
    X = torch.from_numpy(rng.randn(N, INDIM).astype(np.float32))
    y = torch.from_numpy(
        (rng.randn(N, INDIM)[:, 0] + 0.1 * rng.randn(N)).astype(
            np.float32))

    fe = torch.nn.Sequential(
        torch.nn.Linear(INDIM, 1000), torch.nn.ReLU(),
        torch.nn.Linear(1000, 500), torch.nn.ReLU(),
        torch.nn.Linear(500, 50), torch.nn.ReLU(),
        torch.nn.Linear(50, EMBEDIM))
    raw_ls = torch.nn.Parameter(torch.zeros(EMBEDIM))
    raw_os = torch.nn.Parameter(torch.zeros(()))
    raw_noise = torch.nn.Parameter(torch.zeros(()))
    mean_const = torch.nn.Parameter(torch.zeros(()))
    opt = torch.optim.Adam(
        list(fe.parameters()) + [raw_ls, raw_os, raw_noise, mean_const],
        lr=0.01)

    def mll_loss():
        z = fe(X)
        zmin, zmax = z.min(0).values, z.max(0).values
        z = 2 * (z - zmin) / (zmax - zmin + 1e-12) - 1  # ScaleToBounds
        ls = torch.nn.functional.softplus(raw_ls)
        d = ((z[:, None, :] - z[None, :, :]) / ls).pow(2).sum(-1)
        K = torch.nn.functional.softplus(raw_os) * torch.exp(-0.5 * d)
        K = K + (torch.nn.functional.softplus(raw_noise) + 1e-4 + 1e-5) \
            * torch.eye(N)
        L = torch.linalg.cholesky(K)
        resid = (y - mean_const).unsqueeze(-1)
        alpha = torch.cholesky_solve(resid, L)
        mll = (-0.5 * (resid * alpha).sum()
               - torch.log(torch.diagonal(L)).sum()
               - 0.5 * N * np.log(2 * np.pi))
        return -mll / N  # ExactMarginalLogLikelihood is mean-reduced

    # one warmup cycle (allocator warm; torch has no compile phase)
    t_all = []
    for c in range(cycles + 1):
        t0 = time.time()
        opt.zero_grad()
        loss = mll_loss()
        loss.backward()
        opt.step()
        dt = time.time() - t0
        if c > 0:
            t_all.append(dt)
        print(f"cycle {c}: {dt:.2f} s loss={loss.item():.4f}", flush=True)
    print(f"\nREF_DKLGP_SEC_PER_CYCLE = {np.mean(t_all):.3f}  "
          f"(mean of {len(t_all)} cycles, torch CPU, "
          f"{torch.get_num_threads()} threads)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
