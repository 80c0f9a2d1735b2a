"""PatchMatch stereo with slanted planes and adaptive bilateral weights.

= the reference's ``PatchMatch``/``mloss`` (``src/utils.py:188-334``),
full-fidelity:

* per-pixel SLANTED PLANE in depth space, ``z(x, y) = a x + b y + c``
  (utils.py:230-239: random depth z0 in [dmin, dmax] + random hemisphere
  normal); disparity sampled per window pixel as ``d = B f / z`` with the
  CENTER pixel's plane evaluated at the WINDOW pixel's coordinates
  (utils.py:199-201) and an integer column shift (utils.py:203, np.int
  truncation);
* ADAPTIVE BILATERAL WEIGHTS ``w = exp(-|I1(q) - I1(p)|_1 / gamma)``
  (utils.py:211) over a 5x5 window, cost ``rho = (1-alpha) |I1(q) -
  I2(q-d)|_1 + alpha |lap1(q) - lap2(q-d)|`` (utils.py:213-214, Laplacian
  gradients per utils.py:224-227, alpha=0 gamma=1 defaults), normalized by
  the FULL window size with a 1000-per-invalid-pixel penalty
  (utils.py:215);
* forward (up/left) then backward (down/right) propagation sweeps
  (utils.py:247-283) and c-only binary random refinement with halving
  radius down to 0.1 (utils.py:308-321).

Vectorized re-implementation: candidate plane fields are evaluated densely
(25 shifted-array ops per cost call) and propagation uses shifted candidate
fields per sweep direction — the same candidate set as the reference's
in-place raster sweeps, converging over iterations rather than within one
sweep (the only structural difference; documented, tested on ground-truth
slanted scenes).
"""

from __future__ import annotations

import math

import numpy as np


def _gray(img):
    img = np.asarray(img, np.float32)
    return img if img.ndim == 2 else img.mean(-1)


def _laplacian(gray):
    """cv2.Laplacian CV_32F equivalent (3x3 kernel [[0,1,0],[1,-4,1],[0,1,0]]
    with BORDER_REFLECT_101)."""
    p = np.pad(gray, 1, mode="reflect")
    return (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
            - 4.0 * gray)


class PatchMatch:
    """API kept from round 1 (left, right, max_disp, ...) with the
    reference's plane/weight model underneath; ``B*f`` is folded so that
    depth == disparity (B=f=z-scale=1 in disparity units)."""

    def __init__(self, left, right, patch=5, max_disp=48, gamma=10.0,
                 alpha=0.0, min_disp=0.5, bf=None, seed=0):
        self.left = np.asarray(left, np.float32)
        self.right = np.asarray(right, np.float32)
        self.color_l = (self.left if self.left.ndim == 3
                        else self.left[..., None])
        self.color_r = (self.right if self.right.ndim == 3
                        else self.right[..., None])
        self.patch = patch
        self.gamma = gamma
        self.alpha = alpha
        self.max_disp = float(max_disp)
        self.min_disp = float(min_disp)
        # B*f: with bf = max_disp * zmin the depth range [zmin, zmax] maps
        # to the disparity range; default folds depth==B*f/disp directly
        self.bf = float(bf) if bf is not None else 1.0
        self.zmin = self.bf / self.max_disp
        self.zmax = self.bf / self.min_disp
        self.rng = np.random.default_rng(seed)

        H, W = self.left.shape[:2]
        self.xv, self.yv = np.meshgrid(np.arange(W, dtype=np.float32),
                                       np.arange(H, dtype=np.float32))
        # random slanted-plane init (utils.py:230-239)
        z0 = self.zmin + self.rng.random((H, W)) * (self.zmax - self.zmin)
        r1 = self.rng.random((H, W))
        r2 = self.rng.random((H, W))
        nx = np.cos(2 * math.pi * r2) * np.sqrt(1 - r1 * r1)
        ny = np.sin(2 * math.pi * r2) * np.sqrt(1 - r1 * r1)
        nz = np.maximum(r1, 1e-3)
        a = -nx / nz
        b = -ny / nz
        c = (nx * self.xv + ny * self.yv) / nz + z0
        self.fp = np.stack([a, b, c], -1).astype(np.float32)

        self.lap_l = _laplacian(_gray(self.left))
        self.lap_r = _laplacian(_gray(self.right))

    # -- cost ------------------------------------------------------------
    def _cost(self, fp):
        """Dense mloss (utils.py:188-218): bilateral-weighted truncated-
        free color+Laplacian cost of a plane field, 5x5 window, invalid
        samples penalized 1000 each, normalized by the full window size."""
        H, W = self.lap_l.shape
        k = self.patch
        r = k // 2
        wsum = np.zeros((H, W), np.float32)
        acc = np.zeros((H, W), np.float32)
        invalid = np.zeros((H, W), np.float32)
        a, b, c = fp[..., 0], fp[..., 1], fp[..., 2]
        cols = np.arange(W)
        center = self.color_l
        n_win = float(k * k)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                # window pixel q = p + (dy, dx); values at q via shifts
                ys = np.clip(self.yv + dy, 0, H - 1).astype(int)
                xs = np.clip(self.xv + dx, 0, W - 1).astype(int)
                in_img = ((self.yv + dy >= 0) & (self.yv + dy < H)
                          & (self.xv + dx >= 0) & (self.xv + dx < W))
                zq = a * (self.xv + dx) + b * (self.yv + dy) + c
                zq = np.where(np.abs(zq) < 1e-6, 1e-6, zq)
                d = self.bf / zq
                x2 = xs - d.astype(np.int64)     # np.int truncation
                ok = in_img & (x2 >= 0) & (x2 < W)
                x2c = np.clip(x2, 0, W - 1)
                i1q = self.color_l[ys, xs]
                i2q = self.color_r[ys, x2c]
                w = np.exp(-np.abs(i1q - center).sum(-1) / self.gamma)
                rho = ((1 - self.alpha) * np.abs(i1q - i2q).sum(-1)
                       + self.alpha * np.abs(self.lap_l[ys, xs]
                                             - self.lap_r[ys, x2c]))
                acc += np.where(ok, w * rho, 0.0)
                wsum += np.where(ok, w, 0.0)
                invalid += (~ok).astype(np.float32)
        # reference: loss = w.rho / N_window + 1000 * n_invalid
        return acc / n_win + 1000.0 * invalid

    def _improve(self, fp_cand):
        new_cost = self._cost(fp_cand)
        # reject planes whose center depth leaves the valid range (the
        # reference is implicitly bounded by its init range + restore)
        zc = (fp_cand[..., 0] * self.xv + fp_cand[..., 1] * self.yv
              + fp_cand[..., 2])
        ok = (zc >= 0.5 * self.zmin) & (zc <= 2.0 * self.zmax)
        better = (new_cost < self.cost) & ok
        self.fp = np.where(better[..., None], fp_cand, self.fp)
        self.cost = np.where(better, new_cost, self.cost)

    @property
    def depth(self):
        z = (self.fp[..., 0] * self.xv + self.fp[..., 1] * self.yv
             + self.fp[..., 2])
        return z.astype(np.float32)

    @property
    def disp(self):
        return (self.bf / np.maximum(self.depth, 1e-6)).astype(np.float32)

    def run(self, iters=5):
        self.cost = self._cost(self.fp)
        for it in range(iters):
            # the reference's raster sweeps cross the whole image in one
            # pass; the vectorized analog propagates with exponentially
            # growing shifts (jump flooding) so information travels just as
            # far per iteration
            for step in (1, 2, 4, 8):
                # forward sweep candidates: up, left (utils.py:247-268)
                for shift in ((step, 0), (0, step)):
                    self._improve(np.roll(self.fp, shift, axis=(0, 1)))
                # backward sweep: down, right (utils.py:269-283)
                for shift in ((-step, 0), (0, -step)):
                    self._improve(np.roll(self.fp, shift, axis=(0, 1)))
            # c-only binary random refinement (utils.py:308-321)
            dz = (self.zmax - self.zmin) / 2.0
            while dz > 0.1 * (self.zmax - self.zmin) / self.max_disp:
                jit = ((self.rng.random(self.cost.shape) * 2 - 1)
                       * dz).astype(np.float32)
                cand = self.fp.copy()
                cand[..., 2] += jit
                self._improve(cand)
                dz /= 2.0
        return self.disp
