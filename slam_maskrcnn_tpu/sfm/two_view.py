"""Two-view structure-from-motion experiment.

= the reference's experimental ``slam()`` path (``src/main.py:104-203``,
``src/utils.py:39-185``): SIFT+FLANN ratio-test matching, essential-matrix
RANSAC, RT disambiguation by positive-depth voting over nonlinearly
triangulated points (Gauss-Newton refinement with analytic Jacobian,
utils.py:78-105), then rectification + disparity. Host-side OpenCV/numpy,
as the reference (this path never touched CUDA).
"""

from __future__ import annotations

import numpy as np


def match_features(img1, img2, ratio=0.75, max_matches=500):
    """SIFT (ORB fallback) + ratio-test matching (utils.py:151-185).
    Returns (pts1 [N,2], pts2 [N,2])."""
    import cv2

    try:
        det = cv2.SIFT_create()
        norm = cv2.NORM_L2
    except Exception:
        det = cv2.ORB_create(2000)
        norm = cv2.NORM_HAMMING
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY) if img1.ndim == 3 else img1
    g2 = cv2.cvtColor(img2, cv2.COLOR_BGR2GRAY) if img2.ndim == 3 else img2
    k1, d1 = det.detectAndCompute(g1, None)
    k2, d2 = det.detectAndCompute(g2, None)
    if d1 is None or d2 is None:
        return np.zeros((0, 2)), np.zeros((0, 2))
    matcher = cv2.BFMatcher(norm)
    raw = matcher.knnMatch(d1, d2, k=2)
    good = [m for m, n in raw if m.distance < ratio * n.distance]
    good = sorted(good, key=lambda m: m.distance)[:max_matches]
    pts1 = np.float64([k1[m.queryIdx].pt for m in good])
    pts2 = np.float64([k2[m.trainIdx].pt for m in good])
    return pts1, pts2


def triangulate(P1, P2, pts1, pts2, gn_iters=5):
    """DLT triangulation + Gauss-Newton reprojection refinement
    (utils.py:39-105). Returns [N, 3] world points."""
    N = len(pts1)
    X = np.zeros((N, 3))
    for i in range(N):
        A = np.stack([
            pts1[i, 0] * P1[2] - P1[0],
            pts1[i, 1] * P1[2] - P1[1],
            pts2[i, 0] * P2[2] - P2[0],
            pts2[i, 1] * P2[2] - P2[1],
        ])
        _, _, vt = np.linalg.svd(A)
        Xh = vt[-1]
        x = Xh[:3] / Xh[3]
        # Gauss-Newton on reprojection error with analytic Jacobian
        for _ in range(gn_iters):
            r = []
            J = []
            for P, pt in ((P1, pts1[i]), (P2, pts2[i])):
                p = P @ np.append(x, 1.0)
                if abs(p[2]) < 1e-12:
                    break
                u, v = p[0] / p[2], p[1] / p[2]
                r.extend([u - pt[0], v - pt[1]])
                J.append((P[0, :3] - u * P[2, :3]) / p[2])
                J.append((P[1, :3] - v * P[2, :3]) / p[2])
            else:
                J = np.stack(J)
                r = np.asarray(r)
                try:
                    dx = np.linalg.solve(J.T @ J + 1e-9 * np.eye(3),
                                         -J.T @ r)
                except np.linalg.LinAlgError:
                    break
                x = x + dx
                continue
            break
        X[i] = x
    return X


def estimate_rt_from_e(E, pts1, pts2, K):
    """Disambiguate the 4 (R, t) decompositions of E by positive-depth
    voting over triangulated points (utils.py:118-148)."""
    import cv2

    R1, R2, t = cv2.decomposeEssentialMat(E)
    K3 = np.asarray(K, np.float64)[:3, :3]
    n1 = (np.linalg.inv(K3) @ np.column_stack(
        [pts1, np.ones(len(pts1))]).T).T[:, :2]
    n2 = (np.linalg.inv(K3) @ np.column_stack(
        [pts2, np.ones(len(pts2))]).T).T[:, :2]
    best = None
    best_votes = -1
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    for R in (R1, R2):
        for tt in (t, -t):
            P2 = np.hstack([R, tt.reshape(3, 1)])
            X = triangulate(P1, P2, n1, n2, gn_iters=0)
            z1 = X[:, 2]
            z2 = (R @ X.T + tt.reshape(3, 1))[2]
            votes = int(((z1 > 0) & (z2 > 0)).sum())
            if votes > best_votes:
                best_votes = votes
                best = (R, tt.reshape(3))
    return best[0], best[1], best_votes


def slam_two_view(img1, img2, K, depth_estimate=True):
    """The slam() pipeline (src/main.py:104-203): match, essential matrix
    RANSAC, RT recovery, triangulation; optional SGBM disparity after
    uncalibrated rectification. Returns a result dict."""
    import cv2

    pts1, pts2 = match_features(img1, img2)
    if len(pts1) < 8:
        raise ValueError(f"too few matches: {len(pts1)}")
    K3 = np.asarray(K, np.float64)[:3, :3]
    E, inliers = cv2.findEssentialMat(pts1, pts2, K3, method=cv2.RANSAC,
                                      prob=0.999, threshold=1.0)
    sel = inliers.ravel() > 0
    pts1, pts2 = pts1[sel], pts2[sel]
    R, t, votes = estimate_rt_from_e(E, pts1, pts2, K3)
    n1 = (np.linalg.inv(K3) @ np.column_stack(
        [pts1, np.ones(len(pts1))]).T).T[:, :2]
    n2 = (np.linalg.inv(K3) @ np.column_stack(
        [pts2, np.ones(len(pts2))]).T).T[:, :2]
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.hstack([R, t.reshape(3, 1)])
    X = triangulate(P1, P2, n1, n2)
    out = dict(R=R, t=t, points=X, matches=(pts1, pts2),
               positive_depth_votes=votes)
    if depth_estimate:
        g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY) if img1.ndim == 3 else img1
        g2 = cv2.cvtColor(img2, cv2.COLOR_BGR2GRAY) if img2.ndim == 3 else img2
        F = np.linalg.inv(K3).T @ E @ np.linalg.inv(K3)
        ok, H1, H2 = cv2.stereoRectifyUncalibrated(
            pts1, pts2, F, g1.shape[::-1])
        if ok:
            r1 = cv2.warpPerspective(g1, H1, g1.shape[::-1])
            r2 = cv2.warpPerspective(g2, H2, g2.shape[::-1])
            sgbm = cv2.StereoSGBM_create(minDisparity=0, numDisparities=64,
                                         blockSize=9)
            out["disparity"] = sgbm.compute(r1, r2).astype(np.float32) / 16.0
    return out
