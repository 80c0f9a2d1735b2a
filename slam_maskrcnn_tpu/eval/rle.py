"""COCO-compatible RLE mask codec: native C++ core + numpy fallback.

Replaces the reference's vendored pycocotools native extension
(``Mask_RCNN/pycocotools/_mask.pyx`` + maskApi, SURVEY §2.4(7)) with a
clean-room implementation. Format: runs over the mask flattened
column-major (Fortran order), alternating zero/one runs, first run zeros —
identical to the COCO ``counts`` convention, including the compressed
string form used in COCO JSON.

The C++ core (native/rle.cpp) is compiled on first use with g++ and loaded
via ctypes; a pure-numpy path covers environments without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "rle.cpp")
    try:
        # Build into a cache dir keyed by a hash of the source, so the
        # binary that runs is always the one compiled from the reviewed
        # source (never a stale or committed .so — mtime comparison fails
        # on fresh clones where git stamps both files at checkout time).
        import hashlib
        import tempfile

        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), "slam_maskrcnn_tpu_rle")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"librle-{digest}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                           check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_merge.restype = ctypes.c_int64
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_iou_pair.restype = ctypes.c_double
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _u32(a):
    return np.ascontiguousarray(a, np.uint32)


def rle_encode(mask: np.ndarray) -> dict:
    """Encode [H, W] binary mask -> {'size': [H, W], 'counts': uint32[...]}"""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    lib = _native()
    if lib is not None:
        out = np.empty(flat.size + 2, np.uint32)
        n = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(flat.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(out.size))
        counts = out[:n].copy()
    else:
        # numpy fallback: run-length via diff of change points
        changes = np.nonzero(np.diff(flat))[0] + 1
        bounds = np.concatenate([[0], changes, [flat.size]])
        runs = np.diff(bounds)
        if flat.size and flat[0] == 1:
            runs = np.concatenate([[0], runs])
        counts = runs.astype(np.uint32)
    return {"size": [h, w], "counts": counts}


def rle_decode(rle: dict) -> np.ndarray:
    """Decode -> [H, W] uint8 mask."""
    h, w = rle["size"]
    counts = _u32(rle["counts"])
    lib = _native()
    flat = np.zeros(h * w, np.uint8)
    if lib is not None:
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(counts.size),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(flat.size))
    else:
        vals = np.arange(counts.size) % 2
        runs = np.repeat(vals.astype(np.uint8), counts)[:h * w]
        # zero-pad short/malformed RLEs (np.resize would TILE the runs);
        # matches the native path, which leaves the tail zero-filled
        flat[:runs.size] = runs
    return flat.reshape((h, w), order="F")


def rle_area(rle: dict) -> int:
    counts = _u32(rle["counts"])
    lib = _native()
    if lib is not None:
        return int(lib.rle_area(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(counts.size)))
    return int(counts[1::2].sum())


def rle_merge(rles: list[dict], intersect: bool = False) -> dict:
    """Union/intersection of RLEs (maskUtils.merge semantics)."""
    assert rles, "empty merge"
    lib = _native()
    acc = _u32(rles[0]["counts"])
    size = rles[0]["size"]
    for r in rles[1:]:
        b = _u32(r["counts"])
        if lib is not None:
            out = np.empty(acc.size + b.size + 2, np.uint32)
            n = lib.rle_merge(
                acc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_int64(acc.size),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_int64(b.size),
                ctypes.c_int(1 if intersect else 0),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_int64(out.size))
            acc = out[:n].copy()
        else:
            m1 = rle_decode({"size": size, "counts": acc})
            m2 = rle_decode(r)
            m = (m1 & m2) if intersect else (m1 | m2)
            acc = _u32(rle_encode(m)["counts"])
    return {"size": size, "counts": acc}


def rle_iou(dets: list[dict], gts: list[dict],
            iscrowd: list[bool] | None = None) -> np.ndarray:
    """Pairwise IoU [len(dets), len(gts)] (maskUtils.iou semantics, incl.
    crowd denominator = det area)."""
    iscrowd = iscrowd or [False] * len(gts)
    lib = _native()
    out = np.zeros((len(dets), len(gts)))
    for i, d in enumerate(dets):
        dc = _u32(d["counts"])
        for j, g in enumerate(gts):
            gc = _u32(g["counts"])
            if lib is not None:
                out[i, j] = lib.rle_iou_pair(
                    dc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    ctypes.c_int64(dc.size),
                    gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    ctypes.c_int64(gc.size),
                    ctypes.c_int(1 if iscrowd[j] else 0))
            else:
                m1 = rle_decode(d).astype(bool)
                m2 = rle_decode(g).astype(bool)
                inter = (m1 & m2).sum()
                denom = m1.sum() if iscrowd[j] else (m1 | m2).sum()
                out[i, j] = inter / denom if denom else 0.0
    return out


def rle_to_bbox(rle: dict) -> np.ndarray:
    """RLE -> [x, y, w, h] bbox (maskUtils.toBbox / maskApi rleToBbox
    semantics, ``Mask_RCNN/pycocotools/mask.py:36``): computed from the
    runs directly, column-major. A one-run spanning multiple columns
    forces the y extent to the full height, as upstream."""
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int64)
    ones = counts[1::2]
    if h == 0 or w == 0 or ones.size == 0 or ones.sum() == 0:
        return np.zeros(4, np.float64)
    ends = np.cumsum(counts)
    start = ends[0::2][:ones.size][ones > 0]      # first index of each run
    stop = ends[1::2][:ones.size][ones > 0] - 1   # last index (inclusive)
    sc, ec = start // h, stop // h
    sr, er = start % h, stop % h
    xs, xe = int(sc.min()), int(ec.max())
    if (sc != ec).any():
        ys, ye = 0, h - 1
    else:
        ys, ye = int(sr.min()), int(er.max())
    return np.array([xs, ys, xe - xs + 1, ye - ys + 1], np.float64)


def fr_py_objects(pyobj, h: int, w: int):
    """Polygon(s) / uncompressed RLE(s) / bbox(es) -> RLE dict(s) with
    native uint32 counts (maskUtils.frPyObjects dispatch,
    ``Mask_RCNN/pycocotools/mask.py:37``, ``_mask.pyx:245-308``). Lists
    return a list of RLEs; a single dict / flat polygon / 4-vector
    returns one RLE. Polygons rasterize via the same fill convention as
    ``samples/coco.ann_to_mask`` (cv2.fillPoly)."""
    def one_poly(poly):
        import cv2

        mask = np.zeros((h, w), np.uint8)
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        return rle_encode(mask)

    def one_bbox(bb):
        x, y, bw, bh = [float(v) for v in bb]
        mask = np.zeros((h, w), np.uint8)
        y0, y1 = int(round(y)), int(round(y + bh))
        x0, x1 = int(round(x)), int(round(x + bw))
        mask[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = 1
        return rle_encode(mask)

    def one_uncompressed(d):
        counts = d["counts"]
        if isinstance(counts, str):
            counts = string_to_counts(counts)
        return {"size": list(d["size"]),
                "counts": np.asarray(counts, np.uint32)}

    if isinstance(pyobj, np.ndarray):
        return [one_bbox(b) for b in pyobj.reshape(-1, 4)]
    if isinstance(pyobj, dict):
        return one_uncompressed(pyobj)
    if isinstance(pyobj, (list, tuple)) and pyobj:
        first = pyobj[0]
        if isinstance(first, dict):
            return [one_uncompressed(d) for d in pyobj]
        if isinstance(first, (list, tuple, np.ndarray)):
            if len(first) == 4:
                return [one_bbox(b) for b in pyobj]
            return [one_poly(p) for p in pyobj]
        # flat list of numbers: one bbox or one polygon
        if len(pyobj) == 4:
            return one_bbox(pyobj)
        return one_poly(pyobj)
    raise TypeError("unsupported object for fr_py_objects")


def counts_to_string(counts: np.ndarray) -> str:
    """Compress counts to the COCO JSON LEB128-style string."""
    s = []
    prev = 0
    for i, c in enumerate(np.asarray(counts, np.int64)):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c5 = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c5 & 0x10))
                        or (x == -1 and (c5 & 0x10)))
            if more:
                c5 |= 0x20
            s.append(chr(c5 + 48))
        prev = c
    return "".join(s)


def string_to_counts(s: str) -> np.ndarray:
    """Decompress the COCO JSON counts string."""
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += int(counts[-2])
        counts.append(x)
    return np.asarray(counts, np.uint32)


def mask_to_rle_string(mask: np.ndarray) -> dict:
    """[H, W] mask -> {'size', 'counts': str} as in COCO JSON results."""
    r = rle_encode(mask)
    return {"size": r["size"], "counts": counts_to_string(r["counts"])}
