"""Per-round TPU parity gate (VERDICT r1 "next" #3; production configs r2 #5).

Runs the SAME inputs through (a) the CPU jnp graph — exact top-k
proposals, XLA-oracle fusion, interpret-mode Pallas — and (b) the
production TPU graph — ``approx_max_k`` proposals, compiled Mosaic
fuse/NMS/ROIAlign kernels, splat probe — and records their agreement.
This is the check CI cannot do (tests/conftest.py forces CPU, where
Pallas runs in interpret mode): a Mosaic-vs-interpret divergence or an
approx-top-k regression shows up here as a changed artifact.

Gate sections (each a Mosaic-sensitive production path — CLAUDE.md's
"CPU interpret does NOT catch these" list):

  fusion          default config (u16 hist, default rects, per-call)
  fusion_u8       u8 histogram mode (i8 vector ops are absent on the
                  v5e VPU; the kernel computes in i32 and casts on store)
  fusion_cascade  the 512^3 bench cascade rects (48,256)/(128,384) +
                  near_block_budget 512, at a memory-feasible 128^3
  fusion_scan     fuse_sequence_blocked — the lax.scan chunk dispatch
  render          splat orbit render (instance + color): pixel-exact
                  fraction TPU vs CPU at two angles
  detect          per-image detection count delta, matched fraction at
                  IoU 0.9, score MAD (CPU exact top-k vs TPU approx —
                  the quantified platform-conditional semantics of
                  models/proposal.py:36)

Phase 1 spawns a CPU subprocess that writes golden outputs to a scratch
dir; phase 2 (this process, on the TPU) reruns and compares. Output: one
JSON file (default PARITY.json at the repo root).

Usage: python tools/parity_gate.py [--out PARITY.json] [--vol 64]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_SCRIPT = r"""
import sys, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
out_dir = {out_dir!r}
import jax.numpy as jnp
from parity_common import (FUSION_VARIANTS, run_fusion_variant, run_scan,
                           run_render, run_detect)

for name in FUSION_VARIANTS:
    state_arrays, masks = run_fusion_variant(name, {vol})
    np.savez(out_dir + f"/fusion_{{name}}_cpu.npz", **state_arrays,
             masks=masks)
    print("cpu golden:", name, flush=True)

np.savez(out_dir + "/scan_cpu.npz", **run_scan({vol}))
print("cpu golden: scan", flush=True)

np.savez(out_dir + "/render_cpu.npz", **run_render({vol}))
print("cpu golden: render", flush=True)

dets = run_detect(out_dir)
np.savez(out_dir + "/detect_cpu.npz", **dets)
print("cpu golden written", flush=True)
"""


def write_common(out_dir: str, vol: int):
    with open(os.path.join(out_dir, "parity_common.py"), "w") as f:
        f.write(r'''
import os
import numpy as np
import jax
import jax.numpy as jnp

H, W = 240, 320

# name -> FusionConfig overrides (vol_dim/hist_dtype resolved in-builder).
# "cascade" runs the 512^3 bench kernel shape — three-tier rect cascade +
# near-block budget — at a memory-feasible 128^3.
FUSION_VARIANTS = {
    "default": dict(),
    "u8": dict(hist_dtype="uint8"),
    "cascade": dict(vol=128, pallas_rect=(48, 256),
                    pallas_rect_mid=(128, 384), near_block_budget=512),
    # the sparse main pass (dense-XLA free update + compacted visible
    # pass) at the 512^3 bench kernel shape — see FusionConfig.pallas_sparse
    "sparse": dict(vol=128, pallas_sparse=True, pallas_rect=(48, 256),
                   pallas_rect_mid=(128, 384), near_block_budget=512),
    # the compacted STREAMED grid (index_map-prefetched run list +
    # aliasing-elided identity runs — Mosaic-only semantics CPU interpret
    # cannot vouch for) at the 512^3 bench kernel shape — see
    # FusionConfig.pallas_compact
    "compact": dict(vol=128, pallas_compact=True, pallas_rect=(48, 256),
                    pallas_rect_mid=(128, 384), near_block_budget=512),
}


def build_fusion_inputs(vol, **over):
    from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    K4 = make_intrinsic(260.0, 260.0, 160.0, 120.0)
    vol = over.pop("vol", vol)
    hist_dtype = getattr(jnp, over.pop("hist_dtype", "uint16"))
    cfg = FusionConfig(vol_dim=(vol,) * 3, hist_dtype=hist_dtype, **over)
    frames = make_sequence(default_scene(), K4, H, W, n_frames=5)
    return K4, cfg, frames


def run_fusion_variant(name, vol):
    """The production path: pallas backend (compiled on TPU, interpret on
    CPU) through the public SemanticFusion driver."""
    from slam_maskrcnn_tpu.fusion import SemanticFusion

    over = dict(FUSION_VARIANTS[name])
    vol = over.pop("vol", vol)
    K4, cfg, frames = build_fusion_inputs(vol, **over)
    f = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    masks = []
    for fr in frames:
        mg = f.parse_frame(fr["depth"], fr["color"], fr["mask"],
                           fr["extrinsic"], fr["mean_depth"])
        if mg is not None:
            masks.append(np.asarray(mg))
    st = f.state
    return (dict(diff=np.asarray(st.diff), colorpk=np.asarray(st.colorpk),
                 weight=np.asarray(st.weight), hist=np.asarray(st.hist),
                 misses=np.asarray(f.last_misses)),
            np.stack(masks))


def run_scan(vol):
    """fuse_sequence_blocked — the chunked lax.scan dispatch the 256^3
    bench headline runs (fusion/pipeline.py). Global-id masks precomputed
    so the scan sees the same inputs on both platforms."""
    from slam_maskrcnn_tpu.fusion.pipeline import fuse_sequence_blocked
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        init_blocked_from_first_frame)

    K4, cfg, frames = build_fusion_inputs(vol)
    state = init_blocked_from_first_frame(cfg, frames[0]["depth"], K4,
                                          frames[0]["mean_depth"])
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    depths = jnp.stack([jnp.asarray(fr["depth"]) for fr in frames[1:]])
    colors = jnp.stack([jnp.asarray(fr["color"]) for fr in frames[1:]])
    masks = jnp.stack([jnp.asarray(fr["mask"]) for fr in frames[1:]])
    es = jnp.stack([jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32))
                    for fr in frames[1:]])
    state, masks_g, misses = fuse_sequence_blocked(state, depths, colors,
                                                   masks, es,
                                                   jnp.asarray(K4), cfg)
    return dict(diff=np.asarray(state.diff),
                colorpk=np.asarray(state.colorpk),
                weight=np.asarray(state.weight),
                hist=np.asarray(state.hist),
                masks=np.asarray(masks_g),
                misses=np.asarray(misses).reshape(-1))


def run_render(vol):
    """Splat orbit render images (the production viewer path) from the
    default variant's fused state: instance + color at two angles."""
    from slam_maskrcnn_tpu.fusion import SemanticFusion
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit

    K4, cfg, frames = build_fusion_inputs(vol)
    f = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    for fr in frames:
        f.parse_frame(fr["depth"], fr["color"], fr["mask"],
                      fr["extrinsic"], fr["mean_depth"])
    Kj = jnp.asarray(K4)
    out = {}
    for mode in ("instance", "color"):
        for angle in (0.1, 0.6):
            img = splat_render_orbit(f.state, angle, f.mean_depth, Kj,
                                     H, W, cfg, mode=mode)
            out[f"{mode}_{angle}"] = np.asarray(img)
    return out


TRAINED = "/root/repo/weights/shapes_r2_f16.h5"


def build_model(seed=0):
    """Prefer the committed TRAINED shapes checkpoint: parity on a model
    that actually detects is meaningful; a random-init network is a
    chaotic function of platform rounding and its garbage detections
    barely match across CPU/TPU."""
    if os.path.exists(TRAINED):
        from slam_maskrcnn_tpu.models import MaskRCNN
        from slam_maskrcnn_tpu.samples.train_shapes import (
            InferenceShapesConfig)

        model = MaskRCNN("inference", InferenceShapesConfig())
        model.init_params(seed)
        model.load_weights(TRAINED, by_name=True)
        return model, True

    from slam_maskrcnn_tpu.models import Config, MaskRCNN

    class ParityConfig(Config):
        NAME = "parity"
        BACKBONE = "resnet50"
        NUM_CLASSES = 4
        IMAGES_PER_GPU = 1
        GPU_COUNT = 1
        IMAGE_MIN_DIM = 256
        IMAGE_MAX_DIM = 256
        RPN_ANCHOR_SCALES = (16, 32, 64, 128, 256)
        POST_NMS_ROIS_INFERENCE = 200
        PRE_NMS_LIMIT = 1000
        DETECTION_MAX_INSTANCES = 20
        DETECTION_MIN_CONFIDENCE = 0.0

    model = MaskRCNN("inference", ParityConfig())
    model.init_params(seed)
    return model, False


def build_detect_scenes():
    """The 20 deterministic parity scenes WITH ground truth: three sizes
    x several seeds (shape count/scale/crowding vary per seed), plus
    anisotropically stretched variants whose elongated detections
    (aspect > 4) exercise the Pallas ROIAlign clamp path. Returns
    (images, gts) with gts = [(gt_boxes, gt_class_ids, gt_masks), ...];
    deterministic, so the compare step can rebuild GT without goldens."""
    import cv2

    from slam_maskrcnn_tpu.data.dataset import extract_bboxes
    from slam_maskrcnn_tpu.data.shapes import ShapesDataset

    images, gts = [], []
    for size, n, seed in ((128, 6, 9), (96, 5, 21), (192, 5, 31)):
        ds = ShapesDataset()
        ds.load_shapes(n, size, size, seed=seed)
        ds.prepare()
        for i in ds.image_ids:
            images.append(ds.load_image(i))
            m, cls = ds.load_mask(i)
            gts.append((extract_bboxes(m), cls, m))
    ds = ShapesDataset()
    ds.load_shapes(4, 128, 128, seed=77)
    ds.prepare()
    for i in ds.image_ids:
        img = ds.load_image(i)
        images.append(cv2.resize(img, (384, 64),
                                 interpolation=cv2.INTER_LINEAR))
        m, cls = ds.load_mask(i)
        ms = np.stack([cv2.resize(m[..., k].astype(np.uint8), (384, 64),
                                  interpolation=cv2.INTER_NEAREST)
                       for k in range(m.shape[-1])], -1).astype(bool)
        gts.append((extract_bboxes(ms), cls, ms))
    return images, gts


def run_detect(scratch):
    """Detect the deterministic scenes. With the trained checkpoint both
    platforms load the same file; otherwise params round-trip through the
    scratch dir so both processes run identical random weights."""
    from slam_maskrcnn_tpu.models.import_h5 import (load_h5_weights,
                                                    save_h5_weights)

    model, trained = build_model()
    if not trained:
        wpath = os.path.join(scratch, "parity_weights.h5")
        if os.path.exists(wpath):
            model.params = load_h5_weights(wpath, model.params)
        else:
            save_h5_weights(wpath, model.params)
    out = {"trained": np.array([trained])}
    if trained:
        # >= 20 varied scenes (VERDICT r3 weak #6)
        images, _gts = build_detect_scenes()
    else:
        rng = np.random.RandomState(7)
        images = []
        for i in range(2):
            img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
            img[60:120, 60:140] = (220, 40, 40)
            img[150:220, 100:180] = (40, 220, 40)
            images.append(img)
    out["n_images"] = np.array([len(images)])
    for i, img in enumerate(images):
        r = model.detect([img], verbose=0)[0]
        out[f"rois{i}"] = r["rois"].astype(np.float32)
        out[f"class_ids{i}"] = r["class_ids"].astype(np.int32)
        out[f"scores{i}"] = r["scores"].astype(np.float32)
        out[f"masks{i}"] = np.asarray(r["masks"]).astype(bool)
    return out
''')


def match_detections(rois_a, cls_a, sc_a, rois_b, cls_b, sc_b, iou_thr=0.9):
    """Greedy IoU matching; returns (matched, score MAD, pair list)."""
    if len(rois_a) == 0 or len(rois_b) == 0:
        return 0, 0.0, []
    used = set()
    matched, mads, pairs = 0, [], []
    for i in range(len(rois_a)):
        best, best_iou = -1, iou_thr
        for j in range(len(rois_b)):
            if j in used or cls_a[i] != cls_b[j]:
                continue
            ya1, xa1, ya2, xa2 = rois_a[i]
            yb1, xb1, yb2, xb2 = rois_b[j]
            iy = max(0, min(ya2, yb2) - max(ya1, yb1))
            ix = max(0, min(xa2, xb2) - max(xa1, xb1))
            inter = iy * ix
            union = ((ya2 - ya1) * (xa2 - xa1)
                     + (yb2 - yb1) * (xb2 - xb1) - inter)
            iou = inter / union if union > 0 else 0.0
            if iou > best_iou:
                best, best_iou = j, iou
        if best >= 0:
            used.add(best)
            matched += 1
            mads.append(abs(float(sc_a[i]) - float(sc_b[best])))
            pairs.append((i, best))
    return matched, float(np.mean(mads)) if mads else 0.0, pairs


def compare_state(cpu_npz, tpu_state, tpu_masks=None):
    rep = {
        "diff_max_delta": float(np.abs(tpu_state["diff"]
                                       - cpu_npz["diff"]).max()),
        "colorpk_max_delta": float(np.abs(tpu_state["colorpk"]
                                          - cpu_npz["colorpk"]).max()),
        "weight_equal": bool((tpu_state["weight"]
                              == cpu_npz["weight"]).all()),
        "hist_equal": bool((tpu_state["hist"] == cpu_npz["hist"]).all()),
        "misses": int(np.asarray(tpu_state["misses"]).sum()),
    }
    if tpu_masks is not None:
        rep["masks_equal"] = bool((tpu_masks == cpu_npz["masks"]).all())
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.json"))
    ap.add_argument("--vol", type=int, default=64)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--scratch", default=None,
                    help="reuse this scratch dir; with existing CPU "
                         "goldens inside, phase 1 is skipped (lets the "
                         "slow CPU phase run ahead of TPU availability)")
    ap.add_argument("--phase", choices=("both", "cpu"), default="both",
                    help="'cpu' = write the goldens and stop")
    args = ap.parse_args()

    scratch = args.scratch or tempfile.mkdtemp(prefix="parity_")
    os.makedirs(scratch, exist_ok=True)
    write_common(scratch, args.vol)

    have_goldens = os.path.exists(os.path.join(scratch, "detect_cpu.npz"))
    if have_goldens and args.scratch:
        print("[parity] phase 1: reusing existing CPU goldens", flush=True)
    else:
        # phase 1: CPU golden (subprocess so platform selection is clean)
        env = dict(os.environ)
        env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + REPO
                             + os.pathsep + scratch)
        print("[parity] phase 1: CPU golden...", flush=True)
        subprocess.run([sys.executable, "-c",
                        CPU_SCRIPT.format(repo=REPO, out_dir=scratch,
                                          vol=args.vol)],
                       env=env, check=True)
    if args.phase == "cpu":
        print(f"[parity] CPU goldens in {scratch}; rerun with "
              f"--scratch {scratch} when the TPU is back", flush=True)
        return

    # phase 2: TPU run (this process)
    sys.path.insert(0, scratch)
    sys.path.insert(0, REPO)
    import jax

    # persistent compile cache (same dir as bench.py): phase-2 reruns
    # otherwise re-pay every remote compile — and survive remote-compile
    # helper flakiness once warm
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    platform = jax.default_backend()
    print(f"[parity] phase 2: platform={platform}", flush=True)
    from parity_common import (FUSION_VARIANTS, run_detect,
                               run_fusion_variant, run_render, run_scan)

    report = {"platform": platform, "vol": args.vol}

    for name in FUSION_VARIANTS:
        cpu_f = np.load(os.path.join(scratch, f"fusion_{name}_cpu.npz"))
        tpu_state, tpu_masks = run_fusion_variant(name, args.vol)
        key = "fusion" if name == "default" else f"fusion_{name}"
        report[key] = compare_state(cpu_f, tpu_state, tpu_masks)
        print(f"[parity] {key}: {report[key]}", flush=True)

    cpu_s = np.load(os.path.join(scratch, "scan_cpu.npz"))
    report["fusion_scan"] = compare_state(cpu_s, run_scan(args.vol))
    print(f"[parity] fusion_scan: {report['fusion_scan']}", flush=True)

    cpu_r = np.load(os.path.join(scratch, "render_cpu.npz"))
    tpu_r = run_render(args.vol)
    rend = {}
    for k, tpu_img in tpu_r.items():
        cpu_img = cpu_r[k]
        exact = float((tpu_img == cpu_img).all(-1).mean())
        cov = float(((tpu_img.sum(-1) > 0)
                     == (cpu_img.sum(-1) > 0)).mean())
        rend[k] = {"exact_pixel_fraction": round(exact, 5),
                   "coverage_agreement": round(cov, 5)}
    report["render"] = rend
    print(f"[parity] render: {rend}", flush=True)

    cpu_d = np.load(os.path.join(scratch, "detect_cpu.npz"))
    tpu_d = run_detect(scratch)
    n_images = int(np.asarray(cpu_d["n_images"])[0])
    per_img = []
    mask_ious, mads_all = [], []
    tot_cpu = tot_matched = tot_matched_strict = 0
    unmatched_scores = []
    for i in range(n_images):
        n_cpu = len(cpu_d[f"scores{i}"])
        n_tpu = len(tpu_d[f"scores{i}"])
        args_i = (cpu_d[f"rois{i}"], cpu_d[f"class_ids{i}"],
                  cpu_d[f"scores{i}"], tpu_d[f"rois{i}"],
                  np.asarray(tpu_d[f"class_ids{i}"]),
                  np.asarray(tpu_d[f"scores{i}"]))
        # primary match at IoU 0.5 (the COCO/compute_matches convention,
        # eval/metrics.py) — bf16-trunk box regression shifts the same
        # detection a few pixels, which a 0.9 bar miscounts as a miss;
        # 0.9 kept as the strict secondary
        matched, mad, pairs = match_detections(*args_i, iou_thr=0.5)
        matched_strict, _, _ = match_detections(*args_i, iou_thr=0.9)
        mc = cpu_d[f"masks{i}"]
        mt = np.asarray(tpu_d[f"masks{i}"])
        for a, b in pairs:
            inter = np.logical_and(mc[..., a], mt[..., b]).sum()
            union = np.logical_or(mc[..., a], mt[..., b]).sum()
            # empty vs empty (degenerate sliver boxes in the stretched
            # scenes unmold to no pixels on BOTH platforms) = agreement
            mask_ious.append(float(inter) / float(union)
                             if union > 0 else 1.0)
        mads_all.append(mad)
        tot_cpu += n_cpu
        tot_matched += matched
        tot_matched_strict += matched_strict
        sc = np.asarray(cpu_d[f"scores{i}"], np.float32)
        matched_a = {a for a, _b in pairs}
        unmatched_scores += [float(sc[a]) for a in range(n_cpu)
                             if a not in matched_a]
        per_img.append({"n_cpu": n_cpu, "n_tpu": n_tpu,
                        "matched": matched,
                        "match_frac": matched / max(n_cpu, 1),
                        "score_mad": round(mad, 5)})

    # platform-quality parity: both detection sets scored against the
    # deterministic shapes GROUND TRUTH (the production-relevant
    # statement — individual borderline boxes may flip under
    # approx_max_k/bf16 while detector quality is preserved)
    map_cpu = map_tpu = None
    if bool(np.asarray(tpu_d.get("trained", [False]))[0]):
        from parity_common import build_detect_scenes
        from slam_maskrcnn_tpu.eval.metrics import compute_ap
        _imgs, gts = build_detect_scenes()
        aps_c, aps_t = [], []
        for i, (gb, gc, gm) in enumerate(gts):
            ap_c, _, _, _ = compute_ap(
                gb, gc, gm, cpu_d[f"rois{i}"], cpu_d[f"class_ids{i}"],
                cpu_d[f"scores{i}"], cpu_d[f"masks{i}"])
            ap_t, _, _, _ = compute_ap(
                gb, gc, gm, np.asarray(tpu_d[f"rois{i}"]),
                np.asarray(tpu_d[f"class_ids{i}"]),
                np.asarray(tpu_d[f"scores{i}"]),
                np.asarray(tpu_d[f"masks{i}"]))
            aps_c.append(ap_c)
            aps_t.append(ap_t)
        map_cpu = round(float(np.mean(aps_c)), 4)
        map_tpu = round(float(np.mean(aps_t)), 4)

        # rect-molding quality row: the north-star production config
        # molds with IMAGE_RESIZE_MODE="rect" (models/config.py) — fewer
        # dead padding rows, a different anchor grid. Same trained
        # weights (heads are resolution-independent); quality must stay
        # within a few mAP points of the square mold.
        from parity_common import TRAINED
        from slam_maskrcnn_tpu.models import MaskRCNN
        from slam_maskrcnn_tpu.samples.train_shapes import (
            InferenceShapesConfig)

        class RectShapes(InferenceShapesConfig):
            IMAGE_RESIZE_MODE = "rect"
            IMAGE_RECT_SHAPE = (128, 192)

        model_r = MaskRCNN("inference", RectShapes())
        model_r.init_params(0)
        model_r.load_weights(TRAINED, by_name=True)
        imgs_r, _ = build_detect_scenes()
        aps_r = []
        for img, (gb, gc, gm) in zip(imgs_r, gts):
            r = model_r.detect([img])[0]
            ap_r, _, _, _ = compute_ap(
                gb, gc, gm, r["rois"].astype(np.float32),
                r["class_ids"], r["scores"], np.asarray(r["masks"]))
            aps_r.append(ap_r)
        map_rect = round(float(np.mean(aps_r)), 4)

        # f32-trunk option (VERDICT r4 #7): the same weights with
        # COMPUTE_DTYPE="float32" on the TPU — quantifies how much of
        # the CPU/TPU detect gap is the bf16 trunk (and what closing it
        # buys: box match vs the CPU goldens + quality mAP vs GT; the
        # speed cost is measured at the bench shape, PERFORMANCE.md r5)
        class F32Shapes(InferenceShapesConfig):
            COMPUTE_DTYPE = "float32"

        model_f = MaskRCNN("inference", F32Shapes())
        model_f.init_params(0)
        model_f.load_weights(TRAINED, by_name=True)
        aps_f = []
        tot_matched_f = tot_matched_f90 = 0
        for i, (img, (gb, gc, gm)) in enumerate(zip(imgs_r, gts)):
            r = model_f.detect([img])[0]
            margs = (cpu_d[f"rois{i}"], cpu_d[f"class_ids{i}"],
                     cpu_d[f"scores{i}"], r["rois"].astype(np.float32),
                     np.asarray(r["class_ids"]), np.asarray(r["scores"]))
            m_f, _, _ = match_detections(*margs, iou_thr=0.5)
            m_f90, _, _ = match_detections(*margs, iou_thr=0.9)
            tot_matched_f += m_f
            tot_matched_f90 += m_f90
            ap_f, _, _, _ = compute_ap(
                gb, gc, gm, r["rois"].astype(np.float32), r["class_ids"],
                np.asarray(r["scores"]), np.asarray(r["masks"]))
            aps_f.append(ap_f)
        map_f32 = round(float(np.mean(aps_f)), 4)
        box_match_f32 = round(tot_matched_f / max(tot_cpu, 1), 4)
        box_match_f32_90 = round(tot_matched_f90 / max(tot_cpu, 1), 4)
    else:
        map_rect = None
        map_f32 = box_match_f32 = box_match_f32_90 = None
    mi = np.asarray(mask_ious) if mask_ious else np.zeros((0,))
    report["detect"] = {
        "n_images": n_images,
        "n_cpu_total": tot_cpu,
        "matched_total": tot_matched,
        "box_match_frac": round(tot_matched / max(tot_cpu, 1), 4),
        "box_match_frac_iou90": round(tot_matched_strict / max(tot_cpu, 1),
                                      4),
        "map50_vs_gt_cpu": map_cpu,
        "map50_vs_gt_tpu": map_tpu,
        "map50_vs_gt_tpu_rect": map_rect,
        "map50_vs_gt_tpu_f32": map_f32,
        "box_match_frac_f32": box_match_f32,
        "box_match_frac_f32_iou90": box_match_f32_90,
        "score_mad_max": round(max(mads_all) if mads_all else 0.0, 5),
        "unmatched_cpu_scores": [round(s, 3)
                                 for s in sorted(unmatched_scores,
                                                 reverse=True)],
        "mask_iou_median": (round(float(np.median(mi)), 4)
                            if mi.size else None),
        "mask_iou_p10": (round(float(np.percentile(mi, 10)), 4)
                         if mi.size else None),
        "mask_iou_min": (round(float(mi.min()), 4) if mi.size else None),
        "per_image": per_img,
    }
    report["detect_trained_weights"] = bool(np.asarray(
        tpu_d.get("trained", [False]))[0])

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not args.keep:
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
