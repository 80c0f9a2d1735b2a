"""Samples / auxiliary module tests: COCO dataset parsing, RLE kaggle,
color splash, tracker helpers, SfM two-view geometry, PatchMatch,
visualization, dataset audit."""

import json
import os

import numpy as np
import pytest

from slam_maskrcnn_tpu.samples.balloon import color_splash
from slam_maskrcnn_tpu.samples.coco import (CocoDataset, ann_to_mask)
from slam_maskrcnn_tpu.samples.dataset_audit import audit
from slam_maskrcnn_tpu.samples.mask_image import (calc_overlap_ratio,
                                                  depth_filter_median,
                                                  union_mask_roi)
from slam_maskrcnn_tpu.samples.nucleus import (mask_to_rle, rle_decode_kaggle,
                                               rle_encode_kaggle)
from slam_maskrcnn_tpu.sfm import PatchMatch, slam_two_view, triangulate
from slam_maskrcnn_tpu.viz import display_instances, random_colors


def test_coco_dataset_from_json(tmp_path):
    # minimal COCO JSON with one polygon annotation
    img_dir = tmp_path / "train2014"
    img_dir.mkdir()
    import cv2

    cv2.imwrite(str(img_dir / "img1.png"),
                np.zeros((40, 60, 3), np.uint8))
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    coco = {
        "images": [{"id": 1, "file_name": "img1.png", "width": 60,
                    "height": 40}],
        "categories": [{"id": 7, "name": "truck"}],
        "annotations": [{
            "id": 10, "image_id": 1, "category_id": 7, "iscrowd": 0,
            "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
            "area": 400, "bbox": [10, 10, 20, 20]}],
    }
    (ann_dir / "instances_train2014.json").write_text(json.dumps(coco))
    ds = CocoDataset()
    ds.load_coco(str(tmp_path), "train", "2014")
    ds.prepare()
    assert ds.num_images == 1
    masks, ids = ds.load_mask(0)
    assert masks.shape == (40, 60, 1)
    assert masks[20, 20, 0] and not masks[5, 5, 0]
    assert ds.class_names[ids[0]] == "truck"


def test_coco_annotation_api(tmp_path):
    """The pycocotools COCO surface (eval/coco_api.py): index, filtered id
    queries, loadRes derivation, annToMask."""
    from slam_maskrcnn_tpu.eval.coco_api import COCO

    data = {
        "info": {"year": 2014},
        "images": [{"id": 1, "file_name": "a.png", "width": 20, "height": 10},
                   {"id": 2, "file_name": "b.png", "width": 20, "height": 10}],
        "categories": [
            {"id": 3, "name": "cat", "supercategory": "animal"},
            {"id": 9, "name": "car", "supercategory": "vehicle"}],
        "annotations": [
            {"id": 100, "image_id": 1, "category_id": 3, "iscrowd": 0,
             "segmentation": [[2, 2, 8, 2, 8, 6, 2, 6]], "area": 24,
             "bbox": [2, 2, 6, 4]},
            {"id": 101, "image_id": 2, "category_id": 9, "iscrowd": 1,
             "segmentation": [[0, 0, 5, 0, 5, 5, 0, 5]], "area": 400,
             "bbox": [0, 0, 5, 5]}],
    }
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(data))
    coco = COCO(str(path))
    assert sorted(coco.getCatIds()) == [3, 9]
    assert coco.getCatIds(catNms=["car"]) == [9]
    assert coco.getCatIds(supNms=["animal"]) == [3]
    assert coco.getImgIds(catIds=[3]) == [1]
    assert sorted(coco.getImgIds()) == [1, 2]
    assert coco.getAnnIds(imgIds=[1]) == [100]
    assert coco.getAnnIds(iscrowd=1) == [101]
    assert coco.getAnnIds(areaRng=[0, 100]) == [100]
    assert coco.loadAnns([100])[0]["category_id"] == 3
    assert coco.loadImgs([2])[0]["file_name"] == "b.png"
    m = coco.annToMask(coco.loadAnns([100])[0])
    assert m.shape == (10, 20) and m[4, 5] and not m[9, 19]
    rle = coco.annToRLE(coco.loadAnns([100])[0])
    assert rle["size"] == [10, 20]
    # results path: bbox-only detections gain area/segmentation/ids
    res = coco.loadRes([{"image_id": 1, "category_id": 3,
                         "bbox": [1.0, 1.0, 4.0, 4.0], "score": 0.9}])
    (ann,) = res.loadAnns(res.getAnnIds(imgIds=[1]))
    assert ann["area"] == 16.0 and ann["iscrowd"] == 0
    assert len(res.dataset["images"]) == 2
    arr = np.array([[2, 1, 1, 3, 3, 0.5, 9]])
    assert coco.loadNumpyAnnotations(arr)[0]["image_id"] == 2


def test_ann_to_mask_rle_dict():
    from slam_maskrcnn_tpu.eval.rle import rle_encode
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:7] = 1
    r = rle_encode(m)
    ann = {"segmentation": {"size": r["size"],
                            "counts": [int(c) for c in r["counts"]]}}
    back = ann_to_mask(ann, 10, 12)
    np.testing.assert_array_equal(back, m.astype(bool))


def test_kaggle_rle_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.random((17, 23)) < 0.4
    s = rle_encode_kaggle(m)
    back = rle_decode_kaggle(s, m.shape)
    np.testing.assert_array_equal(back, m)
    multi = np.stack([m, ~m], -1)
    txt = mask_to_rle("img", multi, np.array([0.9, 0.5]))
    assert txt.count("img") == 2


def test_color_splash():
    img = np.full((8, 8, 3), 200, np.uint8)
    mask = np.zeros((8, 8, 1), bool)
    mask[2:4, 2:4, 0] = True
    out = color_splash(img, mask)
    assert (out[2, 2] == img[2, 2]).all()      # colored inside mask
    assert out[0, 0, 0] == out[0, 0, 1] == out[0, 0, 2]  # gray outside


def test_tracker_helpers():
    b1 = np.array([0, 0, 10, 10])
    assert calc_overlap_ratio(b1, b1) == 1.0
    assert calc_overlap_ratio(b1, np.array([20, 20, 30, 30])) == 0.0
    depth = np.full((10, 10), 1000, np.uint16)
    depth[0, 0] = 60000
    mask = np.ones((10, 10), bool)
    out = depth_filter_median(depth, mask)
    assert not out[0, 0] and out[5, 5]
    d = dict(box=b1, mask=np.ones((4, 4), bool))
    m = dict(box=b1 + 1, mask=np.zeros((4, 4), bool))
    u = union_mask_roi(d, m)
    assert u["mask"].all()


def test_triangulate_exact():
    # known 3D points, two cameras -> triangulation recovers them
    rng = np.random.default_rng(1)
    X = rng.uniform([-1, -1, 4], [1, 1, 6], (12, 3))
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    R = np.eye(3)
    t = np.array([[-0.5], [0.0], [0.0]])
    P2 = np.hstack([R, t])
    p1 = (P1 @ np.column_stack([X, np.ones(12)]).T).T
    p2 = (P2 @ np.column_stack([X, np.ones(12)]).T).T
    p1 = p1[:, :2] / p1[:, 2:3]
    p2 = p2[:, :2] / p2[:, 2:3]
    Xr = triangulate(P1, P2, p1, p2)
    np.testing.assert_allclose(Xr, X, atol=1e-6)


def test_slam_two_view_synthetic():
    import cv2

    rng = np.random.default_rng(2)
    # textured plane viewed from two poses
    tex = (rng.random((200, 260)) * 255).astype(np.uint8)
    tex = cv2.GaussianBlur(tex, (5, 5), 1.0)
    img1 = tex
    M = np.float32([[1, 0, 12], [0, 1, 0]])
    img2 = cv2.warpAffine(tex, M, (260, 200))
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 200.0
    K[0, 2], K[1, 2] = 130, 100
    try:
        out = slam_two_view(img1, img2, K, depth_estimate=False)
    except ValueError:
        pytest.skip("not enough features on synthetic texture")
    assert out["points"].shape[1] == 3
    assert out["positive_depth_votes"] > 0


def test_patchmatch_recovers_constant_shift():
    rng = np.random.default_rng(3)
    right = (rng.random((40, 80)) * 255).astype(np.float32)
    import cv2

    right = cv2.GaussianBlur(right, (5, 5), 1.2)
    true_d = 6
    left = np.roll(right, true_d, axis=1)
    pm = PatchMatch(left, right, patch=7, max_disp=16, seed=0)
    disp = pm.run(iters=4)
    inner = disp[10:-10, 20:-10]
    assert abs(np.median(inner) - true_d) < 1.5


def test_display_instances_headless():
    img = np.zeros((32, 32, 3), np.uint8)
    boxes = np.array([[4, 4, 20, 20]], np.float32)
    masks = np.zeros((32, 32, 1), bool)
    masks[6:18, 6:18, 0] = True
    out = display_instances(img, boxes, masks, np.array([1]),
                            ["BG", "thing"], np.array([0.9]), show=False)
    assert out.shape == (32, 32, 3)
    assert out.max() > 0
    assert len(random_colors(5)) == 5


def test_dataset_audit(tmp_path):
    for stream in ("rgb", "depth"):
        d = tmp_path / stream
        d.mkdir()
        for ts in ("1311871923.0043", "1311871923.5", "1311871924.1"):
            (d / f"{ts}.png").write_bytes(b"x")
    r = audit(str(tmp_path))
    assert r["rgb"]["total"] == 3
    assert r["rgb"]["per_second"][1311871923] == 2


def test_live_pipeline_synthetic():
    """Full stage1+stage2 streaming: random-weight model (detections are
    junk, pipeline mechanics are what's tested)."""
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.models import Config, MaskRCNN
    from slam_maskrcnn_tpu.samples.live_pipeline import LivePipeline

    class SmallCfg(Config):
        NAME = "live_test"
        BACKBONE = "resnet50"
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        NUM_CLASSES = 4
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        POST_NMS_ROIS_INFERENCE = 20
        PRE_NMS_LIMIT = 50
        DETECTION_MAX_INSTANCES = 5
        IMAGES_PER_GPU = 1
        GPU_COUNT = 1
        DETECTION_MIN_CONFIDENCE = 0.0
        COMPUTE_DTYPE = "float32"

    model = MaskRCNN("inference", SmallCfg())
    model.init_params(0)
    H, W = 96, 128
    K = make_intrinsic(110.0, 110.0, W / 2, H / 2)
    frames = make_sequence(default_scene(), K, H, W, n_frames=3)
    seq = [dict(depth=f["depth"], color=f["color"], extrinsic=f["extrinsic"],
                mean_depth=f["mean_depth"]) for f in frames]
    pipe = LivePipeline(model, K,
                        FusionConfig(vol_dim=(32,) * 3,
                                     hist_dtype=jnp.uint16),
                        backend="xla", use_depth_filter=True)
    fps = pipe.run(seq, verbose=False)
    assert pipe.frames_done == 3
    assert fps > 0
    assert int(pipe.fusion.state.n_obs) == 2


def test_inspect_and_viz_extras():
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.models import Config, MaskRCNN
    from slam_maskrcnn_tpu.models.inspect import (find_suspicious_weights,
                                                  run_graph, weight_stats)
    from slam_maskrcnn_tpu.viz.visualize import (display_top_masks, draw_box,
                                                 plot_precision_recall)

    class TinyCfg(Config):
        NAME = "inspect_test"
        BACKBONE = "resnet50"
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        NUM_CLASSES = 4
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        POST_NMS_ROIS_INFERENCE = 20
        PRE_NMS_LIMIT = 50
        DETECTION_MAX_INSTANCES = 5
        IMAGES_PER_GPU = 1
        GPU_COUNT = 1
        DETECTION_MIN_CONFIDENCE = 0.0
        COMPUTE_DTYPE = "float32"

    model = MaskRCNN("inference", TinyCfg())
    model.init_params(0)
    rows = weight_stats(model.params, pattern="conv1")
    assert rows and all("shape" in r for r in rows)
    assert isinstance(find_suspicious_weights(model.params), list)

    img = np.random.default_rng(0).integers(0, 255, (100, 120, 3),
                                            dtype=np.uint8)
    acts = run_graph(model, [img], filter_fn=lambda k: "conv1" in k
                     or k.startswith("out/"))
    assert any(k.startswith("out/") for k in acts)

    # viz extras
    canvas = np.zeros((32, 32, 3), np.uint8)
    draw_box(canvas, np.array([4, 4, 20, 20]), (255, 0, 0))
    assert canvas.max() == 255
    plot_precision_recall(0.5, np.array([1.0, 0.5]), np.array([0.0, 1.0]))
    mask = np.zeros((32, 32, 2), bool)
    mask[4:10, 4:10, 0] = True
    mask[12:20, 12:20, 1] = True
    display_top_masks(canvas, mask, np.array([1, 2]),
                      ["BG", "a", "b"], limit=2)


def test_batch_mask_process_writes_label_pngs(tmp_path):
    """Gate config 3 contract: mask/<name>.png with pixel value = instance
    id (mask_process.py semantics), via the real batch driver."""
    import cv2

    from slam_maskrcnn_tpu.models import Config, MaskRCNN
    from slam_maskrcnn_tpu.models.mask_ops import batch_mask_process

    class SmallCfg(Config):
        NAME = "bmp_test"
        BACKBONE = "resnet50"
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        NUM_CLASSES = 4
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        POST_NMS_ROIS_INFERENCE = 20
        PRE_NMS_LIMIT = 50
        DETECTION_MAX_INSTANCES = 5
        IMAGES_PER_GPU = 1
        GPU_COUNT = 1
        DETECTION_MIN_CONFIDENCE = 0.0
        COMPUTE_DTYPE = "float32"

    rgb_dir = tmp_path / "rgb"
    out_dir = tmp_path / "mask"
    rgb_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("1311871923.004312.png", "1311871923.036248.png"):
        cv2.imwrite(str(rgb_dir / name),
                    rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    model = MaskRCNN("inference", SmallCfg())
    model.init_params(0)
    n = batch_mask_process(model, str(rgb_dir), str(out_dir), verbose=False)
    assert n == 2
    outs = sorted(os.listdir(out_dir))
    assert outs == ["1311871923.004312.png", "1311871923.036248.png"]
    m = cv2.imread(str(out_dir / outs[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (96, 128)
    assert m.dtype == np.uint8  # label-encoded instance ids


def test_patchmatch_recovers_slanted_plane():
    """The slanted-plane model (utils.py:230-239) must track a disparity
    that varies linearly across the image — a fronto-parallel-only model
    stair-steps here."""
    import cv2

    rng = np.random.default_rng(5)
    right = (rng.random((40, 96)) * 255).astype(np.float32)
    right = cv2.GaussianBlur(right, (5, 5), 1.2)
    xs = np.arange(96, dtype=np.float32)
    d_true = 3.0 + xs * 0.08          # 3..10.7 px across the image
    left = np.empty_like(right)
    for y in range(right.shape[0]):
        left[y] = np.interp(xs - d_true, xs, right[y],
                            left=right[y, 0], right=right[y, -1])
    # left(x) = right(x - d): warp so PatchMatch's sampling convention holds
    left = np.roll(left[:, ::-1], 0, axis=1)[:, ::-1]
    pm = PatchMatch(left, right, patch=7, max_disp=16, seed=0)
    disp = pm.run(iters=6)
    inner = disp[8:-8, 16:-8]
    err = np.abs(inner - d_true[None, 16:-8])
    assert np.median(err) < 1.2, f"median err {np.median(err):.2f}"
