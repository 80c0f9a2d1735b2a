"""Augmentation pipeline: image/mask geometric consistency (the reference's
imgaug hook + MASK_AUGMENTERS safety contract, model.py:1224-1270)."""

import numpy as np

from slam_maskrcnn_tpu.data.augment import (AdditiveGaussianNoise, Affine,
                                            CropAndPad, Fliplr, Flipud,
                                            GaussianBlur, Multiply, OneOf,
                                            Sequential, SomeOf, Sometimes)


def _fixture(seed=0):
    """Image whose red channel IS the (single) mask — geometric transforms
    applied consistently must keep image>127 ≈ mask."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((96, 128, 2), bool)
    mask[20:60, 30:80, 0] = True
    mask[50:90, 90:120, 1] = True
    image = np.zeros((96, 128, 3), np.uint8)
    image[..., 0] = np.where(mask.any(-1), 255, 0)
    return image, mask, rng


def _consistency(image, mask):
    """Fraction of pixels where the image's mask-encoding disagrees with
    the transformed mask (bilinear vs nearest edges differ slightly)."""
    enc = image[..., 0] > 127
    return np.mean(enc != mask.any(-1))


def test_geometric_augmenters_keep_masks_aligned():
    image, mask, rng = _fixture()
    for aug in (Fliplr(1.0), Flipud(1.0),
                Affine(rotate=17.0), Affine(scale=1.3),
                Affine(translate_percent=0.1), Affine(shear=8.0),
                CropAndPad(percent=-0.15), CropAndPad(percent=0.15)):
        im2, mk2 = aug(image, mask, rng)
        assert im2.shape == image.shape and mk2.shape == mask.shape
        assert mk2.any(), type(aug).__name__
        assert _consistency(im2, mk2) < 0.03, type(aug).__name__


def test_photometric_augmenters_leave_mask_untouched():
    _, mask, rng = _fixture(1)
    # mid-gray noise image: Multiply at 0/255 extremes would clip back to
    # the identity and fool the change assertion
    image = rng.integers(60, 190, (96, 128, 3)).astype(np.uint8)
    for aug in (Multiply((0.5, 0.9)), AdditiveGaussianNoise((5.0, 10.0)),
                GaussianBlur((1.0, 2.0))):
        im2, mk2 = aug(image, mask, rng)
        np.testing.assert_array_equal(mk2, mask)
        assert not np.array_equal(im2, image), type(aug).__name__


def test_composition_consistent():
    image, mask, rng = _fixture(2)
    aug = Sequential([
        Fliplr(0.5),
        Sometimes(0.8, Affine(rotate=(-15, 15), scale=(0.9, 1.1))),
        OneOf([Multiply((0.8, 1.2)), GaussianBlur((0.5, 1.5))]),
        SomeOf(1, [Flipud(1.0), CropAndPad((-0.1, 0.1))]),
    ])
    for _ in range(5):
        im2, mk2 = aug(image, mask, rng)
        assert im2.shape == image.shape and mk2.shape == mask.shape
        assert _consistency(im2, mk2) < 0.04


def test_data_generator_with_augmentation():
    """End-to-end: augmented batches stay mask-consistent structurally —
    gt boxes are re-extracted from the augmented masks downstream."""
    import jax.numpy as jnp  # noqa: F401  (conftest forces cpu)
    from slam_maskrcnn_tpu.data.dataset import data_generator
    from slam_maskrcnn_tpu.data.shapes import ShapesConfig, ShapesDataset

    class AugConfig(ShapesConfig):
        NAME = "augtest"
        IMAGES_PER_GPU = 2
        GPU_COUNT = 1
        USE_MINI_MASK = False

    cfg = AugConfig()
    ds = ShapesDataset()
    ds.load_shapes(6, 128, 128, seed=3)
    ds.prepare()
    aug = Sequential([Fliplr(0.5), Affine(rotate=(-10, 10))])
    gen = data_generator(ds, cfg, shuffle=False, seed=0,
                         augmentation=aug)
    batch = next(gen)
    assert batch["gt_masks"].any()
    # every valid gt box must tightly bound its (augmented) mask
    H = cfg.IMAGE_SHAPE[0] - 1
    for b in range(2):
        for g in range(batch["gt_class_ids"].shape[1]):
            if batch["gt_class_ids"][b, g] == 0:
                continue
            m = batch["gt_masks"][b, g] > 0.5
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            y1, x1, y2, x2 = batch["gt_boxes"][b, g] * H
            assert abs(ys.min() - y1) < 1.5 and abs(xs.min() - x1) < 1.5
            assert abs(ys.max() + 1 - y2) < 1.5 and abs(xs.max() + 1 - x2) < 1.5
