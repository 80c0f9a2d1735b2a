"""Keras h5 -> Flax importer test against a synthetic h5 in the Keras
weights layout (incl. the nested rpn_model group and a Conv2DTranspose
kernel needing transposition), plus volume snapshot/restore and profiling
utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_maskrcnn_tpu.models import Config, MaskRCNN


class TinyConfig(Config):
    NAME = "h5test"
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
    COMPUTE_DTYPE = "float32"


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _find(flat, layer, leaf):
    for path, v in flat.items():
        if layer in path and path[-1] == leaf:
            return v
    raise KeyError((layer, leaf))


def test_h5_import_maps_layers(tmp_path):
    import h5py

    model = MaskRCNN("inference", TinyConfig())
    variables = model.init_params(0)
    flat = _flat(variables)

    rng = np.random.default_rng(0)
    path = str(tmp_path / "weights.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")

        def put(group_path, name, shape):
            arr = rng.normal(size=shape).astype(np.float32)
            grp = g.require_group(group_path)
            grp.create_dataset(name, data=arr)
            return arr

        conv1_k = put("conv1/conv1", "kernel:0",
                      _find(flat, "conv1", "kernel").shape)
        conv1_b = put("conv1/conv1", "bias:0",
                      _find(flat, "conv1", "bias").shape)
        bn_gamma = put("bn_conv1/bn_conv1", "gamma:0",
                       _find(flat, "bn_conv1", "scale").shape)
        bn_mean = put("bn_conv1/bn_conv1", "moving_mean:0",
                      _find(flat, "bn_conv1", "mean").shape)
        # nested shared model, as Keras saves the RPN wrapper
        rpn_k = put("rpn_model/rpn_conv_shared", "kernel:0",
                    _find(flat, "rpn_conv_shared", "kernel").shape)
        dense_k = put("mrcnn_class_logits/mrcnn_class_logits", "kernel:0",
                      _find(flat, "mrcnn_class_logits", "kernel").shape)
        # deconv: Keras stores [kh, kw, cout, cin]
        flax_deconv = _find(flat, "mrcnn_mask_deconv", "kernel")
        kh, kw, cin, cout = flax_deconv.shape
        deconv_keras = put("mrcnn_mask_deconv/mrcnn_mask_deconv", "kernel:0",
                           (kh, kw, cout, cin))

    from slam_maskrcnn_tpu.models.import_h5 import load_h5_weights

    new_vars = load_h5_weights(path, variables)
    nf = _flat(new_vars)
    np.testing.assert_array_equal(np.asarray(_find(nf, "conv1", "kernel")),
                                  conv1_k)
    np.testing.assert_array_equal(np.asarray(_find(nf, "conv1", "bias")),
                                  conv1_b)
    np.testing.assert_array_equal(np.asarray(_find(nf, "bn_conv1", "scale")),
                                  bn_gamma)
    np.testing.assert_array_equal(np.asarray(_find(nf, "bn_conv1", "mean")),
                                  bn_mean)
    np.testing.assert_array_equal(
        np.asarray(_find(nf, "rpn_conv_shared", "kernel")), rpn_k)
    np.testing.assert_array_equal(
        np.asarray(_find(nf, "mrcnn_class_logits", "kernel")), dense_k)
    np.testing.assert_array_equal(
        np.asarray(_find(nf, "mrcnn_mask_deconv", "kernel")),
        np.transpose(deconv_keras, (0, 1, 3, 2)))
    # untouched layers keep their init values
    np.testing.assert_array_equal(
        np.asarray(_find(nf, "fpn_c5p5", "kernel")),
        np.asarray(_find(flat, "fpn_c5p5", "kernel")))


def test_h5_import_exclude(tmp_path):
    import h5py

    model = MaskRCNN("inference", TinyConfig())
    variables = model.init_params(0)
    flat = _flat(variables)
    path = str(tmp_path / "w.h5")
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        shape = _find(flat, "mrcnn_class_logits", "kernel").shape
        grp = g.require_group("mrcnn_class_logits/mrcnn_class_logits")
        grp.create_dataset("kernel:0",
                           data=rng.normal(size=shape).astype(np.float32))
        shape2 = _find(flat, "conv1", "kernel").shape
        grp2 = g.require_group("conv1/conv1")
        grp2.create_dataset("kernel:0",
                            data=rng.normal(size=shape2).astype(np.float32))
    from slam_maskrcnn_tpu.models.import_h5 import load_h5_weights

    new_vars = load_h5_weights(path, variables,
                               exclude=["mrcnn_class_logits"])
    nf = _flat(new_vars)
    # excluded layer unchanged, other layer loaded
    np.testing.assert_array_equal(
        np.asarray(_find(nf, "mrcnn_class_logits", "kernel")),
        np.asarray(_find(flat, "mrcnn_class_logits", "kernel")))
    assert not np.array_equal(np.asarray(_find(nf, "conv1", "kernel")),
                              np.asarray(_find(flat, "conv1", "kernel")))


def test_h5_strict_roundtrip_and_failures(tmp_path):
    """Full-inventory round-trip through save_h5_weights passes strict
    mode; a missing layer or an unconsumed extra layer fails loudly
    (VERDICT: a partial name mismatch must never load silently)."""
    import h5py

    from slam_maskrcnn_tpu.models.import_h5 import (load_h5_weights,
                                                    save_h5_weights)

    model = MaskRCNN("inference", TinyConfig())
    variables = model.init_params(0)
    path = str(tmp_path / "full.h5")
    save_h5_weights(path, variables)

    new_vars = load_h5_weights(path, variables, strict=True)
    nf, of = _flat(new_vars), _flat(variables)
    for k in of:
        np.testing.assert_array_equal(np.asarray(nf[k]), np.asarray(of[k]))

    # drop one layer -> strict reports the unmatched model params
    broken = str(tmp_path / "missing.h5")
    with h5py.File(path, "r") as src, h5py.File(broken, "w") as dst:
        src.copy("model_weights", dst)
        del dst["model_weights/conv1"]
    with pytest.raises(ValueError, match="not written"):
        load_h5_weights(broken, variables, strict=True)
    # ...unless the layer is excluded explicitly
    load_h5_weights(broken, variables, strict=True, exclude=["^conv1$"])

    # an extra file layer the model does not consume also fails
    extra = str(tmp_path / "extra.h5")
    with h5py.File(path, "r") as src, h5py.File(extra, "w") as dst:
        src.copy("model_weights", dst)
        grp = dst.require_group("model_weights/not_a_layer/not_a_layer")
        grp.create_dataset("kernel:0", data=np.zeros((1, 1, 1, 1), np.float32))
    with pytest.raises(ValueError, match="not consumed"):
        load_h5_weights(extra, variables, strict=True)


def test_volume_snapshot_roundtrip(tmp_path):
    from slam_maskrcnn_tpu.fusion import FusionConfig, init_state
    from slam_maskrcnn_tpu.fusion.checkpoint import load_volume, save_volume

    cfg = FusionConfig(vol_dim=(16, 16, 32), hist_dtype=jnp.uint16)
    st = init_state(cfg, [0, 0, 0], [1, 1, 1], num_objs=5)
    st = st.replace(diff=st.diff.at[3, 4, 5].set(-0.5),
                    n_obs=jnp.asarray(7, jnp.int32))
    p = save_volume(str(tmp_path / "vol.npz"), st, cfg)
    back = load_volume(p, cfg)
    np.testing.assert_allclose(np.asarray(back.diff), np.asarray(st.diff))
    assert int(back.n_obs) == 7 and int(back.num_objs) == 5
    blocked = load_volume(p, cfg, blocked=True)
    assert blocked.diff.shape[1:] == (16, 128)


def test_stage_timer_and_log():
    from slam_maskrcnn_tpu.utils import StageTimer, log_tensor

    t = StageTimer()
    with t("stage_a", sync=jnp.ones((4,))):
        _ = jnp.ones((8, 8)) * 2
    with t("stage_a"):
        pass
    rep = t.report()
    assert "stage_a" in rep and "x2" in rep
    log_tensor("arr", np.arange(6).reshape(2, 3))
