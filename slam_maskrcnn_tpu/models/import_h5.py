"""Keras .h5 -> Flax params importer for matterport Mask R-CNN weights.

Maps the reference's layer names (``mask_rcnn_coco.h5``, saved by
``model.py:2079-2115`` convention) onto our Flax module tree, which uses
the same layer names by construction (see models/backbone.py docstring).

Keras HDF5 layout: /<layer_name>/<layer_name>/<weight_name> with
kernel:0 [kh, kw, cin, cout] (same as Flax), bias:0 [cout],
BatchNorm gamma/beta/moving_mean/moving_variance, Dense kernel [in, out].
Keras Conv2DTranspose kernels are [kh, kw, cout, cin] while Flax
ConvTranspose expects [kh, kw, cin, cout] — transposed on import.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _keras_layers(h5file):
    """Yield (layer_name, {weight_name: array}) from a Keras weights h5.

    Keras nests shared sub-models (e.g. the rpn_model wrapper,
    model.py:879-901) as groups-within-groups; the *innermost* group owning
    the datasets is the real layer, so key by the dataset's parent group.
    """
    import h5py

    f = h5file if isinstance(h5file, h5py.File) else h5py.File(h5file, "r")
    root = f["model_weights"] if "model_weights" in f else f
    layers: dict[str, dict] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            parts = name.split("/")
            layer = parts[-2] if len(parts) >= 2 else parts[0]
            layers.setdefault(layer, {})[parts[-1]] = np.asarray(obj)

    root.visititems(visit)
    yield from layers.items()


def load_h5_weights(path: str, variables, exclude=None):
    """Load Keras h5 weights into a Flax variables pytree by layer name.

    `variables`: the initialized {'params': ..., 'batch_stats': ...} tree.
    `exclude`: list of layer-name regexes to skip (the reference's
    ``exclude=`` of ``load_weights``, model.py:2095).
    """
    exclude = [re.compile(p) for p in (exclude or [])]
    flat = _flatten(variables)
    # index our tree by the layer name (the path component matching a Keras
    # layer), e.g. (params, resnet, res2a_branch2a, kernel)
    by_layer: dict[str, dict] = {}
    for tree_path in flat:
        for comp in tree_path:
            by_layer.setdefault(comp, {})

    def set_weight(layer, kind, value):
        """kind in {kernel, bias, scale, bias_bn, mean, var}."""
        hits = []
        for path in flat:
            if layer not in path:
                continue
            leaf = path[-1]
            col = path[0]
            if kind == "kernel" and leaf == "kernel":
                hits.append(path)
            elif kind == "bias" and leaf == "bias" and "batch_stats" not in path and path[-2] != "bn":
                hits.append(path)
            elif kind == "scale" and leaf == "scale":
                hits.append(path)
            elif kind == "bias_bn" and leaf == "bias" and path[-2] == "bn":
                hits.append(path)
            elif kind == "mean" and leaf == "mean":
                hits.append(path)
            elif kind == "var" and leaf == "var":
                hits.append(path)
        if len(hits) != 1:
            return False
        path = hits[0]
        cur = flat[path]
        if value.shape != cur.shape:
            raise ValueError(
                f"shape mismatch for {layer}/{kind}: h5 {value.shape} vs "
                f"model {cur.shape}")
        flat[path] = jnp.asarray(value, cur.dtype)
        return True

    loaded, skipped = [], []
    for lname, weights in _keras_layers(path):
        if any(p.search(lname) for p in exclude):
            skipped.append(lname)
            continue
        ok = False
        for wname, value in weights.items():
            w = wname.replace(":0", "")
            if w == "kernel":
                if "deconv" in lname and value.ndim == 4:
                    # Keras Conv2DTranspose [kh,kw,cout,cin] -> Flax [kh,kw,cin,cout]
                    value = np.transpose(value, (0, 1, 3, 2))
                ok |= set_weight(lname, "kernel", value)
            elif w == "bias":
                ok |= set_weight(lname, "bias", value)
            elif w == "gamma":
                ok |= set_weight(lname, "scale", value)
            elif w == "beta":
                ok |= set_weight(lname, "bias_bn", value)
            elif w == "moving_mean":
                ok |= set_weight(lname, "mean", value)
            elif w == "moving_variance":
                ok |= set_weight(lname, "var", value)
        (loaded if ok else skipped).append(lname)
    if not loaded:
        raise ValueError(f"no layers matched between {path} and the model")
    return _unflatten(flat)
