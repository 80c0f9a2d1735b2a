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


def keras_name_of(tree_path) -> tuple[str, str] | None:
    """(layer_name, keras_weight_name) for a flat tree path, or None if the
    leaf has no Keras counterpart. BN params live under <layer>/bn/."""
    leaf = tree_path[-1]
    if tree_path[-2] == "bn":
        layer = tree_path[-3]
        name = {"scale": "gamma:0", "bias": "beta:0",
                "mean": "moving_mean:0", "var": "moving_variance:0"}.get(leaf)
    else:
        layer = tree_path[-2]
        name = {"kernel": "kernel:0", "bias": "bias:0"}.get(leaf)
    return (layer, name) if name else None


def save_h5_weights(path: str, variables) -> str:
    """Write the Flax variables tree as a Keras-layout weights h5 — the
    inverse of load_h5_weights (layer names match the reference's
    ``model.py`` graph by construction, so the file round-trips through
    Keras tooling and through our strict loader)."""
    import h5py

    flat = _flatten(variables)
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for tree_path, value in flat.items():
            named = keras_name_of(tree_path)
            if named is None:
                continue
            layer, wname = named
            value = np.asarray(value)
            if wname == "kernel:0" and "deconv" in layer and value.ndim == 4:
                value = np.transpose(value, (0, 1, 3, 2))  # Flax -> Keras
            grp = g.require_group(f"{layer}/{layer}")
            grp.create_dataset(wname, data=value)
    return path


def load_h5_weights(path: str, variables, exclude=None,
                    strict: bool = False):
    """Load Keras h5 weights into a Flax variables pytree by layer name.

    `variables`: the initialized {'params': ..., 'batch_stats': ...} tree.
    `exclude`: list of layer-name regexes to skip (the reference's
    ``exclude=`` of ``load_weights``, model.py:2095).
    `strict`: fail loudly unless EVERY model parameter was written by the
    file and EVERY file layer was consumed (excluded layers exempt on both
    sides). Use for real full-model checkpoints (mask_rcnn_coco.h5) where
    a silent partial match would run a half-initialized network.
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

    written: set = set()

    def track(layer, kind, value):
        before = dict(flat)
        ok = set_weight(layer, kind, value)
        if ok:
            for p in flat:
                if flat[p] is not before[p]:
                    written.add(p)
        return ok

    loaded, skipped, excluded = [], [], []
    for lname, weights in _keras_layers(path):
        if any(p.search(lname) for p in exclude):
            excluded.append(lname)
            continue
        ok = False
        for wname, value in weights.items():
            w = wname.replace(":0", "")
            if w == "kernel":
                if "deconv" in lname and value.ndim == 4:
                    # Keras Conv2DTranspose [kh,kw,cout,cin] -> Flax [kh,kw,cin,cout]
                    value = np.transpose(value, (0, 1, 3, 2))
                ok |= track(lname, "kernel", value)
            elif w == "bias":
                ok |= track(lname, "bias", value)
            elif w == "gamma":
                ok |= track(lname, "scale", value)
            elif w == "beta":
                ok |= track(lname, "bias_bn", value)
            elif w == "moving_mean":
                ok |= track(lname, "mean", value)
            elif w == "moving_variance":
                ok |= track(lname, "var", value)
        (loaded if ok else skipped).append(lname)
    if not loaded:
        raise ValueError(f"no layers matched between {path} and the model")
    if strict:
        def is_excluded(tree_path):
            return any(p.search(comp) for p in exclude
                       for comp in tree_path)

        unmatched = sorted("/".join(p) for p in flat
                           if p not in written and not is_excluded(p))
        problems = []
        if unmatched:
            problems.append(
                f"{len(unmatched)} model parameters not written by the "
                f"file: {unmatched[:20]}{'...' if len(unmatched) > 20 else ''}")
        if skipped:
            problems.append(
                f"{len(skipped)} file layers not consumed by the model: "
                f"{sorted(skipped)[:20]}"
                f"{'...' if len(skipped) > 20 else ''}")
        if problems:
            raise ValueError(
                f"strict h5 import of {path} failed — a partial name "
                "mismatch would run a half-initialized network:\n  "
                + "\n  ".join(problems))
    return _unflatten(flat)
