"""Model inspection tools.

= the reference's graph-probing and weight-inspection tooling:
``run_graph`` (``Mask_RCNN/mrcnn/model.py:2623-2672`` — fetch intermediate
tensors by name) and the inspect_weights notebook (weight histograms).
Flax makes both natural: ``capture_intermediates`` for activations and a
pytree walk for weight stats.
"""

from __future__ import annotations

import numpy as np


def run_graph(model, images, filter_fn=None):
    """Run inference capturing every intermediate activation.

    Returns {path_string: array}. ``filter_fn(path) -> bool`` narrows the
    capture (the reference names outputs explicitly; here you filter).
    """
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.models.anchors import get_anchors

    molded, windows = model.mold_inputs(images)
    H, W = molded.shape[1:3]
    anchors = jnp.asarray(get_anchors(model.config, molded.shape[1:]))
    scale = np.array([H - 1, W - 1, H - 1, W - 1], np.float32)
    shift = np.array([0, 0, 1, 1], np.float32)
    norm_windows = (windows.astype(np.float32) - shift) / scale
    mean = jnp.asarray(model.config.MEAN_PIXEL, jnp.float32)

    out, state = model.module.apply(
        model.params,
        jnp.asarray(molded).astype(jnp.float32) - mean,
        anchors, jnp.asarray(norm_windows),
        capture_intermediates=True, mutable=["intermediates"])

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(v, prefix + (str(i),))
        else:
            try:
                flat["/".join(prefix)] = np.asarray(node)
            except Exception:
                # activations sown inside vmapped submodules surface as
                # leaked tracers; skip them (the reference's run_graph only
                # exposed top-level tensors anyway)
                pass

    walk(state["intermediates"], ())
    if filter_fn:
        flat = {k: v for k, v in flat.items() if filter_fn(k)}
    outputs = {f"out/{k}": np.asarray(v) for k, v in out.items()}
    flat.update(outputs)
    return flat


def weight_stats(params, pattern: str | None = None):
    """Per-weight summary rows (name, shape, min, max, mean, std) — the
    inspect_weights notebook as a function. Returns list of dicts."""
    import re

    import jax

    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if pattern and not re.search(pattern, name):
            continue
        a = np.asarray(leaf)
        rows.append(dict(name=name, shape=tuple(a.shape),
                         min=float(a.min()), max=float(a.max()),
                         mean=float(a.mean()), std=float(a.std())))
    return rows


def find_suspicious_weights(params, dead_std: float = 1e-5,
                            explode: float = 1e3):
    """Flag dead (near-constant) or exploding weights — the visual check
    the inspect_weights notebook does by eye."""
    bad = []
    for row in weight_stats(params):
        if row["std"] < dead_std or max(abs(row["min"]),
                                        abs(row["max"])) > explode:
            bad.append(row)
    return bad
