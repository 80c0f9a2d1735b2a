"""Parameter checkpointing (orbax).

Replaces the reference's per-epoch Keras .h5 ModelCheckpoint + filename-
regex resume (``Mask_RCNN/mrcnn/model.py:2054-2077, 2208-2242``) with orbax
saves under a dated run dir, same discovery ergonomics.
"""

from __future__ import annotations

import datetime
import os
import re

import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_params(params, path: str):
    path = os.path.abspath(path)
    _ckptr().save(path, params, force=True)
    return path


def restore_params(path: str, template=None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if template is not None:
        return _ckptr().restore(path, template)
    return _ckptr().restore(path)


def run_dir(model_dir: str, name: str) -> str:
    """Dated run directory, reference log-dir convention
    (model.py:2208-2220)."""
    now = datetime.datetime.now()
    d = os.path.join(model_dir,
                     f"{name.lower()}{now:%Y%m%dT%H%M}")
    os.makedirs(d, exist_ok=True)
    return d


def checkpoint_path(run_directory: str, name: str, epoch: int) -> str:
    return os.path.join(run_directory,
                        f"mask_rcnn_{name.lower()}_{epoch:04d}")


def find_last(model_dir: str, name: str) -> str:
    """Newest checkpoint of the newest run (model.py:2054-2077)."""
    key = name.lower()
    runs = sorted(d for d in os.listdir(model_dir) if d.startswith(key))
    for run in reversed(runs):
        rd = os.path.join(model_dir, run)
        ckpts = sorted(f for f in os.listdir(rd)
                       if re.match(r"mask_rcnn", f))
        if ckpts:
            return os.path.join(rd, ckpts[-1])
    raise FileNotFoundError(f"no checkpoints for {name} under {model_dir}")
