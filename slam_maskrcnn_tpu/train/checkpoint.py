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
    c = _ckptr()
    c.save(path, params, force=True)
    # StandardCheckpointer saves asynchronously; block until the
    # .orbax-checkpoint-tmp dir is committed so find_last/restore see a
    # complete checkpoint immediately
    c.wait_until_finished()
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


def epoch_from_path(path: str) -> int:
    """Epoch counter encoded in a checkpoint filename, or 0.

    = the reference's filename-regex resume (model.py:2208-2242): the
    checkpoint saved at the END of epoch N is named ...NNNN, so training
    resumes AT epoch N (the reference's `epoch = int(m.group(6)) - 1 + 1`)."""
    m = re.search(r"mask_rcnn_[\w\-]+?_(\d{4})$", os.path.basename(path))
    return int(m.group(1)) if m else 0


def find_last(model_dir: str, name: str) -> str:
    """Newest checkpoint of the newest run (model.py:2054-2077)."""
    key = name.lower()
    runs = sorted(d for d in os.listdir(model_dir) if d.startswith(key))
    for run in reversed(runs):
        rd = os.path.join(model_dir, run)
        ckpts = sorted(f for f in os.listdir(rd)
                       if re.match(r"mask_rcnn", f)
                       and "orbax-checkpoint-tmp" not in f)
        if ckpts:
            return os.path.join(rd, ckpts[-1])
    raise FileNotFoundError(f"no checkpoints for {name} under {model_dir}")
