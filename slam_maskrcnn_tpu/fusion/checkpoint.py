"""TSDF volume snapshot/restore.

The reference never checkpoints the fused volume (render-and-exit,
SURVEY §5.4); production needs it. A volume is a handful of arrays +
metadata — saved as a single compressed .npz, restorable into either
state form (dense or blocked).
"""

from __future__ import annotations

import numpy as np


def save_volume(path: str, state, cfg) -> str:
    """Snapshot a TSDFState or BlockedTSDFState (converted to dense so the
    snapshot format is backend-independent)."""
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (BlockedTSDFState,
                                                          to_dense)

    if isinstance(state, BlockedTSDFState):
        state = to_dense(state, cfg)
    np.savez_compressed(
        path,
        vol_dim=np.asarray(cfg.vol_dim, np.int64),
        voxel=np.asarray(state.voxel),
        mu=np.asarray(state.mu),
        diff=np.asarray(state.diff),
        color=np.asarray(state.color),
        weight=np.asarray(state.weight),
        hist=np.asarray(state.hist),
        vol_start=np.asarray(state.vol_start),
        vol_end=np.asarray(state.vol_end),
        n_obs=np.asarray(state.n_obs),
        num_objs=np.asarray(state.num_objs),
        mv_id=np.asarray(state.mv_id),
        mv_cnt=np.asarray(state.mv_cnt),
    )
    return path


def load_volume(path: str, cfg, blocked: bool = False):
    """Restore a snapshot into a TSDFState (or BlockedTSDFState)."""
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.fusion.state import TSDFState, init_state

    z = np.load(path)
    if "vol_dim" in z:  # written by this version; older snapshots lack it
        saved_dim = tuple(int(d) for d in z["vol_dim"])
        if saved_dim != tuple(cfg.vol_dim):
            raise ValueError(
                f"snapshot was saved at vol_dim={saved_dim} but cfg has "
                f"vol_dim={tuple(cfg.vol_dim)}; voxel pitch/mu would be "
                "inconsistent with the restored arrays")
    elif tuple(cfg.vol_dim) != z["diff"].shape:
        raise ValueError(
            f"snapshot arrays are {z['diff'].shape} but cfg.vol_dim is "
            f"{tuple(cfg.vol_dim)}")
    if (not cfg.majority_vote and z["hist"].ndim == 4
            and z["hist"].shape[-1] != cfg.max_objects):
        raise ValueError(
            f"snapshot histogram has {z['hist'].shape[-1]} bins but "
            f"cfg.max_objects is {cfg.max_objects}")
    base = init_state(cfg, z["vol_start"], z["vol_end"],
                      num_objs=int(z["num_objs"]))
    state = base.replace(
        diff=jnp.asarray(z["diff"]),
        color=jnp.asarray(z["color"]),
        weight=jnp.asarray(z["weight"]),
        hist=jnp.asarray(z["hist"], cfg.hist_dtype),
        n_obs=jnp.asarray(z["n_obs"], jnp.int32),
        mv_id=jnp.asarray(z["mv_id"]),
        mv_cnt=jnp.asarray(z["mv_cnt"]),
    )
    if blocked:
        from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import to_blocked

        return to_blocked(state, cfg)
    return state
