"""Headline benchmark: semantic TSDF fusion throughput on real TPU.

Measures steady-state fused frames/sec of the full per-frame device step
(splat probe -> Bayesian association -> mask relabel -> Pallas fusion) at
the reference workload: 480x640 RGB-D frames into a 256^3 volume with
32-bin instance histograms (src/SfM_CUDA constants, SURVEY §6).

Baseline: the reference publishes no numbers (BASELINE.md); the driver-set
north star is 30 fused frames/sec on one v5e — vs_baseline is fps/30.

Timing uses forced device->host readback: block_until_ready does not
reliably block on the axon platform (PERFORMANCE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.fusion.pipeline import fusion_step_blocked
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        init_blocked_from_first_frame)

    H, W = 480, 640
    K4 = make_intrinsic(520.9, 521.0, 325.1, 249.7)  # kernel.cpp:39
    cfg = FusionConfig(vol_dim=(256, 256, 256), hist_dtype=jnp.uint16)

    frames = make_sequence(default_scene(), K4, H, W, n_frames=4)
    state = init_blocked_from_first_frame(cfg, frames[0]["depth"], K4,
                                          frames[0]["mean_depth"])
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    staged = []
    for fr in frames[1:]:
        e2i = (fr["extrinsic"] @ E0i).astype(np.float32)
        staged.append((jnp.asarray(fr["depth"]), jnp.asarray(fr["color"]),
                       jnp.asarray(fr["mask"]), jnp.asarray(e2i)))
    Kj = jnp.asarray(K4)

    # warm up / compile (includes the association branch from frame 2 on)
    for i in range(2):
        state, mask_g, miss = fusion_step_blocked(state, *staged[i], Kj, cfg)
    _ = float(jnp.sum(state.weight))

    n = 12
    t0 = time.time()
    for i in range(n):
        state, mask_g, miss = fusion_step_blocked(state, *staged[i % 3],
                                                  Kj, cfg)
    # readback forces completion of the whole chain
    chk = float(jnp.sum(state.weight)) + float(jnp.sum(mask_g))
    dt = time.time() - t0
    fps = n / dt
    print(json.dumps({
        "metric": "tsdf_fused_frames_per_sec_256c",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
