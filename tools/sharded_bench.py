"""Sharded-fusion scaling bench (VERDICT r1 "next" #10).

Runs the volume-sharded blocked fusion step on an N-device virtual CPU
mesh (multi-chip hardware is not reachable here), verifying shard-count
invariance of the result, and emits the analytic ICI communication model
for the real-chip topology: per-frame collective volumes of the sharded
step at the production sizes. The step's only collectives are the probe's
z-combine (``pmin`` over [H, W]), the winner-ownership ``pmin`` and the
histogram-row ``psum`` over [H, W, K] (parallel/sharding.py:142-164);
fusion itself is shard-local (voxel-parallel gather — zero bytes).

Output: SHARDED_BENCH.json at the repo root.

    python tools/sharded_bench.py [--vol 64] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def comm_model(H: int, W: int, K: int, n: int, vol: int,
               ici_gbps: float = 45.0):
    """Per-frame collective bytes + estimated ICI time for a ring of n
    v5e chips (one-directional ring all-reduce moves ~2(n-1)/n of the
    payload per link)."""
    pmin_z = H * W * 4
    pmin_owner = H * W * 4
    psum_probs = H * W * K * 4
    misses = 4 * 2
    per_frame = pmin_z + pmin_owner + psum_probs + misses
    ring_factor = 2.0 * (n - 1) / max(n, 1)
    wire_bytes = per_frame * ring_factor
    return {
        "vol": vol, "devices": n, "H": H, "W": W, "K": K,
        "pmin_z_bytes": pmin_z, "pmin_owner_bytes": pmin_owner,
        "psum_probs_bytes": psum_probs,
        "per_frame_collective_bytes": per_frame,
        "est_wire_bytes_ring": int(wire_bytes),
        "est_ici_ms": round(wire_bytes / (ici_gbps * 1e9) * 1e3, 3),
        "note": ("probs psum dominates (HxWxK f32); fusion itself is "
                 "collective-free — shard-local voxel-parallel gather"),
    }


_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                "f16": 2, "bf16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}


def hlo_collective_bytes(hlo_text: str):
    """Sum the result bytes of every collective op in a compiled HLO
    module. Returns (total_bytes, [(op, shape, bytes), ...])."""
    import re

    ops = ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute", "all-to-all")
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    found = []
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|\S+)\s+(" + "|".join(ops)
                      + r")(-start)?\(", line)
        if not m or "-done(" in line:
            continue
        total = 0
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        found.append((m.group(2), m.group(1), total))
    return sum(b for _, _, b in found), found


def measure_hlo_collectives(cfg, mesh, H, W, hist_dtype):
    """Lower + compile the sharded fusion step for the virtual mesh and
    count its ACTUAL collective bytes (VERDICT r2 weak #7: replace the
    hand arithmetic with compiled-graph evidence)."""
    import jax
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        BLOCK_VOX, TILE_L, TILE_S, _block_dims)
    from slam_maskrcnn_tpu.parallel.sharding import (
        make_sharded_fusion_step)

    nbx, nby, nbz = _block_dims(cfg.vol_dim)
    NB = nbx * nby * nbz
    K = cfg.max_objects
    sd = jax.ShapeDtypeStruct
    step = make_sharded_fusion_step(cfg, mesh)
    lowered = step.step_arrays.lower(
        sd((NB, TILE_S, TILE_L), jnp.float32),   # diff
        sd((NB, TILE_S, TILE_L), jnp.float32),   # colorpk
        sd((NB, TILE_S, TILE_L), jnp.int32),     # weight
        sd((NB, BLOCK_VOX * K // TILE_L, TILE_L), hist_dtype),
        sd((3,), jnp.float32), sd((3,), jnp.float32),  # vol_start, voxel
        sd((), jnp.float32), sd((), jnp.int32), sd((), jnp.int32),
        sd((H, W), jnp.uint16), sd((H, W, 3), jnp.uint8),
        sd((H, W), jnp.uint8), sd((4, 4), jnp.float32),
        sd((4, 4), jnp.float32),
        nbx=nbx, nby=nby, nbz=nbz)
    hlo = lowered.compile().as_text()
    total, found = hlo_collective_bytes(hlo)
    return {
        "vol": cfg.vol_dim[0], "devices": mesh.size, "H": H, "W": W,
        "K": K, "hlo_collective_bytes_per_frame": total,
        "hlo_collectives": [
            {"op": op, "shape": shape, "bytes": b}
            for op, shape, b in found],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vol", type=int, default=64)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SHARDED_BENCH.json"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        init_blocked_from_first_frame)
    from slam_maskrcnn_tpu.parallel.sharding import (make_mesh,
                                                     make_sharded_fusion_step,
                                                     shard_volume_state)

    H, W = 120, 160
    K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    cfg = FusionConfig(vol_dim=(args.vol,) * 3, hist_dtype=jnp.uint16)
    frames = make_sequence(default_scene(), K4, H, W,
                           n_frames=args.frames + 1)
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    Kj = jnp.asarray(K4)

    results = {"virtual_mesh": [], "comm_model": []}
    ref_weight = None
    for n in (1, args.devices):
        mesh = make_mesh(n)
        state = init_blocked_from_first_frame(
            cfg, frames[0]["depth"], K4, frames[0]["mean_depth"])
        state = shard_volume_state(state, mesh)
        step = make_sharded_fusion_step(cfg, mesh, max_blocks=1024)
        t0 = time.time()
        for fr in frames[1:]:
            e2i = jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32))
            state, mask_g, miss = step(state, jnp.asarray(fr["depth"]),
                                       jnp.asarray(fr["color"]),
                                       jnp.asarray(fr["mask"]), e2i, Kj)
        wsum = float(jnp.sum(state.weight))
        hsum = int(jnp.sum(state.hist.astype(jnp.int64)))
        compile_and_run = time.time() - t0
        t0 = time.time()
        state2 = state
        for fr in frames[1:]:
            e2i = jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32))
            state2, mask_g, miss = step(state2, jnp.asarray(fr["depth"]),
                                        jnp.asarray(fr["color"]),
                                        jnp.asarray(fr["mask"]), e2i, Kj)
        _ = float(jnp.sum(state2.weight))
        steady = (time.time() - t0) / args.frames
        results["virtual_mesh"].append({
            "devices": n, "vol": args.vol,
            "weight_sum": wsum, "hist_sum": hsum,
            "misses": int(miss),
            "steady_s_per_frame_cpu_interpret": round(steady, 3),
            "compile_and_run_s": round(compile_and_run, 1),
        })
        if ref_weight is None:
            ref_weight = (wsum, hsum)
        else:
            assert (wsum, hsum) == ref_weight, (
                f"shard-count variance: {n} devices gave {(wsum, hsum)} "
                f"vs single-device {ref_weight}")
            results["shard_invariant"] = True

    for vol, K in ((256, 32), (512, 32)):
        for n in (4, 8):
            results["comm_model"].append(comm_model(480, 640, K, n, vol))

    # compiled-HLO collective accounting at the production 256^3 size
    # (compile-only on the virtual mesh; nothing executes)
    try:
        cfg256 = FusionConfig(vol_dim=(256,) * 3, hist_dtype=jnp.uint16)
        results["hlo_collectives_256"] = measure_hlo_collectives(
            cfg256, make_mesh(args.devices), 480, 640, jnp.uint16)
        got = results["hlo_collectives_256"][
            "hlo_collective_bytes_per_frame"]
        model = results["comm_model"][1]["per_frame_collective_bytes"]
        results["hlo_vs_model_ratio"] = round(got / model, 3)
    except Exception as e:  # keep the bench usable if lowering changes
        results["hlo_collectives_256"] = {"error": repr(e)}

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["virtual_mesh"]))
    print("shard_invariant:", results.get("shard_invariant"))


if __name__ == "__main__":
    main()
