"""Device-mesh sharding for fusion volumes and data-parallel training.

The reference's only parallelism is Keras graph-replication DP
(``Mask_RCNN/mrcnn/parallel_model.py:54-102``: CPU-side input split,
per-GPU towers, CPU-side concat). TPU-native replacement (SURVEY §2.5):

* **Data parallel**: one jitted train step with the batch sharded over the
  mesh's ``data`` axis and parameters replicated — XLA inserts the gradient
  all-reduce over ICI; there is no host-side split/merge.
* **Volume sharding** (SURVEY §5.7 — the scale axis of this workload): the
  TSDF state shards along the volume's x axis (dense state) or the block
  axis (blocked state). The fusion update is voxel-local with the frame
  tables replicated, so fusing runs collective-free; renders/probes that
  read across shards let XLA insert the gathers.

At 512^3 x 32 bins the histogram alone is 17 GB in u32 (2.15 GB at 256^3,
reference ``tsdf.cu:249-250``) — past a single v5e's HBM; u16 + sharding
makes 512^3 feasible (SURVEY §5.7 options (a)+(b) both implemented).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def data_parallel_sharding(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated) pair for jit in_shardings."""
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every array in the batch with its leading dim sharded."""
    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(params, rep)


def shard_volume_state(state, mesh: Mesh, axis: str = "data"):
    """Shard a TSDFState (dense, on volume-x) or BlockedTSDFState (on the
    block axis) across the mesh; scalars/metadata replicated."""
    from slam_maskrcnn_tpu.fusion.state import TSDFState

    big = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 3 and leaf.shape[0] >= mesh.size:
            return jax.device_put(leaf, big)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, state)


def _fill_holes_probs(z2d, probs, big):
    """Close 1-px holes on the globally-combined (z, probs) images —
    the post-combine equivalent of splat._fill_holes (which fills (z, vid)
    pre-gather; a voxel id is shard-local, so the sharded path must fill
    after the hist rows have been fetched and psum-combined)."""
    empty = z2d >= big
    fz = jnp.full_like(z2d, big)
    fp = jnp.zeros_like(probs)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nz = jnp.roll(z2d, (dy, dx), axis=(0, 1))
            nr = jnp.roll(probs, (dy, dx), axis=(0, 1))
            better = empty & (nz < fz)
            fz = jnp.where(better, nz, fz)
            fp = jnp.where(better[..., None], nr, fp)
    return (jnp.where(empty, fz, z2d),
            jnp.where(empty[..., None], fp, probs))


def make_sharded_fusion_step(cfg, mesh: Mesh, axis: str = "data",
                             max_blocks: int = 4096):
    """Volume-sharded blocked fusion step (SURVEY §5.7 option (a)).

    The BlockedTSDFState's block axis is x-major, so sharding dim 0 over the
    mesh shards the volume along x; each shard is a self-contained
    sub-volume whose ``vol_start.x`` is shifted by its shard offset. Per
    frame, inside ``shard_map``:

    * **probe**: each shard splats its own surface voxels to a local
      z-buffer + histogram rows; a ``pmin`` picks the globally nearest
      surface per pixel (lowest shard breaks ties) and a masked ``psum``
      assembles the winner's histogram row — the only collectives in the
      step (tiny: [H, W] + [H, W, K] over ICI).
    * **associate**: runs replicated on the combined probs (a <= KxK score
      problem, deterministic across shards).
    * **fuse**: the Pallas kernel runs shard-locally (voxel-parallel gather
      — zero communication), exactly as on one chip.

    Returns a jitted ``step(state, depth, color, mask, e2i, intrinsic) ->
    (state, mask_g, misses)`` with the state arrays donated.
    """
    from slam_maskrcnn_tpu.fusion.associate import (apply_relabel,
                                                    associate_instances)
    from slam_maskrcnn_tpu.fusion.splat import (BIG, _gather_hist_rows,
                                                _splat_zbuffer_arrays,
                                                pinhole_of_extrinsic)
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        BX, BlockedTSDFState, fuse_frame_blocked_impl)

    n = mesh.size
    shard = P(axis)
    rep = P()

    def step_impl(diff, colorpk, weight, hist, vol_start, voxel,
                  mu, n_obs, num_objs, depth, color, mask, e2i, intrinsic,
                  *, nbx, nby, nbz):
        H, W = depth.shape
        nbx_local = nbx // n
        i = jax.lax.axis_index(axis)
        shift = i.astype(jnp.float32) * (nbx_local * BX) * voxel[0]
        # vol_end is not an input: the fuse path never reads it, and an
        # unused donated leaf trips the jax-0.9 fastpath pruned-buffer
        # miscount on repeat calls (see splat.py). vol_start stands in.
        st = BlockedTSDFState(
            diff=diff, colorpk=colorpk, weight=weight, hist=hist,
            vol_start=vol_start.at[0].add(shift), vol_end=vol_start,
            voxel=voxel, mu=mu, n_obs=n_obs, num_objs=num_objs,
            nbx=nbx_local, nby=nby, nbz=nbz)

        def with_assoc(operand):
            stl, msk = operand
            M, m4 = pinhole_of_extrinsic(e2i, intrinsic)
            zbuf, vid, ovf, _clip = _splat_zbuffer_arrays(
                stl.diff, stl.vol_start, stl.voxel, M, m4, H, W,
                stl.nby, stl.nbz, max_blocks)
            Kb = stl.hist.shape[1] * 128 // 2048
            vd2 = vid.reshape(H, W)
            rows = _gather_hist_rows(stl.hist, jnp.maximum(vd2, 0),
                                     Kb).astype(jnp.float32)
            rows = jnp.where((vd2 >= 0)[..., None], rows, 0.0)
            z2 = zbuf.reshape(H, W)
            gz = jax.lax.pmin(z2, axis)
            claim = (z2 <= gz) & (z2 < BIG)
            owner = jax.lax.pmin(jnp.where(claim, i, n), axis)
            mine = claim & (owner == i)
            probs = jax.lax.psum(jnp.where(mine[..., None], rows, 0.0),
                                 axis)
            _, probs = _fill_holes_probs(gz, probs, BIG)
            bm = probs > cfg.box_mask_thresh
            rl, no = associate_instances(probs, bm, msk, st.n_obs,
                                         st.num_objs, cfg)
            return rl, no, jax.lax.psum(ovf, axis)

        def first_fuse(operand):
            stl, msk = operand
            identity = jnp.arange(cfg.max_objects, dtype=jnp.int32)
            return (identity, jnp.max(msk).astype(jnp.int32) + 1,
                    jnp.zeros((), jnp.int32))

        relabel, new_num, ovf = jax.lax.cond(st.n_obs > 0, with_assoc,
                                             first_fuse, (st, mask))
        mask_g = apply_relabel(mask, relabel)
        st = st.replace(num_objs=new_num)
        new, miss = fuse_frame_blocked_impl(st, depth, color, mask_g, e2i,
                                            intrinsic, cfg)
        return (new.diff, new.colorpk, new.weight, new.hist, new.n_obs,
                new.num_objs, mask_g, jax.lax.psum(miss, axis) + ovf)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3),
             static_argnames=("nbx", "nby", "nbz"))
    def step_arrays(diff, colorpk, weight, hist, vol_start, voxel, mu,
                    n_obs, num_objs, depth, color, mask, e2i, intrinsic,
                    nbx, nby, nbz):
        fn = partial(step_impl, nbx=nbx, nby=nby, nbz=nbz)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(shard, shard, shard, shard, rep, rep, rep, rep,
                      rep, rep, rep, rep, rep, rep),
            out_specs=(shard, shard, shard, shard, rep, rep, rep, rep),
            # pallas_call out_shapes carry no vma metadata -> the varying-
            # axes checker cannot type them; replication of the rep outputs
            # is still guaranteed by construction (pmin/psum combines)
            check_vma=False,
        )(diff, colorpk, weight, hist, vol_start, voxel, mu,
          n_obs, num_objs, depth, color, mask, e2i, intrinsic)

    def step(state, depth, color, mask, e2i, intrinsic):
        # explicit-arrays jit boundary (not the state pytree): an unused
        # pytree leaf (vol_end) plus donation trips the jax-0.9 C++
        # fastpath pruned-buffer miscount on repeat calls (see splat.py)
        out = step_arrays(state.diff, state.colorpk, state.weight,
                          state.hist, state.vol_start, state.voxel,
                          state.mu, state.n_obs, state.num_objs,
                          depth, color, mask, e2i, intrinsic,
                          nbx=state.nbx, nby=state.nby, nbz=state.nbz)
        diff, colorpk, weight, hist, n_obs, num_objs, mask_g, miss = out
        new_state = state.replace(diff=diff, colorpk=colorpk, weight=weight,
                                  hist=hist, n_obs=n_obs, num_objs=num_objs)
        return new_state, mask_g, miss

    # the underlying jit, for .lower()-based HLO inspection (the sharded
    # bench counts the compiled graph's actual collective bytes)
    step.step_arrays = step_arrays
    return step


def make_sharded_render(cfg, mesh: Mesh, axis: str = "data",
                        max_blocks: int = 4096, mode: str = "instance"):
    """Volume-sharded splat render — the viewer read across shards
    (``src/SfM_CUDA/viewer.cu:137-179`` reads the WHOLE volume per
    displayed frame; on a sharded volume each shard splats only its
    sub-volume and the image assembles over ICI).

    Same collective pattern as the sharded probe: shard-local splat to a
    (z, voxel-id) image, ``pmin`` picks the globally nearest surface per
    pixel (lowest shard breaks ties), a masked ``psum`` assembles the
    winner's shade inputs (colorpk scalar or histogram row — voxel ids
    are shard-local, so the FETCH happens on the owning shard), then the
    hole-fill + palette decode run replicated. Matches the 1-device
    ``_splat_render_jit`` output except where two shards' surfaces land
    at the same pixel with z within f32 tie order (the 1-device sort
    breaks ties by packed key; quantified in
    tests/test_volume_sharding.py::test_sharded_render_matches_1dev).

    Returns a jitted ``render(state, angle, dist, intrinsic, H, W) ->
    [H, W, 3] u8`` over a sharded BlockedTSDFState."""
    from slam_maskrcnn_tpu.fusion.splat import (BIG, _splat_zbuffer_arrays,
                                                fetch_shade_inputs,
                                                pinhole_of_orbit,
                                                shade_fetched)
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (BX,
                                                          BlockedTSDFState)

    n = mesh.size
    shard = P(axis)
    rep = P()

    def render_impl(diff, colorpk, hist, vol_start, voxel, angle, dist,
                    intrinsic, *, nbx, nby, nbz, H, W):
        nbx_local = nbx // n
        i = jax.lax.axis_index(axis)
        shift = i.astype(jnp.float32) * (nbx_local * BX) * voxel[0]
        vs = vol_start.at[0].add(shift)
        M, m4 = pinhole_of_orbit(angle, dist, intrinsic)
        # local splat WITHOUT hole fill: filling from local-only
        # neighbors would diverge from the 1-device render — fill runs
        # on the combined image below, in z space, like the probe's
        zbuf, vid, _ovf, _clip = _splat_zbuffer_arrays(
            diff, vs, voxel, M, m4, H, W, nby, nbz, max_blocks,
            cfg.splat_max_surface, getattr(cfg, "splat_max_rows", 8192),
            getattr(cfg, "splat_shell_band", 0.999),
            getattr(cfg, "splat_row_cap", 0), fill=False)
        z2 = zbuf.reshape(H, W)
        vd2 = vid.reshape(H, W)
        have_l, cpk_l, rows_l = fetch_shade_inputs(vd2, colorpk, hist,
                                                   mode)
        gz = jax.lax.pmin(z2, axis)
        claim = (z2 <= gz) & (z2 < BIG)
        owner = jax.lax.pmin(jnp.where(claim, i, n), axis)
        mine = claim & (owner == i) & have_l
        have = jax.lax.psum(mine.astype(jnp.int32), axis) > 0
        if mode == "color":
            shade_in = jax.lax.psum(jnp.where(mine, cpk_l, 0.0), axis)
        else:
            shade_in = jax.lax.psum(
                jnp.where(mine[..., None], rows_l.astype(jnp.float32),
                          0.0), axis)
        # post-combine 1-px hole fill (the probe's _fill_holes_probs
        # pattern): empty pixels take the nearest-z neighbor's inputs
        fill_in = shade_in if mode != "color" else shade_in[..., None]
        gz2, fill_out = _fill_holes_probs(
            jnp.where(have, gz, BIG), fill_in, BIG)
        filled = (gz2 < BIG)
        if mode == "color":
            return shade_fetched(filled, fill_out[..., 0], None, mode)
        return shade_fetched(filled, None, fill_out, mode)

    @partial(jax.jit, static_argnames=("nbx", "nby", "nbz", "H", "W"))
    def render_arrays(diff, colorpk, hist, vol_start, voxel, angle, dist,
                      intrinsic, nbx, nby, nbz, H, W):
        fn = partial(render_impl, nbx=nbx, nby=nby, nbz=nbz,
                     H=H, W=W)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(shard, shard, shard, rep, rep, rep, rep, rep),
            out_specs=rep,
            check_vma=False,
        )(diff, colorpk, hist, vol_start, voxel, angle, dist, intrinsic)

    def render(state, angle, dist, intrinsic, H: int, W: int):
        return render_arrays(state.diff, state.colorpk, state.hist,
                             state.vol_start, state.voxel,
                             jnp.asarray(angle, jnp.float32),
                             jnp.asarray(dist, jnp.float32),
                             jnp.asarray(intrinsic, jnp.float32),
                             state.nbx, state.nby, state.nbz, H, W)

    return render
