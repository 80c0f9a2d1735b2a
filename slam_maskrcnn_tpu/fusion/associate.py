"""Cross-frame instance association (duplicate merge) — on device.

Re-design of ``TSDF::filter_overlaps`` (reference
``src/SfM_CUDA/tsdf.cu:304-416``). The reference copies the probe buffers
to the host and runs an O(W*H*K) pointer loop with hash maps; here the
(m, n) log-probability accumulation is two one-hot matmuls (MXU work), the
greedy 1-1 assignment is a K-step ``fori_loop`` over a 32x32 score matrix,
and nothing leaves the device — eliminating the reference's per-frame D2H
sync (``tsdf.cu:457-458``, SURVEY §5.8).

Semantics preserved exactly:
* For each current-mask id m and candidate global id n:
  score[m][n] = sum over pixels of mask id m of
      log(max(probs[p, n] / n_obs, prior_err))                (tsdf.cu:318)
  plus, over pixels the volume claims are instance n (box_mask) but whose
  mask id differs from m:
      log(max(1 - probs[p, n] / n_obs, prior_err))            (tsdf.cu:329)
  with counts accumulated the same way; the per-pair probability is the
  geometric mean exp(score / count) (tsdf.cu:343).
* Accept the best n per m iff prob > 3 * prior_err (tsdf.cu:349); greedy
  1-1 with best-prob tiebreak in ascending-m order (tsdf.cu:352-364).
* Matched mask ids rewrite to their global id; unmatched ids allocate fresh
  global ids in order of first pixel occurrence (raster order), bumping
  num_objs (tsdf.cu:371-389).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion.state import FusionConfig


@partial(jax.jit, static_argnames=("cfg",))
def associate_instances(probs: jax.Array, box_mask: jax.Array,
                        mask: jax.Array, n_obs: jax.Array,
                        num_objs: jax.Array, cfg: FusionConfig):
    """Compute the relabeling of this frame's mask ids to global ids.

    Args:
      probs: f32 [H, W, K] raw interpolated histogram counts at each pixel's
        surface hit (from back_project_probe).
      box_mask: bool [H, W, K] bins with raw count > 0.3 at the hit.
      mask: uint8/int [H, W] this frame's label-encoded mask.
      n_obs: i32 [] frames fused so far.
      num_objs: i32 [] global id high-water mark (+1).

    Returns:
      relabel: i32 [K] table mapping current id -> global id (identity at 0).
      new_num_objs: i32 [].
    """
    K = cfg.max_objects
    prior = cfg.prior_mrcnn_err_rate
    H, W = mask.shape
    P = H * W

    m_flat = jnp.clip(mask.reshape(P).astype(jnp.int32), 0, K - 1)
    probs_f = probs.reshape(P, K) / jnp.maximum(n_obs.astype(jnp.float32), 1.0)
    bm = box_mask.reshape(P, K).astype(jnp.float32)

    logp = jnp.log(jnp.maximum(probs_f, prior))
    logq = jnp.log(jnp.maximum(1.0 - probs_f, prior))

    onehot = (m_flat[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    npix = onehot.sum(0)  # [K] pixels per current id

    # term1[m, n] = sum_{p: mask=m} logp[p, n]  — one MXU matmul
    term1 = jax.lax.dot_general(onehot, logp, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    # term2[m, n] = sum_{p: box_mask[p,n], mask!=m} logq[p, n]
    bq = bm * logq
    col_bq = bq.sum(0)  # [n]
    own_bq = jax.lax.dot_general(onehot, bq, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    term2 = col_bq[None, :] - own_bq
    col_bm = bm.sum(0)
    own_bm = jax.lax.dot_general(onehot, bm, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    cnt2 = col_bm[None, :] - own_bm

    max_obj_now = jnp.max(m_flat) + 1  # tsdf.cu:306-307
    m_ids = jnp.arange(K)
    m_valid = (m_ids >= 1) & (m_ids < max_obj_now)
    n_valid = m_ids >= 1  # n ranges 1..K-1 (tsdf.cu:316,341)

    score = term1 + term2
    cnts = npix[:, None] + cnt2
    prob = jnp.where((cnts > 0) & m_valid[:, None] & n_valid[None, :],
                     jnp.exp(score / jnp.maximum(cnts, 1.0)), 0.0)

    best_n = jnp.argmax(prob, axis=1)           # first max wins ties, as C loop
    best_p = jnp.max(prob, axis=1)
    accepted = m_valid & (best_p > 3.0 * prior)  # tsdf.cu:349

    # Greedy claim in ascending-m order with best-prob replacement
    # (tsdf.cu:352-364): claim_owner[n] = current id assigned to global n.
    def claim_step(m, carry):
        owner, oprob = carry
        n = best_n[m]
        take = accepted[m] & ((owner[n] < 0) | (oprob[n] < best_p[m]))
        owner = jnp.where(take, owner.at[n].set(m), owner)
        oprob = jnp.where(take, oprob.at[n].set(best_p[m]), oprob)
        return owner, oprob

    owner0 = jnp.full((K,), -1, jnp.int32)
    owner, _ = jax.lax.fori_loop(1, K, claim_step,
                                 (owner0, jnp.zeros((K,), jnp.float32)))

    # rev[m] = n if owner[n] == m else -1 (each m owns at most one n)
    eq = owner[None, :] == m_ids[:, None]  # [m, n]
    rev = jnp.where(eq.any(axis=1), jnp.argmax(eq, axis=1), -1).astype(jnp.int32)

    # Fresh ids for present-but-unmatched current ids, in raster order of
    # first occurrence (extra_assign, tsdf.cu:378-388).
    pix_idx = jnp.arange(P)
    first_idx = jnp.min(jnp.where(onehot > 0, pix_idx[:, None], P), axis=0)
    present = (npix > 0) & (m_ids >= 1)
    needs_new = present & (rev < 0)
    order_key = jnp.where(needs_new, first_idx, P + m_ids)
    rank = jnp.argsort(jnp.argsort(order_key))
    fresh = num_objs + rank.astype(jnp.int32)
    new_num_objs = num_objs + needs_new.sum().astype(jnp.int32)

    relabel = jnp.where(rev >= 0, rev, jnp.where(needs_new, fresh, m_ids))
    relabel = relabel.at[0].set(0)
    return relabel.astype(jnp.int32), new_num_objs


def apply_relabel(mask: jax.Array, relabel: jax.Array) -> jax.Array:
    """Rewrite mask ids through the relabel table (tsdf.cu:372-389).

    Dense one-hot contraction instead of ``relabel[mask]``: XLA lowers the
    latter as ~12-18 ns/index scalar gathers (~5 ms at 480x640); the K=32
    one-hot select is a fused dense op (PERFORMANCE.md)."""
    K = relabel.shape[0]
    idx = jnp.clip(mask.astype(jnp.int32), 0, K - 1)
    oh = idx[..., None] == jnp.arange(K, dtype=jnp.int32)
    out = jnp.sum(jnp.where(oh, relabel, 0), axis=-1)
    return out.astype(mask.dtype)
