"""Keyframe / fern store sharded across the device mesh (SURVEY.md §2.3's
second scaling axis: "the keyframe set shards across hosts").

The single-device store (`ops/ferns.py:FernDB` + `ops/loop_closure.py:
KeyframeStore`) holds a dense (MAX_KF, n_ferns) code matrix plus per-keyframe
payloads (keypoints, descriptors, 3D points, surfel snapshots) — ~1.5 MB per
keyframe. Sharding layout: ROUND-ROBIN over the mesh axis — global keyframe k
lives on shard (k mod D) at local row (k div D) — so the store stays balanced
at any fill level and the global insertion order (which the fern "bestKeyFrame
= newest" rule and stamp gating rely on) is preserved by pure index
arithmetic, no redistribution ever.

Collectives per frame: ONE encoded pmin over () for the query (the code
compare itself is shard-local — place recognition scales with keyframes
per device). On a loop-closure frame, one psum broadcasts the winning
keyframe's payload (~1.5 MB on ICI) from its owner shard.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.ops.loop_closure import KeyframeStore

Array = jax.Array

_BIG = 2**30


def local_rows(max_kf: int, d: int) -> int:
    assert max_kf % d == 0, "max_keyframes must divide the mesh size"
    return max_kf // d


def query_sharded(codes_local: Array, count: Array, frame_codes: Array,
                  threshold: float, axis_name: str):
    """Distributed fern query.

    codes_local: (MAX_KF/D, n_ferns) this shard's code rows; count: ()
    replicated GLOBAL keyframe count. Returns (best_id [global], best_dissim,
    is_new) — bit-identical to `ferns.query` on the gathered store."""
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n = frame_codes.shape[0]
    rows = codes_local.shape[0]

    same = jnp.sum(
        (codes_local == frame_codes[None, :]).astype(jnp.int32), axis=1
    )
    dissim = (n - same).astype(jnp.float32) / float(n)
    gid = jnp.arange(rows, dtype=jnp.int32) * d + me
    dissim = jnp.where(gid < count, dissim, 1.0)

    # encoded min: dissim quantized to n+1 levels exactly (dissim = k/n)
    dq = jnp.round(dissim * n).astype(jnp.int32)
    key = jnp.min(dq * (1 << 20) + gid)
    best_key = jax.lax.pmin(key, axis_name)
    best_id = best_key & ((1 << 20) - 1)
    best = (best_key >> 20).astype(jnp.float32) / float(n)
    is_new = best > threshold
    return best_id.astype(jnp.int32), best, is_new


def add_keyframe_sharded(store_local: KeyframeStore, count: Array,
                         frame_codes: Array, R: Array, t: Array, stamp: Array,
                         kp_xy, kp_p3d, kp_desc, kp_valid,
                         sf_pos, sf_normal, sf_color, sf_valid,
                         axis_name: str):
    """Append keyframe `count` on its owner shard (count mod D); all other
    shards no-op. Returns (store_local, count+1) — masked when full."""
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rows = store_local.db.codes.shape[0]
    ok = count < rows * d
    owner = (count % d) == me
    row = jnp.clip(count // d, 0, rows - 1)
    take = ok & owner

    def put(dst, src):
        return dst.at[row].set(jnp.where(take, src, dst[row]))

    db = store_local.db._replace(
        codes=put(store_local.db.codes, frame_codes),
        poses_R=put(store_local.db.poses_R, R),
        poses_t=put(store_local.db.poses_t, t),
        stamps=put(store_local.db.stamps, stamp),
        count=jnp.where(ok, count + 1, count),  # replicated global count
    )
    new = KeyframeStore(
        db=db,
        kp_xy=put(store_local.kp_xy, kp_xy),
        kp_p3d=put(store_local.kp_p3d, kp_p3d),
        kp_desc=put(store_local.kp_desc, kp_desc),
        kp_valid=put(store_local.kp_valid, kp_valid),
        sf_pos=put(store_local.sf_pos, sf_pos),
        sf_normal=put(store_local.sf_normal, sf_normal),
        sf_color=put(store_local.sf_color, sf_color),
        sf_valid=put(store_local.sf_valid, sf_valid),
    )
    return new, jnp.where(ok, count + 1, count)


def get_stamp_sharded(stamps_local: Array, best_id: Array,
                      axis_name: str) -> Array:
    """Replicate keyframe `best_id`'s stamp from its owner shard (one scalar
    psum) — the loop-closure gate needs it every frame."""
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rows = stamps_local.shape[0]
    owner = (best_id % d) == me
    row = jnp.clip(best_id // d, 0, rows - 1)
    return jax.lax.psum(
        jnp.where(owner, stamps_local[row], 0), axis_name
    )


class KeyframePayload(NamedTuple):
    """One keyframe's loop-closure payload, replicated after the psum."""

    kp_xy: Array
    kp_p3d: Array
    kp_desc: Array
    kp_valid: Array
    sf_pos: Array
    sf_normal: Array
    sf_color: Array
    sf_valid: Array
    pose_R: Array
    pose_t: Array
    stamp: Array


def get_payload_sharded(store_local: KeyframeStore, best_id: Array,
                        axis_name: str) -> KeyframePayload:
    """Broadcast keyframe `best_id`'s payload from its owner shard: the owner
    contributes the rows, everyone else zeros, one psum replicates."""
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rows = store_local.db.codes.shape[0]
    owner = (best_id % d) == me
    row = jnp.clip(best_id // d, 0, rows - 1)

    def take(a):
        v = a[row]
        contrib = jnp.where(jnp.reshape(owner, (1,) * v.ndim), v,
                            jnp.zeros_like(v))
        if v.dtype == jnp.bool_:
            # bools psum as int32 (f32 would corrupt uint32 descriptors too)
            return jax.lax.psum(contrib.astype(jnp.int32), axis_name) > 0
        return jax.lax.psum(contrib, axis_name)

    return KeyframePayload(
        kp_xy=take(store_local.kp_xy),
        kp_p3d=take(store_local.kp_p3d),
        kp_desc=take(store_local.kp_desc),
        kp_valid=take(store_local.kp_valid),
        sf_pos=take(store_local.sf_pos),
        sf_normal=take(store_local.sf_normal),
        sf_color=take(store_local.sf_color),
        sf_valid=take(store_local.sf_valid),
        pose_R=take(store_local.db.poses_R),
        pose_t=take(store_local.db.poses_t),
        stamp=take(store_local.db.stamps),
    )
