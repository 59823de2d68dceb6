import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import CameraIntrinsics, FusionConfig
from supersurfel_fusion_tpu.ops.fusion import (
    _insert,
    MatchResult,
    filter_and_compact,
)
from supersurfel_fusion_tpu.types import Supersurfels


def _frame_with(n, conf):
    f = Supersurfels.empty(n)
    return f._replace(
        positions=jnp.asarray(
            np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
        ),
        confidences=jnp.asarray(conf, jnp.float32),
    )


def test_insert_compaction():
    F, C = 8, 32
    conf = np.array([1, -1, 2, 3, -1, 4, 5, -1], np.float32)
    frame = _frame_with(F, conf)
    model = Supersurfels.empty(C)
    matched = jnp.asarray([False, False, True, False, False, False, False, False])
    match = MatchResult(matched=matched, model_match=jnp.full((F,), -1, jnp.int32))
    R = jnp.eye(3)
    t = jnp.zeros(3)
    new_model, nb, _ = _insert(frame, model, match, jnp.int32(4), R, t, jnp.int32(0))
    # valid & unmatched: ids 0, 3, 5, 6 -> 4 inserts starting at slot 4
    assert int(nb) == 8
    got = np.asarray(new_model.confidences[:10])
    np.testing.assert_allclose(got[4:8], [1, 3, 4, 5])


def test_insert_respects_capacity():
    F, C = 8, 6
    conf = np.ones(8, np.float32)
    frame = _frame_with(F, conf)
    model = Supersurfels.empty(C)
    match = MatchResult(
        matched=jnp.zeros(F, bool), model_match=jnp.full((F,), -1, jnp.int32)
    )
    new_model, nb, dropped = _insert(
        frame, model, match, jnp.int32(4), jnp.eye(3), jnp.zeros(3), jnp.int32(0)
    )
    assert int(nb) == 6  # only 2 fit
    assert int(dropped) == 6


def test_filter_and_compact_orders_states():
    C = 16
    cam = CameraIntrinsics(100.0, 100.0, 32.0, 32.0, 64, 64)
    cfg = FusionConfig(nb_supersurfels_max=C, delta_t=5)
    model = Supersurfels.empty(C)
    rng = np.random.default_rng(0)
    pos = np.zeros((C, 3), np.float32)
    pos[:, 2] = 1.0  # in front of camera at z=1
    pos[3] = [0, 0, 10.0]  # out of range -> inactive
    pos[5] = [0, 0, 0.3]   # in front of observed surface z=1 -> free-space kill
    conf = np.full(C, 10.0, np.float32)
    conf[7] = -1.0          # dead
    stamps = np.zeros((C, 2), np.int32)
    model = model._replace(
        positions=jnp.asarray(pos),
        confidences=jnp.asarray(conf),
        stamps=jnp.asarray(stamps),
    )
    depth = jnp.ones((64, 64), jnp.float32)
    out, nb, nbv = filter_and_compact(
        model, jnp.int32(10), depth, jnp.eye(3), jnp.zeros(3), cam, cfg,
        conf_thresh=100.0, stamp=jnp.int32(3),
    )
    # of the first 10: idx 3 inactive, idx 5+7 invalid -> 8 live, 7 visible
    assert int(nb) == 8
    assert int(nbv) == 7
    c = np.asarray(out.confidences)
    assert (c[:7] > 0).all()
    assert (c[8:] <= 0).all()


def test_stale_eviction():
    C = 8
    cam = CameraIntrinsics(100.0, 100.0, 32.0, 32.0, 64, 64)
    cfg = FusionConfig(nb_supersurfels_max=C, delta_t=5)
    model = Supersurfels.empty(C)
    pos = np.zeros((C, 3), np.float32)
    pos[:, 2] = 1.0
    conf = np.full(C, 10.0, np.float32)
    conf[2] = 5000.0  # confident -> survives staleness
    model = model._replace(
        positions=jnp.asarray(pos),
        confidences=jnp.asarray(conf),
        stamps=jnp.zeros((C, 2), jnp.int32),
    )
    depth = jnp.ones((64, 64), jnp.float32)
    out, nb, nbv = filter_and_compact(
        model, jnp.int32(4), depth, jnp.eye(3), jnp.zeros(3), cam, cfg,
        conf_thresh=100.0, stamp=jnp.int32(50),
    )
    assert int(nb) == 1  # only the confident one remains
    assert float(out.confidences[0]) == 5000.0
