import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.metrics.base import MetricCollection
from pedestrians_video_2_carla_tpu.metrics.classification import (
    AUROC, Accuracy, ConfusionMatrixMetric, F1Score, Precision, Recall)
from pedestrians_video_2_carla_tpu.metrics.fb import (FB_MPJPE, FB_MPJVE,
                                                      FB_N_MPJPE, FB_PA_MPJPE,
                                                      fb_p_mpjpe)
from pedestrians_video_2_carla_tpu.metrics.pose import (MPJPE, MRPE, PCK,
                                                        MissingJointsRatio)


def _update_compute(metric, preds, targets):
    state = metric.init_state()
    state = metric.update(state, preds, targets)
    return metric.compute(state)


def test_mpjpe_known_value():
    gt = jnp.zeros((2, 3, 26, 3))
    pred = jnp.ones((2, 3, 26, 3)) * 0.001  # 1mm offset in each axis
    value = _update_compute(MPJPE(), {"absolute_pose_loc": pred},
                            {"absolute_pose_loc": gt})
    np.testing.assert_allclose(float(value), np.sqrt(3), rtol=1e-4)


def test_mpjpe_accumulates_over_batches():
    m = MPJPE()
    state = m.init_state()
    gt = jnp.zeros((2, 3, 26, 3))
    state = m.update(state, {"absolute_pose_loc": gt + 0.001},
                     {"absolute_pose_loc": gt})
    state = m.update(state, {"absolute_pose_loc": gt + 0.003},
                     {"absolute_pose_loc": gt})
    expected = 1000 * (0.001 + 0.003) / 2 * np.sqrt(3)
    np.testing.assert_allclose(float(m.compute(state)), expected, rtol=1e-4)


def test_fb_mpjpe_equals_mpjpe_identity_mapping(rng):
    pred = jnp.asarray(rng.normal(size=(2, 3, 26, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(2, 3, 26, 3)).astype(np.float32))
    a = _update_compute(MPJPE(), {"absolute_pose_loc": pred},
                        {"absolute_pose_loc": gt})
    b = _update_compute(FB_MPJPE(), {"absolute_pose_loc": pred},
                        {"absolute_pose_loc": gt})
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4)


def test_pa_mpjpe_invariant_to_rigid_transform(rng):
    from tests.ops.np_reference import random_rotation_matrices
    gt = rng.normal(size=(4, 26, 3)).astype(np.float32)
    rot = random_rotation_matrices(rng, (4,)).astype(np.float32)
    pred = 1.7 * np.einsum("njk,nkl->njl", gt, rot) + rng.normal(size=(4, 1, 3)).astype(np.float32)
    err = fb_p_mpjpe(jnp.asarray(pred), jnp.asarray(gt))
    assert float(err) < 1e-4


def test_pck_all_within_threshold(rng):
    gt = jnp.asarray(np.abs(rng.normal(size=(2, 3, 26, 2))).astype(np.float32)
                     * 50 + 100)
    value = _update_compute(
        PCK(threshold=0.5, normalization="bbox"),
        {"projection_2d": gt}, {"projection_2d": gt})
    np.testing.assert_allclose(float(value), 1.0)


def test_missing_joints_ratio():
    pred = np.ones((2, 4, 26, 2), dtype=np.float32)
    pred[:, :, 3] = 0.0  # one joint always missing
    value = _update_compute(MissingJointsRatio(), {"projection_2d": jnp.asarray(pred)}, {})
    np.testing.assert_allclose(float(value), 1.0 / 26, rtol=1e-5)


def test_classification_metrics_hand_computed():
    # confusion: gt  [0,0,1,1,1,0], pred [0,1,1,1,0,0]
    logits = jnp.asarray([[5., -5.], [-5., 5.], [-5., 5.],
                          [-5., 5.], [5., -5.], [5., -5.]])
    gt = jnp.asarray([0, 0, 1, 1, 1, 0])
    preds = {"crossing_logits": logits}
    targets = {"crossing": gt}

    cm = _update_compute(ConfusionMatrixMetric(), preds, targets)
    np.testing.assert_array_equal(np.asarray(cm), [[2, 1], [1, 2]])

    acc = _update_compute(Accuracy(average="micro"), preds, targets)
    np.testing.assert_allclose(float(acc), 4 / 6, rtol=1e-5)

    prec = _update_compute(Precision(average="macro"), preds, targets)
    np.testing.assert_allclose(float(prec), (2 / 3 + 2 / 3) / 2, rtol=1e-5)

    f1 = _update_compute(F1Score(average="macro"), preds, targets)
    np.testing.assert_allclose(float(f1), 2 / 3, rtol=1e-5)

    per_class = _update_compute(Recall(average="none"), preds, targets)
    np.testing.assert_allclose(float(per_class["0"]), 2 / 3, rtol=1e-5)


def test_f1_with_fractional_denominator():
    """precision+recall < 1 per class: the safe-division guard must not
    clamp the fractional denominator (regression: a jnp.maximum(den, 1)
    guard silently returned the numerator, halving this F1)."""
    # confusion [[1,3],[3,1]]: precision = recall = 0.25 per class -> F1 0.25
    big = 5.0
    logits = jnp.asarray([[big, -big]] * 1 + [[-big, big]] * 3
                         + [[-big, big]] * 1 + [[big, -big]] * 3)
    gt = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    f1 = _update_compute(F1Score(average="macro"),
                         {"crossing_logits": logits}, {"crossing": gt})
    np.testing.assert_allclose(float(f1), 0.25, rtol=1e-5)


def test_auroc_perfect_and_random():
    n = 64
    gt = jnp.asarray([0, 1] * (n // 2))
    perfect_logits = jnp.where(gt == 1, 10.0, -10.0)[:, None] * \
        jnp.asarray([-1.0, 1.0])
    auroc = _update_compute(AUROC(), {"crossing_logits": perfect_logits},
                            {"crossing": gt})
    assert float(auroc) > 0.95
    const_logits = jnp.zeros((n, 2))
    auroc = _update_compute(AUROC(), {"crossing_logits": const_logits},
                            {"crossing": gt})
    assert 0.3 < float(auroc) < 0.7


def test_metric_collection_tree_sum(rng):
    m = MetricCollection({"MPJPE": MPJPE()})
    gt = jnp.zeros((2, 3, 26, 3))
    s1 = m.update(m.init_state(), {"absolute_pose_loc": gt + 0.001},
                  {"absolute_pose_loc": gt})
    s2 = m.update(m.init_state(), {"absolute_pose_loc": gt + 0.003},
                  {"absolute_pose_loc": gt})
    merged = m.tree_sum([s1, s2])
    expected = 1000 * (0.001 + 0.003) / 2 * np.sqrt(3)
    np.testing.assert_allclose(float(m.compute(merged)["MPJPE"]),
                               expected, rtol=1e-4)
