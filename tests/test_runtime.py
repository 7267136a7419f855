"""Native batch loader + prefetcher tests."""
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.runtime.native_loader import (
    BinarySubsetCache, native_loader_available)
from pedestrians_video_2_carla_tpu.runtime.prefetcher import DevicePrefetcher


@pytest.mark.skipif(not native_loader_available(),
                    reason="g++ native build unavailable")
def test_binary_cache_gather_matches_numpy(tmp_path, rng):
    arrays = {
        "projection_2d": rng.normal(size=(40, 8, 26, 2)).astype(np.float32),
        "targets/absolute_pose_loc":
            rng.normal(size=(40, 8, 26, 3)).astype(np.float32),
        "targets/crossing": rng.integers(0, 2, size=(40,)).astype(np.int32),
    }
    cache = BinarySubsetCache.write(str(tmp_path / "train.bin"), arrays)
    idx = rng.permutation(40)[:16]
    out = cache.gather(idx)
    for k, v in arrays.items():
        np.testing.assert_array_equal(out[k], v[idx], err_msg=k)
    cache.close()


@pytest.mark.skipif(not native_loader_available(),
                    reason="g++ native build unavailable")
def test_binary_cache_rejects_out_of_bounds(tmp_path, rng):
    arrays = {"projection_2d": np.zeros((4, 2, 2), np.float32)}
    cache = BinarySubsetCache.write(str(tmp_path / "t.bin"), arrays)
    with pytest.raises(IndexError):
        cache.gather([0, 7])
    cache.close()


def test_prefetcher_yields_everything_in_order():
    out = list(DevicePrefetcher(iter(range(10)), put_fn=lambda x: x * 2))
    assert out == [x * 2 for x in range(10)]


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = DevicePrefetcher(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        for _ in it:
            pass


def test_hdf5_datamodule_uses_native_cache(tmp_path, rng):
    import os

    from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import save_subset
    from pedestrians_video_2_carla_tpu.data.base.subsets_datamodule import \
        SubsetsDataModule
    from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

    n = 12
    save_subset(str(tmp_path / "train.hdf5"),
                rng.normal(size=(n, 4, 26, 2)).astype(np.float32) + 300,
                {"absolute_pose_loc":
                 rng.normal(size=(n, 4, 26, 3)).astype(np.float32)},
                {"age": ["adult"] * n, "gender": ["female"] * n})
    dm = SubsetsDataModule(subsets_dir=str(tmp_path), batch_size=4,
                           clip_length=4, data_nodes=CARLA_SKELETON)
    dm.prepare_data()
    dm.setup("fit")
    if native_loader_available():
        assert "train" in getattr(dm, "_native_caches", {})
        assert os.path.exists(tmp_path / "train.bin.json")
    batch = next(iter(dm.train_batches()))
    assert batch[0].shape == (4, 4, 26, 2)


def test_device_resident_matches_host_path(tmp_path, rng):
    """device_resident=True must yield bit-identical batches to the host
    streaming path (same shuffle order, same preprocessing rng per batch)."""
    import jax

    from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import save_subset
    from pedestrians_video_2_carla_tpu.data.base.subsets_datamodule import \
        SubsetsDataModule
    from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

    n = 14  # deliberately not a multiple of batch_size: exercise wrap-around
    save_subset(str(tmp_path / "train.hdf5"),
                rng.normal(size=(n, 4, 26, 2)).astype(np.float32) + 300,
                {"absolute_pose_loc":
                 rng.normal(size=(n, 4, 26, 3)).astype(np.float32)},
                {"age": ["adult"] * n, "gender": ["female"] * n})
    (tmp_path / "val.hdf5").symlink_to(tmp_path / "train.hdf5")

    def collect(device_resident):
        dm = SubsetsDataModule(subsets_dir=str(tmp_path), batch_size=4,
                               clip_length=4, data_nodes=CARLA_SKELETON,
                               device_resident=device_resident)
        dm.prepare_data()
        dm.setup("fit")
        train = [jax.tree_util.tree_map(np.asarray, b)
                 for b in dm.train_batches(seed=3)]
        val = [jax.tree_util.tree_map(np.asarray, b)
               for b in dm.val_batches()]
        return train, val

    host_train, host_val = collect(False)
    res_train, res_val = collect(True)
    assert len(host_train) == len(res_train)
    assert len(host_val) == len(res_val) == 4  # ceil(14/4) incl. wrap pad
    for hb, rb in zip(host_train + host_val, res_train + res_val):
        np.testing.assert_allclose(hb[0], rb[0], atol=1e-6)
        # every host target is numeric in this fixture, so the resident
        # batch must carry the exact same key set (a missing key would mean
        # the resident path silently dropped a target)
        assert set(hb[1]) == set(rb[1])
        for k in hb[1]:
            np.testing.assert_allclose(hb[1][k], rb[1][k], atol=1e-6,
                                       err_msg=k)
        np.testing.assert_array_equal(hb[2]["age_gender_idx"],
                                      rb[2]["age_gender_idx"])


def test_device_resident_empty_subset_yields_nothing(tmp_path, rng):
    """A 0-clip subset must yield no batches, not crash the jitted gather
    (r3 review finding: jnp.take on an empty axis raises under jit)."""
    from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import save_subset
    from pedestrians_video_2_carla_tpu.data.base.subsets_datamodule import \
        SubsetsDataModule
    from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

    save_subset(str(tmp_path / "train.hdf5"),
                rng.normal(size=(8, 4, 26, 2)).astype(np.float32) + 300,
                {}, {"age": ["adult"] * 8, "gender": ["female"] * 8})
    save_subset(str(tmp_path / "val.hdf5"),
                np.zeros((0, 4, 26, 2), np.float32), {},
                {"age": [], "gender": []})
    dm = SubsetsDataModule(subsets_dir=str(tmp_path), batch_size=4,
                           clip_length=4, data_nodes=CARLA_SKELETON,
                           device_resident=True)
    dm.prepare_data()
    dm.setup("fit")
    assert len(list(dm.train_batches(0))) == 2
    assert list(dm.val_batches()) == []


def test_resident_scan_matches_per_batch_steps(tmp_path, rng):
    """The scan-folded resident epoch (runtime/resident_scan.py, K train
    steps in one dispatch) must produce bit-identical state and per-step
    logs to driving the per-batch resident iterator through training_step
    (VERDICT r3 #3: amortize per-batch dispatch; correctness contract is
    exact equality of the training trajectory)."""
    import jax

    from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import save_subset
    from pedestrians_video_2_carla_tpu.data.base.subsets_datamodule import \
        SubsetsDataModule
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS
    from pedestrians_video_2_carla_tpu.runtime.resident_scan import \
        build_scan_runner
    from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

    n = 16
    save_subset(str(tmp_path / "train.hdf5"),
                rng.normal(size=(n, 4, 26, 2)).astype(np.float32) + 300,
                {"absolute_pose_loc":
                 rng.normal(size=(n, 4, 26, 3)).astype(np.float32)},
                {"age": ["adult"] * n, "gender": ["female"] * n})
    dm = SubsetsDataModule(subsets_dir=str(tmp_path), batch_size=4,
                           clip_length=4, data_nodes=CARLA_SKELETON,
                           device_resident=True)
    dm.prepare_data()
    dm.setup("fit")

    def make_state(flow):
        first = next(iter(dm.train_batches(seed=3)))
        return flow.init_state(jax.random.PRNGKey(0), first)

    flow = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["Linear"](),
        loss_modes=[LossModes.loc_2d],
        movements_optimizer=OptimizerSettings(lr=1e-2))
    rng_step = jax.random.PRNGKey(7)

    # per-batch trajectory
    state_a = make_state(flow)
    step = jax.jit(flow.training_step)
    logs_a = []
    for b in dm.train_batches(seed=3):
        state_a, logs = step(state_a, b, rng_step)
        logs_a.append(jax.device_get(logs))

    # scan-folded trajectory (all 4 batches in one dispatch)
    spec = dm.resident_scan_inputs("train", shuffle=True, training=True,
                                   seed=3)
    gather, key, order_d, num_batches, trees = spec
    assert num_batches == 4
    state_b = make_state(flow)
    runner = build_scan_runner(flow, gather, k=num_batches)
    state_b, logs_stack = runner(state_b, rng_step, key, order_d, 0, *trees)
    logs_stack = jax.device_get(logs_stack)

    for la, lb in zip(logs_a, [
            {k: v[j] for k, v in logs_stack.items()}
            for j in range(num_batches)]):
        assert set(la) == set(lb)
        for k in la:
            np.testing.assert_array_equal(la[k], lb[k], err_msg=k)
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
