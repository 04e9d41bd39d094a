"""On-disk dataset readers: OPV2V-layout fixture roundtrip + batchers.

The reference has no dataset tests (SURVEY §4); here the synthetic oracle is
written to disk in the real OPV2V layout and read back through the real
reader, so file scanning, yaml/pcd parsing and frame assembly are all
exercised against known ground truth.
"""

import numpy as np
import pytest

from coalign_tpu.data import (EarlyFusionBatcher, IntermediateFusionBatcher,
                              LateFusionBatcher, SyntheticScenes)
from coalign_tpu.data.fixtures import write_opv2v_fixture
from coalign_tpu.data.opv2v import OPV2VBaseDataset
from coalign_tpu.data.pcd_io import read_pcd, write_pcd

LIDAR_RANGE = (-40, -40, -3, 40, 40, 1)


@pytest.fixture(scope="module")
def scenes():
    return SyntheticScenes(num_frames=4, num_agents=3, num_objects=5,
                           lidar_range=LIDAR_RANGE, points_per_object=32,
                           ground_points=64, seed=7)


@pytest.fixture(scope="module")
def opv2v_root(tmp_path_factory, scenes):
    root = tmp_path_factory.mktemp("opv2v")
    return write_opv2v_fixture(str(root), scenes, frames_per_scenario=2)


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"x_{binary}.pcd")
        write_pcd(p, pts, binary=binary)
        back = read_pcd(p)
        np.testing.assert_allclose(back, pts, atol=1e-5)


def test_opv2v_reader_roundtrip(opv2v_root, scenes):
    ds = OPV2VBaseDataset(opv2v_root, train=False)
    assert len(ds) == 4
    for i in range(len(ds)):
        frame = ds[i]
        ref = scenes[i]
        assert len(frame["agents"]) == len(ref["agents"])
        for ag, rg in zip(frame["agents"], ref["agents"]):
            np.testing.assert_allclose(ag["pose"], rg["pose"], atol=1e-4)
            np.testing.assert_allclose(ag["points"], rg["points"], atol=1e-5)
        # world boxes recovered through the vehicles-yaml encoding
        got = frame["objects"]["boxes"]
        exp = ref["objects"]["boxes"]
        assert got.shape == exp.shape
        np.testing.assert_allclose(got[:, :6], exp[:, :6], atol=1e-3)
        dyaw = np.abs(np.mod(got[:, 6] - exp[:, 6] + np.pi, 2 * np.pi)
                      - np.pi)
        assert dyaw.max() < 1e-3


def test_opv2v_reader_rsu_never_ego(tmp_path, scenes):
    root = write_opv2v_fixture(str(tmp_path / "rsu"), scenes,
                               frames_per_scenario=2, rsu_last=True)
    ds = OPV2VBaseDataset(root, train=False)
    frame = ds[0]
    assert int(frame["agents"][0]["cav_id"]) > 0
    assert int(frame["agents"][-1]["cav_id"]) < 0


def test_early_fusion_batcher(scenes):
    b = EarlyFusionBatcher(max_cav=3, max_points=4096, max_objects=16,
                           lidar_range=LIDAR_RANGE)
    batch = b.assemble([scenes[0], scenes[1]])
    assert batch["points"].shape[:2] == (2, 1)
    assert batch["agent_mask"].all()
    # merged cloud must contain >= points than the ego's own cloud
    inter = IntermediateFusionBatcher(max_cav=3, max_points=4096,
                                      max_objects=16,
                                      lidar_range=LIDAR_RANGE)
    ibatch = inter.assemble([scenes[0], scenes[1]])
    assert (batch["point_mask"].sum() >= ibatch["point_mask"][:, 0].sum())


def test_early_fusion_projection_correct(scenes):
    """A neighbor's points projected into ego frame must land on the same
    world objects: compare against direct clean-pose projection."""
    b = EarlyFusionBatcher(max_cav=3, max_points=4096, max_objects=16,
                           lidar_range=LIDAR_RANGE, pos_std=0.0)
    frame = scenes[0]
    batch = b.assemble([frame])
    from coalign_tpu.utils.transforms import (inverse_tfm, pose_to_tfm,
                                              project_points)
    ego_pose = frame["agents"][0]["pose"]
    n = 4096
    for ai in (1, 2):
        pts = frame["agents"][ai]["points"]
        t = np.asarray(inverse_tfm(pose_to_tfm(ego_pose))) @ np.asarray(
            pose_to_tfm(frame["agents"][ai]["pose"]))
        expect = np.asarray(project_points(pts[:, :3], t))
        seg = batch["points"][0, 0, ai * n:(ai + 1) * n]
        smask = batch["point_mask"][0, 0, ai * n:(ai + 1) * n]
        # the batcher range-masks points first; compare the valid prefix
        k = smask.sum()
        assert k > 0
        got = seg[:k, :3]
        # match rows by nearest neighbour on a few samples
        d = np.linalg.norm(expect[:, None, :2] - got[None, :8, :2], axis=-1)
        assert d.min(axis=0).max() < 1e-3


def test_late_fusion_batchers(scenes):
    b = LateFusionBatcher(max_cav=3, max_points=2048, max_objects=16,
                          lidar_range=LIDAR_RANGE)
    tr = b.assemble_train([scenes[0], scenes[1]])
    assert tr["agent_mask"][:, 0].all() and not tr["agent_mask"][:, 1:].any()
    te = b.assemble([scenes[0]])
    assert te["transformation_matrix"].shape == (1, 3, 4, 4)
    np.testing.assert_allclose(te["transformation_matrix"][0, 0], np.eye(4),
                               atol=1e-5)


def test_v2xsim_reader_roundtrip(tmp_path, scenes):
    from coalign_tpu.data.fixtures import write_v2xsim_fixture
    from coalign_tpu.data.v2xsim import V2XSIMBaseDataset
    pkl = write_v2xsim_fixture(str(tmp_path / "v2xsim.pkl"), scenes)
    ds = V2XSIMBaseDataset(pkl, train=False, max_cav=5)
    assert len(ds) == 4
    frame, ref = ds[1], scenes[1]
    assert len(frame["agents"]) == 3
    for ag, rg in zip(frame["agents"], ref["agents"]):
        np.testing.assert_allclose(ag["pose"], rg["pose"], atol=1e-3)
        np.testing.assert_allclose(ag["points"], rg["points"], atol=1e-5)
    got, exp = frame["objects"]["boxes"], ref["objects"]["boxes"]
    np.testing.assert_allclose(got[:, :6], exp[:, :6], atol=1e-4)
    dyaw = np.abs(np.mod(got[:, 6] - exp[:, 6] + np.pi, 2 * np.pi) - np.pi)
    assert dyaw.max() < 1e-4


def test_dairv2x_reader_roundtrip(tmp_path, scenes):
    from coalign_tpu.data.dairv2x import DAIRV2XBaseDataset
    from coalign_tpu.data.fixtures import write_dairv2x_fixture
    root = str(tmp_path / "dair")
    split = write_dairv2x_fixture(root, scenes)
    ds = DAIRV2XBaseDataset(root, split, train=False)
    assert len(ds) == 4
    frame, ref = ds[2], scenes[2]
    assert len(frame["agents"]) == 2  # vehicle + infra only
    for ag, rg in zip(frame["agents"], ref["agents"][:2]):
        np.testing.assert_allclose(ag["pose"], rg["pose"], atol=1e-3)
        np.testing.assert_allclose(ag["points"], rg["points"], atol=1e-5)
    got, exp = frame["objects"]["boxes"], ref["objects"]["boxes"]
    np.testing.assert_allclose(got[:, :6], exp[:, :6], atol=1e-3)
    dyaw = np.abs(np.mod(got[:, 6] - exp[:, 6] + np.pi, 2 * np.pi) - np.pi)
    assert dyaw.max() < 1e-3


def test_build_dataset_composition(opv2v_root):
    from coalign_tpu.data import build_dataset
    params = {
        "fusion": {"core_method": "IntermediateFusionDataset"},
        "dataset": "opv2v",
        "root_dir": opv2v_root,
        "train_params": {"max_cav": 3},
        "preprocess": {"cav_lidar_range": list(LIDAR_RANGE)},
        "comm_range": 70,
    }
    base, batcher = build_dataset(params, train=False)
    assert len(base) == 4
    batch = batcher.assemble([base[0]])
    assert batch["points"].shape[0] == 1
    assert batch["agent_mask"].sum() == 3
