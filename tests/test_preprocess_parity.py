"""Preprocessing-TRANSFORM parity vs the reference's own preprocessor.

The pipeline-parity harness (tests/test_pipeline_parity.py) starts from
archives synthesized by this repo's writers; here the archives the repo's
preprocessing CLI writes are diffed field-by-field against what the
reference's imported preprocessor (/root/reference/data_preprocess/
3DMatch_Feature.py) writes from the SAME synthetic fragment .npz trees —
closing the shared-misreading gap VERDICT r3 Missing #3 names: the
feature-NN correspondence build (:158-166), the 0.10 m inlier labels
(:199-204), the jitter + SE(3) augment with gt_pose = aug ∘ I (:115-122),
the FPFH normalization (:300-303), and the test branch's inv(gt.log) pose
(:306-315).

The reference preprocessor is a `__main__` script with hardcoded absolute
paths, so it is executed via runpy on a copy whose path/flag CONSTANTS
(root, out_folder, DATA_FILES, make_training_data) are substituted — every
transform statement runs unmodified. Train-branch randomness is replayed on
both sides through np.random.seed/random.seed (threedmatch_cli
legacy_rng=True draws through the same global stream in the same order).

process_kitti.py is executed the same way (KITTI tests below): module-level
`import open3d` is satisfied by a stub whose FPFH entry points feed
precomputed descriptors (the open3d math itself is out of scope — both
sides consume the SAME features), `from SE3 import *` resolves via
sys.path → /root/reference/utils, and the commented train branch (:49-163)
runs by substituting its own constants (:51-59) into the live test block —
the two blocks are the same statements. Diffed against
kitti_cli.process_archives on shared npz archives: test branch at the
shipped 0.60 m threshold, train branch seed-replayed (jitter + SE(3)
augment + 0.10 m labels + gt = aug ∘ orig_trans).
"""
import os
import pickle
import random as pyrandom
import runpy
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # utils/SE3.py imports torch

from se3_equi_graph_registration_tpu.core import se3_np  # noqa: E402
from se3_equi_graph_registration_tpu.data.preprocess import (  # noqa: E402
    threedmatch_cli)
from se3_equi_graph_registration_tpu.utils.trajectory import (  # noqa: E402
    write_trajectory_log)

REF_SCRIPT = "/root/reference/data_preprocess/3DMatch_Feature.py"
REF_ROOT_LIT = "'/media/eavise3d/新加卷/Datasets/eccv-data-0126/3DMatch'"
REF_OUT_LIT = ("'/media/eavise3d/新加卷/Datasets/eccv-data-0126/3DMatch/"
               "3DMatch_fcgf_feature_test'")
REF_LIST_LIT = ("'/media/eavise3d/新加卷/Datasets/eccv-data-0126/3DMatch/"
                "misc/split/test_3dmatch.txt'")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                               reason="reference preprocessor not present")


def _run_reference(tmp_path, root, out_folder, train=False, list_file=None):
    """Execute the reference preprocessor with ONLY its path/flag constants
    substituted (the transform statements run unmodified)."""
    src = open(REF_SCRIPT, encoding="utf-8").read()
    assert REF_OUT_LIT in src and REF_ROOT_LIT in src and REF_LIST_LIT in src
    src = src.replace(REF_OUT_LIT, repr(str(out_folder)))
    src = src.replace(REF_LIST_LIT, repr(str(list_file or "unused")))
    src = src.replace(REF_ROOT_LIT, repr(str(root)))
    if train:
        flag = "make_training_data = False"
        assert flag in src
        src = src.replace(flag, "make_training_data = True")
    patched = tmp_path / "ref_preprocess.py"
    patched.write_text(src, encoding="utf-8")
    sys.path.insert(0, "/root/reference")  # for `from utils.SE3 import *`
    try:
        runpy.run_path(str(patched), run_name="__main__")
    finally:
        sys.path.remove("/root/reference")


def _synthetic_fragments(rng, n=240, n_frag=3, feat_dim=33, scale=2.0,
                         pose_mag=0.4, aligned=False, corrupt_frac=0.25):
    """Chained fragments: frag k+1 ≈ inv-pose-warped frag k with correlated
    features, so feature-NN correspondences and labels are non-trivial.
    `aligned=True` keeps every fragment in one world frame — the reference's
    TRAIN-branch contract (its pairs come pre-registered; gt_pose = aug ∘ I).
    `corrupt_frac` of each derived fragment's descriptors are redrawn so
    feature-NN picks geometrically wrong targets there: with ~0.32 mean NN
    spacing at this density, a wrong match is an outlier at 0.10 m — both
    label classes occur, or the label diff proves nothing."""
    frags, poses = [], {}
    xyz = rng.uniform(0, scale, (n, 3))
    feat = rng.uniform(0, 1, (n, feat_dim))
    frags.append((xyz, feat))
    for k in range(1, n_frag):
        T = np.eye(4)
        if not aligned:
            T[:3, :3] = se3_np.rotation_matrix(rng, 3, 0.1)
            T[:3, 3] = rng.uniform(-pose_mag, pose_mag, 3)
        # gt_pose maps src (frag k-1) onto tgt (frag k): tgt = T·src + noise
        nxt = se3_np.transform(frags[k - 1][0], T)
        nxt = nxt + rng.normal(0, 0.02, nxt.shape)
        nfeat = frags[k - 1][1] + rng.normal(0, 0.05, (n, feat_dim))
        bad = rng.permutation(n)[:int(corrupt_frac * n)]
        nfeat[bad] = rng.uniform(0, 1, (bad.size, feat_dim))
        # permute so corr is not the identity
        perm = rng.permutation(n)
        frags.append((nxt[perm], nfeat[perm]))
        poses[f"{k - 1}_{k}"] = np.linalg.inv(T)  # gt.log stores tgt→src
    return frags, poses


def _label_safe_mask(pair, threshold=0.10, margin=1e-4):
    """Entries whose GT-warped distance sits away from the inlier threshold
    (float32-vs-float64 intermediate math may flip exact-boundary labels)."""
    corr = np.asarray(pair["corr"], np.int64)
    warped = se3_np.transform(pair["xyz_0"][corr[:, 0]],
                              np.asarray(pair["gt_pose"], np.float64))
    d = np.linalg.norm(warped - pair["xyz_1"][corr[:, 1]], axis=1)
    return np.abs(d - threshold) > margin


def _assert_pairs_match(ref, ours):
    assert ref["file_0"] == ours["file_0"] and ref["file_1"] == ours["file_1"]
    np.testing.assert_array_equal(ref["corr"], ours["corr"])
    assert ours["corr"].dtype == ref["corr"].dtype, (
        ours["corr"].dtype, ref["corr"].dtype)
    for k in ("xyz_0", "xyz_1", "feat_0", "feat_1"):
        np.testing.assert_allclose(np.asarray(ours[k], np.float64),
                                   np.asarray(ref[k], np.float64),
                                   atol=2e-6, rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(ours["gt_pose"], ref["gt_pose"],
                               atol=1e-6, rtol=1e-6)
    mask = _label_safe_mask(ref)
    assert mask.mean() > 0.98, "test data degenerate: too many boundary labels"
    np.testing.assert_array_equal(np.asarray(ref["labels"])[mask],
                                  np.asarray(ours["labels"])[mask])
    assert ours["labels"].dtype == ref["labels"].dtype
    # both label classes must actually occur, or the diff proves nothing
    assert 0 < np.asarray(ref["labels"]).sum() < len(ref["labels"])


@needs_ref
def test_test_branch_matches_reference(tmp_path, rng):
    """Deterministic test branch: fpfh normalization, inv(gt.log) pose,
    feature-NN corr, 0.10 m labels."""
    root = tmp_path / "root"
    scene = "7-scenes-redkitchen"  # first entry of the hardcoded scene_list
    frag_dir = root / "fragments" / scene
    frag_dir.mkdir(parents=True)
    frags, poses = _synthetic_fragments(rng)
    for i, (xyz, feat) in enumerate(frags):
        np.savez(frag_dir / f"cloud_bin_{i}_fpfh.npz", xyz=xyz, feature=feat)
    write_trajectory_log(str(root / "gt_result" / f"{scene}-evaluation"
                             / "gt.log"), poses)
    # the reference loops over all 8 hardcoded scenes: empty gt.logs for the
    # other 7 make those loops vacuous without patching the scene_list
    for other in threedmatch_cli.TEST_SCENES[1:]:
        d = root / "gt_result" / f"{other}-evaluation"
        d.mkdir(parents=True)
        (d / "gt.log").write_text("")

    ref_out = tmp_path / "ref_out"
    _run_reference(tmp_path, root, ref_out)
    ref_pkls = sorted((ref_out / "test_3dmatch").glob("*.pkl"),
                      key=lambda p: int(p.stem))
    assert len(ref_pkls) == len(poses)

    our_out = tmp_path / "our_out"
    n = threedmatch_cli.make_test_pairs(str(root), str(our_out),
                                        descriptor="fpfh")
    assert n == len(poses)

    for i, key in enumerate(poses):  # same scene/key iteration order
        ref = pickle.load(open(ref_pkls[i], "rb"))
        ours = pickle.load(open(our_out / f"{scene}@{key}.pkl", "rb"))
        _assert_pairs_match(ref, ours)


@needs_ref
def test_train_branch_matches_reference(tmp_path, rng):
    """Seed-replayed train branch: 50% src/tgt swap, rand·0.005 jitter on
    both clouds, SE(3) augment of the target (axis 3 / rot 1.0 / trans 0.5),
    gt_pose = aug ∘ I, fcgf (no normalization), 0.10 m labels."""
    root = tmp_path / "root"
    feat_dir = root / "threedmatch_feat"
    feat_dir.mkdir(parents=True)
    frags, _ = _synthetic_fragments(rng, n_frag=5, aligned=True)
    names = []
    for i, (xyz, feat) in enumerate(frags):
        # fcgf branch: unit-normalized descriptors as FCGF emits them
        feat = feat / np.linalg.norm(feat, axis=1, keepdims=True)
        np.savez(feat_dir / f"frag_{i}_fcgf.npz", xyz=xyz, feature=feat)
        names.append(f"frag_{i}.npz")
    pairs_txt = "".join(f"{names[i]} {names[i + 1]} 0.5\n"
                        for i in range(len(names) - 1))
    (root / "threedmatch").mkdir()
    (root / "threedmatch" / "synthscene-0.30.txt").write_text(pairs_txt)
    subset = tmp_path / "subset.txt"
    subset.write_text("synthscene\n")
    pair_list = tmp_path / "pairs.txt"
    pair_list.write_text(pairs_txt)

    seed = 31
    np.random.seed(seed)
    pyrandom.seed(seed)
    ref_out = tmp_path / "ref_out"
    _run_reference(tmp_path, root, ref_out, train=True, list_file=subset)
    ref_pkls = sorted((ref_out / "train_3dmatch").glob("*.pkl"),
                      key=lambda p: int(p.stem))
    assert len(ref_pkls) == len(names) - 1

    np.random.seed(seed)
    pyrandom.seed(seed)
    our_out = tmp_path / "our_out"
    n = threedmatch_cli.make_training_pairs(
        str(feat_dir), str(pair_list), str(our_out), descriptor="fcgf",
        legacy_rng=True, random_swap=True)
    assert n == len(names) - 1

    our_pkls = sorted(our_out.glob("*.pkl"))
    by_files = {(p["file_0"], p["file_1"]): p for p in
                (pickle.load(open(q, "rb")) for q in our_pkls)}
    swaps = 0
    for ref_path in ref_pkls:
        ref = pickle.load(open(ref_path, "rb"))
        ours = by_files[(ref["file_0"], ref["file_1"])]
        swaps += ref["file_0"] > ref["file_1"]
        _assert_pairs_match(ref, ours)
    # the replayed python-random swap must have triggered at least once, or
    # the swap path was never exercised
    assert swaps > 0


# ---------------------------------------------------------------------------
# KITTI: /root/reference/data_preprocess/process_kitti.py executed under parity
# ---------------------------------------------------------------------------

REF_KITTI = "/root/reference/data_preprocess/process_kitti.py"
KITTI_ROOT_LIT = ("'/media/eavise3d/新加卷/Datasets/eccv-data-0126/kitti/"
                  "kitti/dataset'")
KITTI_OUT_LIT = ("'/media/eavise3d/新加卷/Datasets/eccv-data-0126/kitti/"
                 "kitti/dataset/fpfh_test'")

needs_kitti_ref = pytest.mark.skipif(not os.path.exists(REF_KITTI),
                                     reason="reference process_kitti absent")

# live-block constants of the shipped TEST branch (:167-175) → the commented
# TRAIN branch's own constants (:51-59); 4-space indent matches only the
# LIVE statements (the commented twins carry '# ')
_KITTI_TRAIN_SUBS = [
    ("\n    split = 'test'", "\n    split = 'train'"),
    ("\n    augment_axis = 0", "\n    augment_axis = 3"),
    ("\n    augment_rotation = 0.0", "\n    augment_rotation = 1.0"),
    ("\n    augment_translation = 0.0", "\n    augment_translation = 0.5"),
    ("\n    inlier_threshold = 0.60", "\n    inlier_threshold = 0.10"),
]


class _StubPointCloud:
    points = None

    def voxel_down_sample(self, voxel_size):
        pc = _StubPointCloud()     # identity downsample: same points back
        pc.points = self.points
        return pc

    def estimate_normals(self, search_param=None):
        pass


def _open3d_stub(features_by_key):
    """Minimal open3d surface for process_kitti.extract_fpfh_features
    (:14-38): identity voxel_down_sample, no-op normals, and
    compute_fpfh_feature returning PRECOMPUTED descriptors ([33, N] .data,
    keyed by the cloud's float32 bytes) — the open3d math is bypassed, every
    reference statement still executes."""
    o3d = types.ModuleType("open3d")
    o3d.geometry = types.ModuleType("open3d.geometry")
    o3d.utility = types.ModuleType("open3d.utility")
    o3d.pipelines = types.ModuleType("open3d.pipelines")
    o3d.pipelines.registration = types.ModuleType(
        "open3d.pipelines.registration")
    o3d.geometry.PointCloud = _StubPointCloud
    o3d.geometry.KDTreeSearchParamHybrid = lambda **kw: kw
    o3d.utility.Vector3dVector = lambda a: np.asarray(a, np.float64)

    class _Feature:
        def __init__(self, data):
            self.data = data

    def compute_fpfh_feature(pcd, param):
        key = np.asarray(pcd.points, np.float32).tobytes()
        return _Feature(features_by_key[key].T)

    o3d.pipelines.registration.compute_fpfh_feature = compute_fpfh_feature
    return o3d


def _run_reference_kitti(tmp_path, root, out_folder, train=False,
                         descriptor="fpfh", features_by_key=None):
    """Execute process_kitti.py with ONLY path/flag constants substituted."""
    src = open(REF_KITTI, encoding="utf-8").read()
    assert KITTI_ROOT_LIT in src and KITTI_OUT_LIT in src
    src = src.replace(KITTI_OUT_LIT, repr(str(out_folder)))
    src = src.replace(KITTI_ROOT_LIT, repr(str(root)))
    if descriptor != "fpfh":
        live = "\n    descriptor = 'fpfh'"
        assert live in src
        src = src.replace(live, f"\n    descriptor = {descriptor!r}")
    if train:
        for old, new in _KITTI_TRAIN_SUBS:
            assert old in src, old
            src = src.replace(old, new)
    patched = tmp_path / "ref_process_kitti.py"
    patched.write_text(src, encoding="utf-8")
    saved_o3d = sys.modules.get("open3d")
    sys.modules["open3d"] = _open3d_stub(features_by_key or {})
    sys.path.insert(0, "/root/reference/utils")  # for `from SE3 import *`
    try:
        runpy.run_path(str(patched), run_name="__main__")
    finally:
        sys.path.remove("/root/reference/utils")
        sys.modules.pop("SE3", None)
        if saved_o3d is None:
            sys.modules.pop("open3d", None)
        else:
            sys.modules["open3d"] = saved_o3d


def _kitti_archives(data_dir, rng, n_pairs=3, n=200, feat_dim=32,
                    scale=8.0, noise=0.05, corrupt_frac=0.3):
    """FCGF-style .npz pair archives (the process_kitti input contract:
    xyz0/xyz1/features0/features1/gt_trans). LiDAR-like point spacing
    (~1.4 m at this density) so a feature-NN mismatch is a >0.60 m outlier,
    with `corrupt_frac` of the target descriptors redrawn so both label
    classes occur."""
    data_dir.mkdir(parents=True, exist_ok=True)
    clouds = {}
    for k in range(n_pairs):
        xyz0 = rng.uniform(0, scale, (n, 3)).astype(np.float32)
        T = np.eye(4)
        T[:3, :3] = se3_np.rotation_matrix(rng, 3, 0.1)
        T[:3, 3] = rng.uniform(-1.0, 1.0, 3)
        perm = rng.permutation(n)
        xyz1 = (se3_np.transform(xyz0, T)
                + rng.normal(0, noise, (n, 3)))[perm].astype(np.float32)
        f0 = rng.uniform(0, 1, (n, feat_dim))
        f1 = (f0 + rng.normal(0, 0.03, (n, feat_dim)))[perm]
        bad = rng.permutation(n)[:int(corrupt_frac * n)]
        f1[bad] = rng.uniform(0, 1, (bad.size, feat_dim))
        # FCGF descriptors are unit-norm — the reference's NN distance
        # sqrt(2 − 2·fᵀf) (:233) assumes it (goes NaN otherwise)
        f0 = (f0 / np.linalg.norm(f0, axis=1, keepdims=True)).astype(np.float32)
        f1 = (f1 / np.linalg.norm(f1, axis=1, keepdims=True)).astype(np.float32)
        np.savez(data_dir / f"pair_{k}.npz", xyz0=xyz0, xyz1=xyz1,
                 features0=f0, features1=f1, gt_trans=T)
        clouds[f"pair_{k}.npz"] = (xyz0, xyz1)
    return clouds


@needs_kitti_ref
def test_kitti_test_branch_matches_reference(tmp_path, rng):
    """The shipped TEST branch (:165-269), descriptor='fpfh' with the stub
    feeding precomputed descriptors to BOTH sides: the extraction wrapper
    (:192-196 incl. the +1e-6 L2 normalization), the zero-magnitude augment
    (:204-208 — translation_matrix still draws), feature-NN corr (:233-242),
    and the 0.60 m labels (:175, :244-249)."""
    from se3_equi_graph_registration_tpu.data.preprocess import kitti_cli

    root = tmp_path / "root"
    clouds = _kitti_archives(root / "fcgf_test", rng)
    # precomputed "FPFH" descriptors per cloud, correlated across the pair
    feats, by_key = {}, {}
    for name, (xyz0, xyz1) in clouds.items():
        f0 = rng.uniform(0, 10, (len(xyz0), 33)).astype(np.float32)
        f1 = np.empty_like(f0)
        # correlate by geometric nearest neighbor so corr is non-trivial
        d = np.linalg.norm(xyz1[:, None] - xyz0[None], axis=-1)
        f1 = f0[np.argmin(d, axis=1)] + rng.normal(0, 0.2, f0.shape)
        bad = rng.permutation(len(f1))[:len(f1) // 3]
        f1[bad] = rng.uniform(0, 10, (bad.size, 33))
        f1 = f1.astype(np.float32)
        feats[name] = (f0, f1)
        by_key[xyz0.tobytes()] = f0
        by_key[xyz1.tobytes()] = f1

    ref_out = tmp_path / "ref_out"
    _run_reference_kitti(tmp_path, root, ref_out, features_by_key=by_key)
    ref_pkls = sorted((ref_out / "test_kitti").glob("*.pkl"))
    assert len(ref_pkls) == len(clouds)

    def extractor_factory(name):
        def extract(pts, voxel_size):
            key = np.asarray(pts, np.float32).tobytes()
            return np.asarray(pts, np.float32), by_key[key]
        return extract

    our_out = tmp_path / "our_out"
    n = kitti_cli.process_archives(str(root / "fcgf_test"), str(our_out),
                                   split="test", descriptor="fpfh",
                                   feature_extractor=extractor_factory(None))
    assert n == len(clouds)

    ours_by_file = {}
    for p in our_out.glob("*.pkl"):
        rec = pickle.load(open(p, "rb"))
        ours_by_file[rec["file_0"]] = rec
    for ref_path in ref_pkls:
        ref = pickle.load(open(ref_path, "rb"))
        ours = ours_by_file[ref["file_0"]]
        _assert_kitti_pair_matches(ref, ours, threshold=0.60)


@needs_kitti_ref
def test_kitti_train_branch_matches_reference(tmp_path, rng):
    """The commented TRAIN branch (:49-163) executed via its own constants
    substituted into the live block (the statements are identical):
    seed-replayed 0.05 jitter on BOTH clouds (:86-87), SE(3) augment of the
    target (axis 3 / rot 1.0 / trans 0.5, :88-92), gt = aug ∘ orig_trans
    (:92), 0.10 m labels (:59). descriptor='fcgf' (a documented flag value,
    :43) keeps the archive features — the fpfh wrapper is covered by the
    test-branch diff. ONE archive: the reference iterates os.listdir order,
    so a multi-file run could consume the global np.random stream in a
    different file order than ours."""
    from se3_equi_graph_registration_tpu.data.preprocess import kitti_cli

    root = tmp_path / "root"
    _kitti_archives(root / "fcgf_test", rng, n_pairs=1, noise=0.01)

    seed = 47
    np.random.seed(seed)
    ref_out = tmp_path / "ref_out"
    _run_reference_kitti(tmp_path, root, ref_out, train=True,
                         descriptor="fcgf")
    ref_pkls = sorted((ref_out / "test_kitti").glob("*.pkl"))
    assert len(ref_pkls) == 1

    np.random.seed(seed)
    our_out = tmp_path / "our_out"
    n = kitti_cli.process_archives(str(root / "fcgf_test"), str(our_out),
                                   split="train", descriptor="fcgf",
                                   augment_axis=3, augment_rotation=1.0,
                                   augment_translation=0.5, legacy_rng=True)
    assert n == 1

    ref = pickle.load(open(ref_pkls[0], "rb"))
    ours = pickle.load(open(next(our_out.glob("*.pkl")), "rb"))
    # the augment must have actually rotated the target (non-identity)
    assert np.abs(np.asarray(ref["gt_pose"])[:3, :3] - np.eye(3)).max() > 0.1
    _assert_kitti_pair_matches(ref, ours, threshold=0.10)


def _assert_kitti_pair_matches(ref, ours, threshold):
    assert ref["file_0"] == ours["file_0"]
    assert ref["file_1"] == ours["file_1"]
    np.testing.assert_array_equal(ref["corr"], ours["corr"])
    assert ours["corr"].dtype == ref["corr"].dtype
    for k in ("xyz_0", "xyz_1", "feat_0", "feat_1"):
        np.testing.assert_allclose(np.asarray(ours[k], np.float64),
                                   np.asarray(ref[k], np.float64),
                                   atol=2e-6, rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(ours["gt_pose"], ref["gt_pose"],
                               atol=1e-6, rtol=1e-6)
    mask = _label_safe_mask(ref, threshold=threshold)
    assert mask.mean() > 0.98, "degenerate data: too many boundary labels"
    np.testing.assert_array_equal(np.asarray(ref["labels"])[mask],
                                  np.asarray(ours["labels"])[mask])
    # process_kitti labels are `.astype(int)` = int64 (:249), NOT 3DMatch's
    # int32 — the dtype equality is part of the contract
    assert ours["labels"].dtype == ref["labels"].dtype == np.int64
    assert 0 < np.asarray(ref["labels"]).sum() < len(ref["labels"])
