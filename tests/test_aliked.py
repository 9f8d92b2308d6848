"""ALIKED keypoint extractor tests: architecture, DKD detection math,
converter layout round-trip, and pipeline integration.

No pretrained ALIKED weights are reachable in this environment (no network
egress, lightglue not installed), so correctness is established at the
architecture level: dense-map shapes/invariants, NMS + soft-argmax against a
numpy oracle on synthetic score maps, and a converter round-trip from a
torch-layout state_dict built in the test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pi3_slam_tpu.models.aliked import (
    ALIKEDConfig,
    CONFIGS,
    aliked_dense_maps,
    aliked_extract,
    detect_keypoints,
    init_aliked_params,
    upsample_bilinear,
)

TINY = ALIKEDConfig(c1=4, c2=8, c3=16, c4=32, dim=32, kernel_size=3, n_pos=4)


@pytest.fixture(scope="module")
def tiny_params():
    return init_aliked_params(0, TINY)


def test_dense_maps_shapes_and_invariants(tiny_params):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 3, 64, 96)).astype(np.float32))
    feats, score = aliked_dense_maps(tiny_params, imgs, TINY)
    assert feats.shape == (2, 64, 96, TINY.dim)
    assert score.shape == (2, 64, 96)
    # feature map is L2-normalized per pixel; score map is a sigmoid
    norms = np.linalg.norm(np.asarray(feats), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    s = np.asarray(score)
    assert (s > 0).all() and (s < 1).all()


def test_upsample_matches_torch_align_corners():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample_bilinear(jnp.asarray(x), (20, 28)))
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(20, 28),
            mode="bilinear",
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_detect_keypoints_finds_planted_peaks():
    H, W = 48, 64
    score = np.full((1, H, W), 0.01, np.float32)
    peaks = [(10, 20), (30, 40), (40, 10)]
    for y, x in peaks:
        score[0, y, x] = 0.9
        score[0, y, x + 1] = 0.5  # shoulder pulls soft-argmax toward +x
    det = detect_keypoints(jnp.asarray(score), max_keypoints=8, threshold=0.1)
    kp = np.asarray(det["keypoints"][0])
    valid = np.asarray(det["valid"][0])
    assert valid.sum() == len(peaks)
    got = kp[valid]
    for y, x in peaks:
        d = np.min(np.linalg.norm(got - np.array([x, y]), axis=1))
        assert d < 1.0, (y, x, got)
    # sub-pixel: the shoulder shifts the refined x strictly above the integer
    row = got[np.argmin(np.abs(got[:, 1] - 10))]
    assert row[0] > 20.0


def test_detect_keypoints_nms_suppresses_neighbors():
    score = np.full((1, 32, 32), 0.0, np.float32)
    score[0, 16, 16] = 0.9
    score[0, 16, 17] = 0.8  # within NMS radius of the stronger peak
    det = detect_keypoints(jnp.asarray(score), max_keypoints=4, nms_radius=2, threshold=0.1)
    assert int(np.asarray(det["valid"]).sum()) == 1


def test_full_extract_contract(tiny_params):
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
    out = aliked_extract(tiny_params, imgs, TINY, max_keypoints=50)
    assert out["keypoints"].shape == (2, 50, 2)
    assert out["descriptors"].shape == (2, 50, TINY.dim)
    assert out["scores"].shape == (2, 50)
    assert out["valid"].shape == (2, 50)
    desc = np.asarray(out["descriptors"])
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-3)
    kp = np.asarray(out["keypoints"])
    assert (kp[..., 0] >= 0).all() and (kp[..., 0] <= 63).all()
    assert (kp[..., 1] >= 0).all() and (kp[..., 1] <= 63).all()


def _torch_layout_state_dict(cfg: ALIKEDConfig, seed=3):
    """Build a state_dict with the lightglue ALIKED key layout + torch
    OIHW conv shapes (no torch needed — numpy arrays)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, cout, cin, k, bias=False):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    def block(name, cin, cout, res):
        conv(f"{name}.conv1", cout, cin, 3)
        bn(f"{name}.bn1", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        bn(f"{name}.bn2", cout)
        if res:
            conv(f"{name}.downsample", cout, cin, 1, bias=True)

    block("block1", 3, cfg.c1, res=False)
    block("block2", cfg.c1, cfg.c2, res=True)
    block("block3", cfg.c2, cfg.c3, res=True)
    block("block4", cfg.c3, cfg.c4, res=True)
    d4 = cfg.dim // 4
    conv("conv1", d4, cfg.c1, 1)
    conv("conv2", d4, cfg.c2, 1)
    conv("conv3", d4, cfg.c3, 1)
    conv("conv4", d4, cfg.dim, 1)
    conv("score_head.0", 8, cfg.dim, 1, bias=True)
    sd["score_head.2.weight"] = rng.standard_normal((4, 8, 3, 3)).astype(np.float32) * 0.1
    sd["score_head.2.bias"] = np.zeros(4, np.float32)
    sd["score_head.4.weight"] = rng.standard_normal((4, 4, 3, 3)).astype(np.float32) * 0.1
    sd["score_head.4.bias"] = np.zeros(4, np.float32)
    sd["score_head.6.weight"] = rng.standard_normal((1, 4, 3, 3)).astype(np.float32) * 0.1
    sd["score_head.6.bias"] = np.zeros(1, np.float32)
    M = cfg.n_pos
    sd["desc_head.offset_conv.0.weight"] = (
        rng.standard_normal((2 * M, cfg.dim, cfg.kernel_size, cfg.kernel_size)).astype(np.float32) * 0.1
    )
    sd["desc_head.offset_conv.0.bias"] = np.zeros(2 * M, np.float32)
    sd["desc_head.offset_conv.2.weight"] = (
        rng.standard_normal((2 * M, 2 * M, 1, 1)).astype(np.float32) * 0.1
    )
    sd["desc_head.offset_conv.2.bias"] = np.zeros(2 * M, np.float32)
    sd["desc_head.sf_conv.weight"] = (
        rng.standard_normal((cfg.dim, cfg.dim, 1, 1)).astype(np.float32) * 0.1
    )
    sd["desc_head.agg_weights"] = rng.standard_normal((M, cfg.dim, cfg.dim)).astype(np.float32) * 0.1
    return sd


def test_converter_roundtrip_and_runs(tmp_path):
    from pi3_slam_tpu.models.convert import (
        convert_aliked_state_dict,
        load_params_npz,
        save_params_npz,
    )

    sd = _torch_layout_state_dict(TINY)
    params = convert_aliked_state_dict(sd, model_name="aliked-n16")
    path = str(tmp_path / "aliked.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    assert str(loaded.pop("_model_name")) == "aliked-n16"

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(size=(1, 3, 48, 48)).astype(np.float32))
    out = aliked_extract(loaded, imgs, TINY, max_keypoints=20)
    assert np.isfinite(np.asarray(out["descriptors"])).all()


def test_converter_rejects_unknown_keys():
    from pi3_slam_tpu.models.convert import convert_aliked_state_dict

    sd = _torch_layout_state_dict(TINY)
    sd["desc_head.unexpected_new_layer.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unmatched"):
        convert_aliked_state_dict(sd)


def test_factory_returns_aliked_with_weights(tmp_path):
    from pi3_slam_tpu.models.convert import convert_aliked_state_dict, save_params_npz
    from pi3_slam_tpu.utils.keypoints import ALIKEDExtractor, create_keypoint_extractor

    path = str(tmp_path / "a.npz")
    save_params_npz(path, convert_aliked_state_dict(_torch_layout_state_dict(TINY)))
    ex = create_keypoint_extractor(
        "aliked", max_num_keypoints=30, aliked_checkpoint_path=path
    )
    assert isinstance(ex, ALIKEDExtractor)
    # missing weights -> grid fallback with a warning (never silent None)
    ex2 = create_keypoint_extractor("aliked", max_num_keypoints=30)
    from pi3_slam_tpu.utils.keypoints import GridKeypointExtractor

    assert isinstance(ex2, GridKeypointExtractor)


def test_extractor_pipeline_contract(tmp_path):
    """ALIKEDExtractor plugs into the chunk pipeline: fixed-K per-frame
    keypoints + colors."""
    from pi3_slam_tpu.models.convert import convert_aliked_state_dict, save_params_npz
    from pi3_slam_tpu.utils.keypoints import ALIKEDExtractor

    path = str(tmp_path / "a.npz")
    save_params_npz(path, convert_aliked_state_dict(_torch_layout_state_dict(TINY)))
    ex = ALIKEDExtractor(path, max_num_keypoints=25)
    # config comes from _model_name (n16) but TINY weights: override cfg
    ex.cfg = TINY
    rng = np.random.default_rng(5)
    imgs = rng.uniform(size=(3, 3, 48, 64)).astype(np.float32)
    out = ex.extract_with_colors(imgs)
    assert out["keypoints"].shape == (3, 25, 2)
    assert out["colors"].shape == (3, 25, 3) and out["colors"].dtype == np.uint8


@pytest.mark.slow
def test_offline_creator_with_aliked(tmp_path):
    """End-to-end: chunk creation with learned per-frame keypoints, then
    reconstruction (ALIKED keypoints are deterministic per image, so overlap
    frames still match across chunks)."""
    import glob
    import os

    from PIL import Image

    from pi3_slam_tpu.models.convert import convert_aliked_state_dict, save_params_npz
    from pi3_slam_tpu.slam import (
        OfflineChunkCreator,
        OfflineCreatorConfig,
        OfflineReconstructor,
        ReconstructorConfig,
    )
    from pi3_slam_tpu.utils.keypoints import ALIKEDExtractor
    from test_pi3_model import TINY as PI3_TINY, make_tiny_params

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(6)
    base = rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    for i in range(6):
        Image.fromarray(np.roll(base, 3 * i, axis=1)).save(d / f"f_{i:03d}.png")

    wpath = str(tmp_path / "aliked.npz")
    save_params_npz(wpath, convert_aliked_state_dict(_torch_layout_state_dict(TINY)))

    out = str(tmp_path / "chunks")
    cfg = OfflineCreatorConfig(
        output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
        use_metric_depth=False, keypoint_type="aliked",
        aliked_checkpoint_path=wpath, max_keypoints=20, compute_dtype="float32",
    )
    creator = OfflineChunkCreator(cfg, pi3_config=PI3_TINY)
    creator.params = make_tiny_params()
    assert isinstance(creator.keypoint_extractor, ALIKEDExtractor)
    creator.keypoint_extractor.cfg = TINY  # tiny test weights
    paths = sorted(glob.glob(os.path.join(str(d), "*.png")))
    saved = creator.process_and_save(paths)
    assert len(saved) == 3  # windows (0,4),(2,6),(4,6)
    z = np.load(saved[0])
    kp = z["keypoints"].astype(np.float32)
    assert kp.shape == (4, 20, 2)
    # per-frame learned keypoints differ across frames (unlike the grid)
    assert not np.allclose(kp[0], kp[1])
    # the validity mask and descriptors are persisted for track gating and
    # feature-based cross-chunk matching
    assert z["keypoint_valid"].shape == (4, 20) and z["keypoint_valid"].dtype == np.bool_
    assert z["descriptors"].shape == (4, 20, TINY.dim)
    assert z["descriptors"].dtype == np.float16

    rec = OfflineReconstructor(
        ReconstructorConfig(chunk_dir=out, output_dir=str(tmp_path / "rec"), ba_iterations=2)
    )
    result = rec.run()
    assert len(result["reconstructions"]) == 3
    r0 = result["reconstructions"][0]
    # descriptors thread into the reconstruction; invalid slots become dead tracks
    assert r0.track_desc is not None and r0.track_desc.shape[1] == TINY.dim
    valid0 = z["keypoint_valid"].reshape(-1)
    assert (r0.track_valid[~valid0] == 0).all()
    # dp-group path carries the same ALIKED artifacts per chunk
    import jax

    if len(jax.devices()) >= 2:
        out_dp = str(tmp_path / "chunks_dp")
        cfg_dp = OfflineCreatorConfig(
            output_dir=out_dp, chunk_length=4, overlap=2, pixel_limit=4000,
            use_metric_depth=False, keypoint_type="aliked",
            aliked_checkpoint_path=wpath, max_keypoints=20,
            compute_dtype="float32", data_parallel_chunks=2,
        )
        creator_dp = OfflineChunkCreator(cfg_dp, pi3_config=PI3_TINY)
        creator_dp.params = make_tiny_params()
        creator_dp.keypoint_extractor.cfg = TINY
        saved_dp = creator_dp.process_and_save(paths)
        zdp = np.load(saved_dp[0])
        assert zdp["keypoint_valid"].shape == (4, 20)
        assert zdp["descriptors"].shape == (4, 20, TINY.dim)
        np.testing.assert_array_equal(
            zdp["keypoint_valid"], z["keypoint_valid"]
        )

    # cross-chunk matching finds the overlap tracks through the learned
    # keypoints (position join + descriptor mutual-NN union). Matching is
    # checked pre-BA: with random Pi3 weights the geometry is noise, so
    # outlier pruning legitimately kills every track post-BA.
    from pi3_slam_tpu.sfm.alignment import find_common_tracks
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
    from pi3_slam_tpu.slam.offline_reconstructor import load_chunk_npz

    ra = build_chunk_reconstruction(load_chunk_npz(saved[0]), run_ba=False)
    rb = build_chunk_reconstruction(load_chunk_npz(saved[1]), run_ba=False)
    ids_a, ids_b = find_common_tracks(ra, rb)
    assert ids_a.size > 0
    # matched tracks live in the 2-frame overlap and share pixel positions
    np.testing.assert_allclose(ra.track_uv[ids_a], rb.track_uv[ids_b], atol=1e-3)
