"""End-to-end pipeline tests: chunk creation -> reconstruction -> exports,
and the online streaming mode — tiny model, synthetic images."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pi3_slam_tpu.models import Pi3Config
from pi3_slam_tpu.slam import (
    OfflineChunkCreator,
    OfflineCreatorConfig,
    OfflineReconstructor,
    ReconstructorConfig,
    Pi3SLAMOnline,
    OnlineConfig,
)
from test_pi3_model import TINY, make_tiny_params


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(5)
    base = rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    for i in range(8):
        img = np.roll(base, shift=3 * i, axis=1)  # simple horizontal motion
        Image.fromarray(img).save(d / f"frame_{i:04d}.png")
    return str(d)


def _tiny_creator(output_dir) -> OfflineChunkCreator:
    cfg = OfflineCreatorConfig(
        output_dir=output_dir,
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        max_keypoints=40,
        compute_dtype="float32",
        num_loader_workers=2,
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    return creator


def test_offline_chunks_then_reconstruct(image_dir, tmp_path):
    out = str(tmp_path / "chunks_out")
    creator = _tiny_creator(out)
    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    saved = creator.process_and_save(paths)
    assert len(saved) == 4  # windows (0,4),(2,6),(4,8),(6,8)

    # artifact contract
    assert os.path.exists(os.path.join(out, "chunks_manifest.json"))
    meta = json.load(open(os.path.join(out, "chunk_metadata.json")))
    assert meta["chunk_length"] == 4 and meta["overlap"] == 2
    z = np.load(saved[0], allow_pickle=False)
    for key in ["points", "local_points", "conf", "masks", "keypoints", "colors",
                "camera_poses", "camera_poses_cw", "intrinsics", "image_paths"]:
        assert key in z.files, key
    assert z["points"].dtype == np.float16
    n, k = z["keypoints"].shape[:2]
    assert n == 4 and k <= 40
    assert z["camera_poses"].shape == (4, 4, 4)

    # reconstruct
    recon_out = str(tmp_path / "recon_out")
    rec = OfflineReconstructor(
        ReconstructorConfig(chunk_dir=out, output_dir=recon_out, ba_iterations=3)
    )
    result = rec.run()
    assert len(result["reconstructions"]) == 4
    for art in result["artifacts"].values():
        assert os.path.exists(art)

    # trajectory: 8 unique frames after dedup
    from pi3_slam_tpu.io import read_tum_trajectory

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    assert traj["positions"].shape == (8, 3)

    # point cloud non-empty and finite
    from pi3_slam_tpu.io import read_ply

    cloud = read_ply(result["artifacts"]["points"])
    assert np.isfinite(cloud["xyz"]).all()


def test_online_mode(image_dir, tmp_path):
    cfg = OnlineConfig(
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        max_keypoints=30,
        compute_dtype="float32",
        output_dir=str(tmp_path / "online"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()

    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    result = slam.process_image_paths(paths)
    assert result["num_chunks"] == 4
    assert result["num_frames"] == 14  # 4+4+4+2 (overlap frames processed twice)

    ply = str(tmp_path / "online" / "final_points.ply")
    tum = str(tmp_path / "online" / "trajectory_tum.txt")
    os.makedirs(os.path.dirname(ply), exist_ok=True)
    slam.save_final_result(ply)
    slam.save_trajectory_tum(tum)
    from pi3_slam_tpu.io import read_tum_trajectory

    assert read_tum_trajectory(tum)["positions"].shape == (8, 3)


def test_cli_argument_errors(tmp_path):
    import create_offline_chunks as cli

    rc = cli.main(["--images", str(tmp_path / "nonexistent_dir_xyz"), "--output", str(tmp_path)])
    assert rc == 2

    import pi3_slam_online as ocli

    rc = ocli.main(["--output", str(tmp_path)])  # neither images nor video
    assert rc == 2


def test_dense_chunks_keypoints_none(image_dir, tmp_path):
    out = str(tmp_path / "dense_out")
    cfg = OfflineCreatorConfig(
        output_dir=out,
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        keypoint_type="none",
        compute_dtype="float32",
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:4]
    saved = creator.process_and_save(paths)
    z = np.load(saved[0])
    assert bool(z["dense"])
    assert "local_points_dense" in z.files
    assert z["local_points_dense"].dtype == np.float16
    assert z["local_points_dense"].shape[0] == 4  # N frames, dense H x W x 3
    assert z["local_points_dense"].ndim == 4
    # rgb is recomputed host-side from the inputs (never pulled from device);
    # the world map is not stored at all (dense_world_points recomputes it)
    assert z["rgb_dense"].dtype == np.uint8
    assert "points_dense" not in z.files
    assert "keypoints" not in z.files


def test_online_sync_mode_matches_pipelined(image_dir, tmp_path):
    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:6]
    results = []
    for pipelined in (True, False):
        cfg = OnlineConfig(
            chunk_length=3, overlap=1, pixel_limit=4000, use_metric_depth=False,
            max_keypoints=20, compute_dtype="float32",
            output_dir=str(tmp_path / f"m{pipelined}"),
        )
        slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
        slam.params = make_tiny_params()
        r = slam.process_image_paths(paths, pipelined=pipelined)
        results.append((r, slam))
    assert results[0][0]["num_chunks"] == results[1][0]["num_chunks"]
    # identical trajectories regardless of drive mode
    t_a = results[0][1]._merged_trajectory()[0]
    t_b = results[1][1]._merged_trajectory()[0]
    np.testing.assert_allclose(t_a, t_b, atol=1e-5)
    status = results[0][1].queue_status()
    assert status["chunks_consumed"] == results[0][0]["num_chunks"]


def test_offline_creator_chunk_dp(image_dir, tmp_path):
    """Chunk-data-parallel creator on the virtual CPU mesh matches the
    single-chip path's chunk artifacts."""
    import glob
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))

    outs = {}
    for dp in (1, 2):
        out = str(tmp_path / f"dp{dp}")
        cfg = OfflineCreatorConfig(
            output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
            use_metric_depth=False, max_keypoints=30, compute_dtype="float32",
            data_parallel_chunks=dp,
        )
        creator = OfflineChunkCreator(cfg, pi3_config=TINY)
        creator.params = make_tiny_params()
        if dp > 1 and creator.mesh is None:
            import pytest

            pytest.skip("mesh unavailable")
        outs[dp] = creator.process_and_save(paths)

    assert len(outs[1]) == len(outs[2])
    for p1, p2 in zip(outs[1], outs[2]):
        z1, z2 = np.load(p1), np.load(p2)
        np.testing.assert_allclose(
            z1["camera_poses"], z2["camera_poses"], atol=2e-4
        )
        np.testing.assert_allclose(
            z1["points"].astype(np.float32), z2["points"].astype(np.float32), atol=2e-2
        )


def test_online_chunk_dp_matches_single(image_dir, tmp_path):
    """Online chunk-data-parallel mode on the virtual CPU mesh produces the
    same trajectory as the single-device pipelined mode."""
    import glob
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    slams = []
    for dp in (1, 2):
        cfg = OnlineConfig(
            chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
            max_keypoints=20, compute_dtype="float32",
            output_dir=str(tmp_path / f"odp{dp}"), data_parallel_chunks=dp,
        )
        slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
        slam._host_params = make_tiny_params()
        slam.params = slam._host_params
        slam._make_steps()  # re-shard the tiny params in dp mode
        r = slam.process_image_paths(paths)
        assert r["num_chunks"] == 4
        slams.append(slam)

    t1 = slams[0]._merged_trajectory()[0]
    t2 = slams[1]._merged_trajectory()[0]
    np.testing.assert_allclose(t1, t2, atol=1e-4)

    status = slams[1].queue_status()
    assert status["chunks_produced"] == 4
    assert status["chunks_consumed"] == 4
    assert status["chunks_inflight"] == 0
    assert status["data_parallel_chunks"] == 2


def test_online_dp_group_pipeline_overlap(image_dir, tmp_path):
    """The multi-chip online path pipelines 1-deep: group k+1's sharded step
    is dispatched (device outputs still in flight) BEFORE group k is
    materialized and consumed — the reference's producer/consumer overlap
    (slam/online_reconstructor.py:761-954)."""
    import glob
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=20, compute_dtype="float32",
        output_dir=str(tmp_path / "dp_pipe"), data_parallel_chunks=2,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam._host_params = make_tiny_params()
    slam.params = slam._host_params
    slam._make_steps()

    events = []
    orig_dispatch = slam._dispatch_group
    orig_finish = slam._finish_group

    def spy_dispatch(group, dp):
        out = orig_dispatch(group, dp)
        # deferred materialization: outputs are still device arrays
        assert all(isinstance(v, jax.Array) for v in out["dev"].values())
        events.append(("dispatch", out["n_real"]))
        return out

    def spy_finish(pg):
        events.append(("finish", pg["n_real"]))
        return orig_finish(pg)

    slam._dispatch_group = spy_dispatch
    slam._finish_group = spy_finish

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    r = slam.process_image_paths(paths)
    assert r["num_chunks"] == 4
    kinds = [k for k, _ in events]
    assert kinds.count("dispatch") == kinds.count("finish")
    # overlap: the second dispatch happens before the first finish
    assert kinds.index("dispatch", kinds.index("dispatch") + 1) < kinds.index("finish")
    assert slam.queue_status()["chunks_consumed"] == 4

    # pipelined=False must be strictly serial even on the dp path: every
    # dispatch is finished before the next dispatch
    cfg2 = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=20, compute_dtype="float32",
        output_dir=str(tmp_path / "dp_sync"), data_parallel_chunks=2,
    )
    slam2 = Pi3SLAMOnline(cfg2, pi3_config=TINY)
    slam2._host_params = make_tiny_params()
    slam2.params = slam2._host_params
    slam2._make_steps()
    events2 = []
    od, of = slam2._dispatch_group, slam2._finish_group
    slam2._dispatch_group = lambda g, dp: (events2.append("D"), od(g, dp))[1]
    slam2._finish_group = lambda pg: (events2.append("F"), of(pg))[1]
    slam2.process_image_paths(paths, pipelined=False)
    for i in range(0, len(events2), 2):
        assert events2[i] == "D" and events2[i + 1] == "F", events2


def test_online_overlap_defers_materialization(image_dir, tmp_path):
    """With overlap_device_host the dispatch stage must NOT materialize device
    outputs (np.asarray happens at consume) — the in-flight forward is the
    whole infer/recon overlap."""
    import glob
    import jax

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=20, compute_dtype="float32",
        output_dir=str(tmp_path / "ov"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:4]
    from pi3_slam_tpu.data import ChunkDataset, calculate_target_size

    target = calculate_target_size(paths[0], cfg.pixel_limit)
    ds = ChunkDataset(paths, 4, 2, target)
    item = slam._dispatch_device(ds[0])
    assert all(isinstance(v, jax.Array) for v in item["dev"].values())
    slam._consume(item)
    assert slam.queue_status()["chunks_consumed"] == 1


def test_dense_chunk_reconstruct_fails_clearly(image_dir, tmp_path):
    out = str(tmp_path / "dense_rec")
    cfg = OfflineCreatorConfig(
        output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
        use_metric_depth=False, keypoint_type="none", compute_dtype="float32",
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:4]
    saved = creator.process_and_save(paths)

    from pi3_slam_tpu.slam.offline_reconstructor import load_chunk_npz

    with pytest.raises(ValueError, match="keypoints"):
        load_chunk_npz(saved[0])


def test_dp_group_crash_recovery(image_dir, tmp_path):
    """A device runtime failure inside the sharded group step resets the
    backend and retries (the single-chunk path already does this)."""
    import glob
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    out = str(tmp_path / "dp_rec")
    cfg = OfflineCreatorConfig(
        output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
        use_metric_depth=False, max_keypoints=20, compute_dtype="float32",
        data_parallel_chunks=2,
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    creator._host_params = creator.params

    real = creator._dispatch_group
    calls = {"n": 0}

    def flaky(batches):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("TPU worker crashed: UNAVAILABLE")
        return real(batches)

    creator._dispatch_group = flaky
    recovered = {"n": 0}
    orig_recover = creator._recover_backend

    def recover():
        recovered["n"] += 1
        creator.params = creator._host_params
        creator._step_cache.clear()

    creator._recover_backend = recover
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    saved = creator.process_and_save(paths)
    assert recovered["n"] == 1
    assert calls["n"] >= 2
    assert len(saved) == 4


def test_profile_dir_captures_trace(image_dir, tmp_path):
    """--profile-dir wraps one steady-state chunk in a jax.profiler trace."""
    import glob

    out = str(tmp_path / "prof_out")
    cfg = OfflineCreatorConfig(
        output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
        use_metric_depth=False, max_keypoints=20, compute_dtype="float32",
        profile_dir=str(tmp_path / "trace"),
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    saved = creator.process_and_save(paths)
    assert len(saved) == 4  # profiling chunk still produced its artifact
    import pathlib

    trace_files = list(pathlib.Path(tmp_path / "trace").rglob("*"))
    assert any(f.is_file() for f in trace_files)  # something was captured

    # dp path: --profile-dir captures the 2nd (steady-state) group
    import jax

    if len(jax.devices()) >= 2:
        cfg_dp = OfflineCreatorConfig(
            output_dir=str(tmp_path / "prof_dp"), chunk_length=4, overlap=2,
            pixel_limit=4000, use_metric_depth=False, max_keypoints=20,
            compute_dtype="float32", data_parallel_chunks=2,
            profile_dir=str(tmp_path / "trace_dp"),
        )
        creator_dp = OfflineChunkCreator(cfg_dp, pi3_config=TINY)
        creator_dp.params = make_tiny_params()
        saved_dp = creator_dp.process_and_save(paths)
        assert len(saved_dp) == 4
        dp_files = list(pathlib.Path(tmp_path / "trace_dp").rglob("*"))
        assert any(f.is_file() for f in dp_files)


def test_online_async_sfm_consumer_thread(image_dir, tmp_path):
    """With async_sfm (default) the SfM chain runs off the drive thread as a
    two-stage pipeline — build (materialize+recon) on the 'sfm-build'
    executor, finish (align+append) on the 'sfm-consumer' thread — and the
    results match the synchronous path exactly (online.py _consumer_loop)."""
    import glob
    import threading

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:6]
    runs = {}
    for async_sfm in (True, False):
        cfg = OnlineConfig(
            chunk_length=3, overlap=1, pixel_limit=4000, use_metric_depth=False,
            max_keypoints=20, compute_dtype="float32", async_sfm=async_sfm,
            output_dir=str(tmp_path / f"as{async_sfm}"),
        )
        slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
        slam.params = make_tiny_params()
        build_orig, finish_orig = slam._consume_build, slam._consume_finish
        build_threads, finish_threads = [], []

        def build_spy(item, idx=None, _o=build_orig, _t=build_threads):
            _t.append(threading.current_thread().name)
            return _o(item, idx)

        def finish_spy(ctx, _o=finish_orig, _t=finish_threads):
            _t.append(threading.current_thread().name)
            return _o(ctx)

        slam._consume_build = build_spy
        slam._consume_finish = finish_spy
        r = slam.process_image_paths(paths)
        runs[async_sfm] = (r, slam._merged_trajectory()[0], build_threads, finish_threads)
    assert all(t.startswith("sfm-build") for t in runs[True][2])
    assert all(t == "sfm-consumer" for t in runs[True][3])
    assert all(t == "MainThread" for t in runs[False][2] + runs[False][3])
    assert runs[True][0]["num_chunks"] == runs[False][0]["num_chunks"]
    np.testing.assert_allclose(runs[True][1], runs[False][1], atol=1e-5)


def test_online_async_consume_crash_recovery(image_dir, tmp_path):
    """A backend crash inside the consumer thread parks it; the drive thread
    redoes the chunk's forward serially and the run completes with the chunk
    chain intact and in order (online.py recover_and_redo)."""
    import glob

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=20, compute_dtype="float32",
        output_dir=str(tmp_path / "async_crash"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    real_finish = slam._consume_finish
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] == 2:  # second chunk dies at the finish stage, while
            # the third chunk's build may already be in flight (park path
            # hands BOTH back to the drive thread)
            raise RuntimeError("TPU worker crashed: UNAVAILABLE")
        return real_finish(ctx)

    slam._consume_finish = flaky
    recovered = {"n": 0}

    def recover():
        recovered["n"] += 1
        slam._upload_cache.reset()
        slam.params = make_tiny_params()
        slam._make_steps()

    slam._recover_backend = recover
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    result = slam.process_image_paths(paths)
    assert recovered["n"] == 1
    assert calls["n"] == 5  # 4 chunks + 1 redo
    assert result["num_chunks"] == 4
    assert result["num_frames"] == 14
    assert slam._merged_trajectory()[0].shape == (8, 3)


def test_online_post_append_side_effect_failure_no_duplicate(image_dir, tmp_path):
    """An exception in the observability tail of _consume_finish (viewer
    update / debug saves / live-mesh tick) fires AFTER the chunk was appended
    to the chain; it must be swallowed, not 'recovered' — recovery would
    re-consume the item and append the chunk a SECOND time, silently
    duplicating its frames in the merged trajectory. Reference semantics:
    debug/viz errors are printed and skipped (online_reconstructor.py:877-879)."""
    import glob

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=20, compute_dtype="float32",
        output_dir=str(tmp_path / "tail_crash"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()

    class ExplodingViz:
        calls = 0

        def update(self, recon, frame=None, keypoints=None):
            ExplodingViz.calls += 1
            raise RuntimeError("TPU worker crashed: UNAVAILABLE")

    slam.visualizer = ExplodingViz()
    recovered = {"n": 0}
    real_recover = slam._recover_backend

    def counting_recover():
        recovered["n"] += 1
        real_recover()

    slam._recover_backend = counting_recover
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    result = slam.process_image_paths(paths)

    assert ExplodingViz.calls == 4  # fired (and was swallowed) on every chunk
    assert recovered["n"] == 0  # swallowed, NOT routed through crash recovery
    assert result["num_chunks"] == 4
    assert len(slam.reconstructions) == 4  # each chunk appended exactly once
    names = [n for r in slam.reconstructions for n in r.frame_names]
    # windows (0,4),(2,6),(4,8),(6,8): every frame at most twice (overlap),
    # and the merged trajectory has each of the 8 frames exactly once
    assert max(names.count(n) for n in set(names)) <= 2
    traj, _, traj_names = slam._merged_trajectory(return_names=True)
    assert traj.shape == (8, 3)
    assert len(set(traj_names)) == len(traj_names) == 8


def test_online_debug_overlap_dump(image_dir, tmp_path):
    """--debug-overlap appends one JSON line per alignment with overlap frame
    ids and common-track stats (reference _debug_print_overlap_indices)."""
    import glob

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=12, compute_dtype="float32",
        output_dir=str(tmp_path / "ovl"), debug_overlap=True,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:6]
    r = slam.process_image_paths(paths)
    assert r["num_chunks"] == 3  # windows (0,4),(2,6),(4,6)

    dump = tmp_path / "ovl" / "overlap_debug.jsonl"
    assert dump.exists()
    lines = [json.loads(ln) for ln in dump.read_text().splitlines()]
    assert len(lines) == 2  # one line per alignment
    e = lines[0]
    assert e["num_common_frames"] == 2  # overlap=2 shared frames by name
    assert e["overlap"] == 2 and e["chunk_length"] == 4
    assert e["prev_overlap_frames"] == e["cur_overlap_frames"]
    assert e["num_points"] > 0 and np.isfinite(e["mean_conf"])


@pytest.mark.slow
def test_tail_chunk_padding_single_compile(image_dir, tmp_path):
    """Short tail chunks are padded to chunk_length on the device and sliced
    back, so the jitted step compiles exactly ONE (N, H, W) program (SURVEY
    §7 hard part (c); compiles cost minutes on the remote-TPU cache path).
    pad_tail_chunks=False keeps the per-shape compile behavior."""
    import glob

    from pi3_slam_tpu.slam.offline_reconstructor import load_chunk_npz

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))

    out = str(tmp_path / "padded")
    creator = _tiny_creator(out)
    creator.process_and_save(paths)  # windows (0,4),(2,6),(4,8),(6,8)
    assert creator._get_step()._cache_size() == 1
    tail = load_chunk_npz(sorted(glob.glob(os.path.join(out, "chunks", "*.npz")))[-1])
    assert tail["camera_poses"].shape[0] == 2  # real frames only
    assert tail["points"].shape[0] == 2 and len(tail["image_paths"]) == 2

    out2 = str(tmp_path / "unpadded")
    creator2 = _tiny_creator(out2)
    creator2.config.pad_tail_chunks = False
    creator2.process_and_save(paths)
    assert creator2._get_step()._cache_size() == 2  # (4,...) and (2,...)
    tail2 = load_chunk_npz(sorted(glob.glob(os.path.join(out2, "chunks", "*.npz")))[-1])
    assert tail2["camera_poses"].shape[0] == 2


def test_online_tail_padding_single_compile(image_dir, tmp_path):
    """Online mode pads tail chunks the same way; reconstructions keep the
    real frame count and alignment still sees the leading overlap frames."""
    import glob

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=12, compute_dtype="float32",
        output_dir=str(tmp_path / "online_pad"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    r = slam.process_image_paths(paths)
    assert r["num_chunks"] == 4
    assert slam.step._cache_size() == 1
    assert [rec.num_frames for rec in slam.reconstructions] == [4, 4, 4, 2]
    for rec in slam.reconstructions:  # sliced outputs stay self-consistent
        assert rec.points.shape[0] == rec.num_frames * 12


def test_online_save_debug_recons(image_dir, tmp_path):
    """--save-debug-recons writes each chunk's aligned reconstruction
    (reference --save_chunk_reconstructions analog) as a loadable npz."""
    import glob

    from pi3_slam_tpu.sfm.serialization import load_reconstruction

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=12, compute_dtype="float32",
        output_dir=str(tmp_path / "dbg"), save_debug_recons=True,
        conf_threshold=0.2,  # exercise the config-wired threshold
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:6]
    r = slam.process_image_paths(paths)
    files = sorted(glob.glob(str(tmp_path / "dbg" / "debug_recons" / "*.npz")))
    assert len(files) == r["num_chunks"]
    rec = load_reconstruction(files[0])
    assert rec.num_frames == 4 and rec.num_tracks > 0


def test_online_debug_projections(image_dir, tmp_path):
    """--save-debug-projections writes a per-chunk reprojection GIF."""
    import glob

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=12, compute_dtype="float32",
        output_dir=str(tmp_path / "dbg"), save_debug_projections=True,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))[:4]
    slam.process_image_paths(paths)
    import pathlib

    arts = list(pathlib.Path(tmp_path / "dbg" / "debug_projections").glob("chunk_*.*"))
    assert arts, "no debug projection artifacts written"
