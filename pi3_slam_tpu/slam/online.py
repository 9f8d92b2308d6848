"""Online (streaming) SLAM: chunked inference with incremental alignment.

Replaces Pi3SLAMOnline (slam/online_reconstructor.py:230-1809). The reference
overlaps GPU inference with CPU reconstruction through a spawned process and
pickled queues. Here both inference AND bundle adjustment run on the TPU, so
on a single chip the device work serializes by necessity (two resident
programs crash the worker with HBM pressure); the overlap that remains
profitable — image decode and chunk serialization — runs in the prefetch
loader's threads. On a multi-chip mesh, chunk-level data parallelism
(slam/chunk_creator.make_sharded_chunk_step) is the scaling path. Strict
in-order consumption is preserved by construction.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data import ChunkDataset, PrefetchLoader, calculate_target_size
from ..data.undistortion import create_undistorter
from ..io.ply import write_ply
from ..io.tum import write_tum_trajectory
from ..models import Pi3Config, init_pi3_params
from ..models.convert import load_params_npz
from ..sfm.alignment import align_chunks
from ..sfm.reconstruction import ChunkReconstruction, build_chunk_reconstruction
from ..utils.keypoints import grid_keypoints
from ..utils.timing import TimingStats
from .chunk_creator import make_chunk_step
from .config import OnlineConfig


class Pi3SLAMOnline:
    def __init__(self, config: OnlineConfig, pi3_config: Pi3Config | None = None):
        self.config = config
        from ..utils.precision import enable_compilation_cache

        enable_compilation_cache()
        self.pi3_config = pi3_config or Pi3Config()
        dtype_map = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
        self.compute_dtype = dtype_map[config.compute_dtype]

        if config.checkpoint_path:
            self.params = load_params_npz(config.checkpoint_path)
        else:
            print("No checkpoint given - random Pi3 weights (geometry will be noise)")
            self.params = init_pi3_params(0, self.pi3_config)
        if self.compute_dtype == jnp.bfloat16:
            from ..utils.precision import cast_tree_bf16_host

            self.params = cast_tree_bf16_host(self.params)
        # host copy kept for backend-crash recovery; pin params on device
        self._host_params = self.params
        self.params = jax.device_put(self.params)

        self.moge = None
        if config.use_metric_depth:
            try:
                from ..models.moge import MoGeRunner

                self.moge = MoGeRunner(config.moge_checkpoint_path)
            except Exception as e:
                print(f"MoGe unavailable ({e}); continuing without metric depth")

        self.undistorter = create_undistorter(config.cam_dist_path) if config.cam_dist_path else None
        self.step = make_chunk_step(
            self.pi3_config, self.compute_dtype, 0.1, 0.03, config.estimate_camera_params
        )
        self.reconstructions: List[ChunkReconstruction] = []
        self.alignment_results = []
        self.timing = TimingStats()
        self.visualizer = None
        if config.visualize:
            from ..viz.visualizer import OnlineVisualizer

            self.visualizer = OnlineVisualizer(port=config.viz_port)

    # ----- per-chunk stages -----

    def _dispatch_device(self, batch: Dict):
        """Run the jitted device step and materialize its (small, keypoint-
        sparse) outputs.

        The outputs are pulled to host here rather than left in flight: on a
        single chip the bundle adjustment also runs on the TPU, so a pending
        second forward only adds HBM pressure (observed: TPU worker crash with
        model params + two chunk forwards + BA resident). Host-side overlap
        (image decode, serialization) comes from the prefetch loader.
        """
        images = batch["images"]
        N, _, H, W = images.shape
        kp = grid_keypoints(H, W, self.config.max_keypoints)
        kps = np.broadcast_to(kp[None], (N, kp.shape[0], 2)).astype(np.float32)
        with self.timing.track("inference"):
            dev = self.step(self.params, jnp.asarray(images[None]), jnp.asarray(kps))
            host = {k: np.asarray(v) for k, v in dev.items()}
        return {"dev": host, "kps": kps, "batch": batch}

    def _consume(self, pending: Dict) -> ChunkReconstruction:
        """Host stage: materialize device results, metric scale, recon, align."""
        batch = pending["batch"]
        host = pending["dev"]

        poses = host["camera_poses"].astype(np.float64)
        points_kp = host["points_kp"].astype(np.float64)
        with self.timing.track("metric_scale"):
            if self.moge is not None:
                depth = self.moge.infer_depth(batch["images"][0])
                mask0 = host["mask0"]
                ratio = depth[mask0] / np.maximum(host["depth0"][mask0], 1e-9)
                ratio = ratio[np.isfinite(ratio)]
                if ratio.size >= 10:
                    s = float(np.median(ratio))
                    points_kp *= s
                    poses[:, :3, 3] *= s

        chunk = {
            "keypoints": pending["kps"],
            "points": points_kp,
            "colors": host["colors_kp"],
            "camera_poses": poses,
            "image_paths": batch["paths"],
            "original_width": batch["images"].shape[3],
            "original_height": batch["images"].shape[2],
        }
        if "intrinsics" in host:
            chunk["intrinsics"] = host["intrinsics"].astype(np.float64)

        with self.timing.track("reconstruction"):
            recon = build_chunk_reconstruction(
                chunk, max_observations_per_track=self.config.max_observations_per_track
            )
        with self.timing.track("alignment"):
            if self.reconstructions:
                res = align_chunks(self.reconstructions[-1], recon)
                self.alignment_results.append(res)
        self.reconstructions.append(recon)
        if self.visualizer is not None:
            self.visualizer.update(recon)
        return recon

    def _recover_backend(self) -> None:
        try:
            jax.clear_caches()
        except Exception:
            pass
        for reset in (
            lambda: jax.extend.backend.clear_backends(),
            lambda: jax.lib.xla_bridge.get_backend.cache_clear(),
        ):
            try:
                reset()
                break
            except Exception:
                continue
        self.params = jax.device_put(self._host_params)
        self.step = make_chunk_step(
            self.pi3_config, self.compute_dtype, 0.1, 0.03,
            self.config.estimate_camera_params,
        )

    # ----- drive loops -----

    def process_image_paths_sync(self, image_paths: List) -> Dict:
        """Synchronous drive mode (the reference's
        process_chunks_with_background_loader): each chunk is fully processed
        before the next is dispatched. Simpler; no device/host overlap."""
        return self.process_image_paths(image_paths, pipelined=False)

    def queue_status(self) -> Dict:
        """Telemetry snapshot (the reference's queue-status dict,
        slam/online_reconstructor.py:922-954)."""
        return {
            "chunks_consumed": len(self.reconstructions),
            "alignments": len(self.alignment_results),
            "alignment_failures": sum(
                1 for r in self.alignment_results if not r.success
            ),
            "timing": self.timing.statistics(),
        }

    def process_image_paths(self, image_paths: List, pipelined: bool = True) -> Dict:
        """Pipelined streaming: device step k+1 in flight while host finishes
        chunk k (the reference's producer/consumer overlap, without IPC).
        pipelined=False processes strictly one chunk at a time."""
        target = calculate_target_size(image_paths[0], self.config.pixel_limit)
        print(f"Target size: {target}")
        dataset = ChunkDataset(
            image_paths,
            self.config.chunk_length,
            self.config.overlap,
            target,
            undistorter=self.undistorter,
        )
        loader = PrefetchLoader(dataset, num_workers=self.config.num_loader_workers)

        t_start = time.time()
        frames_done = 0
        pending = None
        for batch in loader:
            with self.timing.track("dispatch"):
                try:
                    nxt = self._dispatch_device(batch)
                except Exception as e:
                    if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                        raise
                    print(f"device runtime failure ({str(e)[:80]}); resetting backend, retrying chunk")
                    self._recover_backend()
                    nxt = self._dispatch_device(batch)
            if not pipelined:
                self._consume(nxt)
                frames_done += nxt["batch"]["images"].shape[0]
                continue
            if pending is not None:
                self._consume(pending)
                frames_done += pending["batch"]["images"].shape[0]
            pending = nxt
        if pending is not None:
            self._consume(pending)
            frames_done += pending["batch"]["images"].shape[0]

        wall = time.time() - t_start
        fps = frames_done / wall if wall > 0 else 0.0
        print(f"Online: {frames_done} frames in {wall:.2f}s -> {fps:.2f} FPS")
        self.timing.print_statistics()
        return {
            "num_chunks": len(self.reconstructions),
            "num_frames": frames_done,
            "fps": fps,
        }

    # ----- exports (same artifacts as the reference) -----

    def _merged_trajectory(self, return_names: bool = False):
        seen = set()
        centers, rotations, names = [], [], []
        for r in self.reconstructions:
            for j, nm in enumerate(r.frame_names):
                if nm in seen:
                    continue
                seen.add(nm)
                centers.append(r.centers[j])
                rotations.append(r.rotations[j].T)
                names.append(nm)
        if return_names:
            return np.asarray(centers), np.asarray(rotations), names
        return np.asarray(centers), np.asarray(rotations)

    def save_final_result(self, path: str, max_points: Optional[int] = None) -> None:
        clouds = [r.points[r.track_valid > 0] for r in self.reconstructions]
        colors = [r.colors[r.track_valid > 0] for r in self.reconstructions]
        cloud = np.concatenate(clouds) if clouds else np.zeros((0, 3))
        color = np.concatenate(colors) if colors else np.zeros((0, 3))
        write_ply(cloud, color, path, max_points=max_points)
        print(f"Saved {cloud.shape[0]} points -> {path}")

    def save_trajectory_tum(self, path: str, timestamps=None, name_to_timestamp=None) -> None:
        centers, rotations, names = self._merged_trajectory(return_names=True)
        if timestamps is None and name_to_timestamp:
            timestamps = [name_to_timestamp.get(nm, i) for i, nm in enumerate(names)]
        write_tum_trajectory(path, centers, rotations, timestamps=timestamps)
        print(f"Saved trajectory ({len(centers)} poses) -> {path}")
