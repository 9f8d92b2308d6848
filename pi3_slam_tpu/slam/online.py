"""Online (streaming) SLAM: chunked inference with incremental alignment.

Replaces Pi3SLAMOnline (slam/online_reconstructor.py:230-1809). The reference
overlaps GPU inference with CPU reconstruction through a spawned process and
pickled queues (:761-954). The TPU-native equivalent needs no IPC:

  * the chunk forward is dispatched asynchronously and stays IN FLIGHT on the
    TPU while the host consumes the previous chunk (deferred materialization
    — np.asarray happens at consume time, not dispatch time);
  * the SfM solvers (BA / Sim3 / pruning) are pinned to JAX's CPU backend
    (sfm/device.py), so reconstruction k overlaps forward k+1 without putting
    a second big program on the TPU (which crashes this environment's worker
    under HBM pressure);
  * the whole host SfM chain runs on ONE consumer thread fed by an in-order
    bounded queue (config.async_sfm): the drive thread only extracts
    keypoints, uploads, and dispatches, so the steady-state chunk period is
    max(forward + pull, SfM) instead of their sum;
  * MoGe metric depth is dispatched right behind the Pi3 step — the device
    runs them back-to-back while the host works.

On a multi-chip mesh, chunk-level data parallelism
(chunk_creator.make_sharded_chunk_step) shards data_parallel_chunks chunks
over the dp axis per step. Strict in-order consumption is preserved by
construction in every mode.
"""

from __future__ import annotations

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
        ckpt_cfg = None
        if config.checkpoint_path:
            from ..models.convert import load_pi3_checkpoint

            self.params, ckpt_cfg = load_pi3_checkpoint(config.checkpoint_path)
        # explicit pi3_config wins; else the checkpoint's embedded
        # self-description; else the full-size default
        self.pi3_config = pi3_config or ckpt_cfg or Pi3Config()
        if getattr(config, "global_kv_merge", 1) > 1:
            import dataclasses

            self.pi3_config = dataclasses.replace(
                self.pi3_config, global_kv_merge=config.global_kv_merge
            )
        dtype_map = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
        self.compute_dtype = dtype_map[config.compute_dtype]

        if not config.checkpoint_path:
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

        self.keypoint_extractor = None
        if config.keypoint_type == "aliked":
            from ..utils.keypoints import ALIKEDExtractor, create_keypoint_extractor

            ex = create_keypoint_extractor(
                "aliked",
                max_num_keypoints=config.max_keypoints,
                detection_threshold=config.keypoint_threshold,
                aliked_checkpoint_path=config.aliked_checkpoint_path,
            )
            if isinstance(ex, ALIKEDExtractor):
                self.keypoint_extractor = ex
            else:  # factory already warned; grid path handles it
                config.keypoint_type = "grid"

        # pin SfM solvers to the CPU backend so BA overlaps the TPU forward
        from ..sfm.device import set_sfm_backend

        if config.sfm_backend == "auto":
            if jax.default_backend() != "cpu":
                set_sfm_backend("cpu")
        elif config.sfm_backend != "default":
            set_sfm_backend(config.sfm_backend)

        self.mesh = None
        if (
            config.data_parallel_chunks > 1
            or config.tensor_parallel > 1
            or config.sequence_parallel > 1
        ):
            n_dev = len(jax.devices())
            sp = max(1, min(config.sequence_parallel, n_dev))
            tp = max(1, min(config.tensor_parallel, n_dev // sp))
            dp = max(1, min(config.data_parallel_chunks, n_dev // (tp * sp)))
            if dp * tp * sp > 1:
                from ..parallel import make_mesh

                self.mesh = make_mesh(dp, tp, n_sp=sp)
                config.data_parallel_chunks = dp
                config.tensor_parallel = tp
                config.sequence_parallel = sp
                print(f"online device mesh: dp={dp} x tp={tp} x sp={sp} over {n_dev} devices")
                if self.moge is not None:
                    self.moge.shard_params(self.mesh)
            else:
                config.data_parallel_chunks = 1
                config.tensor_parallel = 1
                config.sequence_parallel = 1
        self._make_steps()
        self.reconstructions: List[ChunkReconstruction] = []
        self.alignment_results = []
        self.timing = TimingStats()
        self._produced = 0
        self._consumed = 0
        self.visualizer = None
        if config.visualize:
            from ..viz.visualizer import OnlineVisualizer

            self.visualizer = OnlineVisualizer(port=config.viz_port)
        self._live_mesh_thread = None
        from .chunk_creator import GroupUploadCache, OverlapUploadCache

        self._upload_cache = OverlapUploadCache()
        self._group_upload_cache = GroupUploadCache()

    def _make_steps(self) -> None:
        refine = None
        if self.config.refine_observations:
            refine = (
                self.config.refine_max_observations,
                self.config.refine_patch_radius,
                self.config.refine_search_radius,
                self.config.refine_min_zncc,
            )
        dense = (
            self.config.save_dense
            or self.config.export_mesh
            or self.config.live_mesh_every > 0
        )
        if self.mesh is not None:
            from .chunk_creator import make_sharded_chunk_step

            self.step, shard_params = make_sharded_chunk_step(
                self.pi3_config, self.compute_dtype,
                self.config.conf_threshold, self.config.depth_edge_rtol,
                self.config.estimate_camera_params, self.mesh,
                return_dense=dense, dense_stride=self.config.dense_stride,
                refine_obs=refine,
            )
            self.params = shard_params(self._host_params)
        else:
            self.step = make_chunk_step(
                self.pi3_config, self.compute_dtype,
                self.config.conf_threshold, self.config.depth_edge_rtol,
                self.config.estimate_camera_params,
                return_dense=dense, dense_stride=self.config.dense_stride,
                refine_obs=refine,
            )

    # ----- per-chunk stages -----

    def _fan_arg(self, n_reals, n_padded):
        """Per-chunk candidate tables for in-step observation refinement,
        computed over each chunk's REAL frame count (chunk_creator._fan_table);
        None when refinement is off."""
        if not self.config.refine_observations:
            return None
        from .chunk_creator import _fan_table

        return jnp.asarray(np.stack([
            _fan_table(n, n_padded, self.config.refine_max_observations)
            for n in n_reals
        ]))

    # per-frame device-step outputs sliced back after tail padding
    _PER_FRAME_KEYS = (
        "points_kp", "local_points_kp", "conf_kp", "masks_kp", "colors_kp",
        "camera_poses", "obs_frame", "obs_uv", "obs_valid", "obs_refined",
        "local_points_dense", "conf_dense", "masks_dense", "intrinsics",
    )

    def _pad_tail(self, images: np.ndarray, kps: np.ndarray, axis: int = 0):
        """Pad a short tail chunk to chunk_length (repeat the final frame) so
        every chunk reuses the one compiled device program; _consume slices
        the per-frame outputs back (see chunk_creator._pad_tail)."""
        n = images.shape[axis]
        target = self.config.chunk_length
        if not self.config.pad_tail_chunks or n >= target:
            return images, kps
        pad = target - n
        print(f"   tail chunk padded {n} -> {target} frames (reusing the compiled shape)")
        last = [slice(None)] * axis + [slice(-1, None)]
        images = np.concatenate(
            [images, np.repeat(images[tuple(last)], pad, axis=axis)], axis=axis
        )
        kps = np.concatenate(
            [kps, np.repeat(kps[tuple(last)], pad, axis=axis)], axis=axis
        )
        return images, kps

    def _dispatch_device(self, batch: Dict):
        """Dispatch the jitted device step (and MoGe, queued right behind it).

        With overlap_device_host the outputs stay as device arrays — the
        forward remains in flight while the host consumes the previous chunk;
        np.asarray at consume time is the synchronization point. Without
        overlap they are materialized here (strictly serial device use)."""
        images = batch["images"]
        N, _, H, W = images.shape
        det = None
        if self.keypoint_extractor is not None:  # ALIKED: per-frame learned
            det = self.keypoint_extractor.extract(images)
            kps = det["keypoints"].astype(np.float32)
        else:
            kp = grid_keypoints(H, W, self.config.max_keypoints)
            kps = np.broadcast_to(kp[None], (N, kp.shape[0], 2)).astype(np.float32)
        with self.timing.track("dispatch"):
            imgs_host, kps_dev = self._pad_tail(images, kps)
            if imgs_host is images:
                # overlap frames are already device-resident from the previous
                # chunk's upload (chunk_creator.OverlapUploadCache)
                imgs_arr = self._upload_cache.upload(images, batch["paths"])
            else:  # padded tail chunk: host-assembled, plain upload
                self._upload_cache.reset()
                imgs_arr = jnp.asarray(imgs_host)
            cand = self._fan_arg([N], imgs_arr.shape[0])
            dev = self.step(
                self.params, imgs_arr[None], jnp.asarray(kps_dev),
                None if cand is None else cand[0],
            )
            moge_depth = None
            if self.moge is not None:
                # first frame sliced from the uploaded batch: no 2nd transfer
                moge_depth = self.moge.infer_depth_async(imgs_arr[0])
            if not self.config.overlap_device_host:
                dev = {k: np.asarray(v) for k, v in dev.items()}
                if moge_depth is not None:
                    moge_depth = np.asarray(moge_depth)
        self._produced += 1
        return {"dev": dev, "moge_depth": moge_depth, "kps": kps, "det": det,
                "batch": batch}

    def _dispatch_group(self, group: List[Dict], dp: int) -> Dict:
        """Multi-chip path: stack dp same-shape chunks, one sharded device
        step (batch padded by repeating the last chunk so the dp axis always
        divides). Outputs stay on device — the sharded step for group k+1
        runs while the host consumes group k (mirroring the offline creator's
        1-deep group pipeline, chunk_creator.py); _finish_group is the
        synchronization point."""
        n_real = len(group)
        padded = group + [group[-1]] * (dp - n_real)
        H, W = padded[0]["images"].shape[-2:]
        dets = None
        if self.keypoint_extractor is not None:
            dets = [self.keypoint_extractor.extract(b["images"]) for b in padded]
            kps_list = [d["keypoints"].astype(np.float32) for d in dets]
        else:
            kp = grid_keypoints(H, W, self.config.max_keypoints)
            kps_list = [
                np.broadcast_to(
                    kp[None], (b["images"].shape[0], kp.shape[0], 2)
                ).astype(np.float32)
                for b in padded
            ]

        with self.timing.track("dispatch"):
            # per-batch tail padding: a short tail chunk rides the same group
            # (and compiled program) as full-length ones
            pp = [self._pad_tail(b["images"], k) for b, k in zip(padded, kps_list)]
            images = np.stack([p[0] for p in pp])  # (B, Np, 3, H, W)
            kps_dev = np.stack([p[1] for p in pp])
            cand = self._fan_arg(
                [b["images"].shape[0] for b in padded], images.shape[1]
            )
            # intra- and inter-group overlap frames uploaded once, stacked
            # batch reassembled on device (chunk_creator.GroupUploadCache)
            imgs_arr = self._group_upload_cache.upload(
                images, [b["paths"] for b in padded]
            )
            dev = self.step(self.params, imgs_arr, jnp.asarray(kps_dev), cand)
            # one dp-sharded MoGe batch (every chunk's first frame on its own
            # devices) queued behind the sharded step; first frames sliced
            # from the uploaded stack — no second host->device transfer
            moge_dev = (
                self.moge.infer_depth_batch_async(imgs_arr[:, 0])
                if self.moge is not None
                else None
            )
        self._produced += n_real
        # snapshot: the caller clears its accumulator list after dispatch
        return {"dev": dev, "moge_dev": moge_dev, "kps": kps_list, "dets": dets,
                "group": list(group), "n_real": n_real}

    def _finish_group(self, pending: Dict) -> List[Dict]:
        """Materialize a dispatched group into per-chunk consume items (the
        device->host pull is the pipeline's synchronization point)."""
        n_real = pending["n_real"]
        with self.timing.track("materialize"):
            host = {k: np.asarray(v) for k, v in pending["dev"].items()}
            moge_host = (
                np.asarray(pending["moge_dev"])
                if pending["moge_dev"] is not None
                else None
            )
        dets = pending["dets"]
        return [
            {
                "dev": {k: v[b] for k, v in host.items()},
                "moge_depth": moge_host[b] if moge_host is not None else None,
                "kps": pending["kps"][b],
                "det": dets[b] if dets is not None else None,
                "batch": pending["group"][b],
            }
            for b in range(n_real)
        ]

    def _consume(self, pending: Dict) -> ChunkReconstruction:
        """Host stage: materialize device results, metric scale, recon, align.

        A parked async consumer hands back items whose build stage already
        ran (``_built``, attached in _consumer_loop's park path); reuse that
        ctx instead of re-consuming the raw item — its device buffers were
        freed by the build (``pending["dev"] = None``)."""
        ctx = pending.pop("_built", None)
        if ctx is None:
            ctx = self._consume_build(pending)
        return self._consume_finish(ctx)

    def _consume_build(self, pending: Dict, idx: int | None = None) -> Dict:
        """Consume stage 1: pull device results, metric scale, dense stash,
        build+BA the chunk reconstruction. Independent of every other chunk
        (build_chunk_reconstruction needs no alignment state), so the async
        consumer runs build(k+1) concurrently with finish(k). ``idx`` is the
        absolute chunk index for the dense stash; None = the consumed count
        (correct when build and finish run strictly alternated)."""
        batch = pending["batch"]
        if pending["dev"] is None:
            # A previous build attempt on this item already freed its device
            # buffers (the line below) and then died, or a parked lookahead
            # build lost its ctx; re-run the forward from the source batch.
            # Every caller that can reach this state guarantees the device is
            # quiescent (drive-thread recovery after the consumer is joined).
            if self.mesh is not None:
                redo = self._finish_group(
                    self._dispatch_group([batch], self.config.data_parallel_chunks)
                )[0]
            else:
                redo = self._dispatch_device(batch)
            # decrement only after the re-dispatch succeeded (it re-counted
            # the chunk): if it crashed above, recover_and_redo already does
            # its own decrement+redispatch and a decrement here would skew
            # chunks_produced/inflight by -1
            self._produced -= 1
            pending.update(redo)
        with self.timing.track("materialize"):
            host = {k: np.asarray(v) for k, v in pending["dev"].items()}
        # free the device buffers now: every recovery path re-dispatches from
        # pending["batch"], and the async pipeline otherwise keeps ~5 chunks
        # of dead device output resident (dispatch + queue + build + finish)
        pending["dev"] = None
        n_frames = batch["images"].shape[0]
        for k in self._PER_FRAME_KEYS:  # drop padded tail frames, if any
            if k in host and host[k].shape[0] > n_frames:
                host[k] = host[k][:n_frames]

        poses = host["camera_poses"].astype(np.float64)
        points_kp = host["points_kp"].astype(np.float64)
        scale_factor = None
        with self.timing.track("metric_scale"):
            if pending["moge_depth"] is not None:
                depth = np.asarray(pending["moge_depth"])
                mask0 = host["mask0"]
                ratio = depth[mask0] / np.maximum(host["depth0"][mask0], 1e-9)
                ratio = ratio[np.isfinite(ratio)]
                if ratio.size >= 10:
                    scale_factor = float(np.median(ratio))
                    points_kp *= scale_factor
                    poses[:, :3, 3] *= scale_factor

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
        if "obs_frame" in host:
            # ZNCC-refined observation fan from the device step; padded tail
            # frame references invalidated (see chunk_creator)
            of = host["obs_frame"]
            chunk["obs_frame"] = of
            chunk["obs_uv"] = host["obs_uv"]
            chunk["obs_valid"] = host["obs_valid"] & (of < n_frames)
        det = pending.get("det")
        if det is not None:
            # ALIKED: sub-threshold filler slots must not spawn live tracks;
            # descriptors enable feature-based cross-chunk matching
            chunk["keypoint_valid"] = np.asarray(det["valid"], bool)
            chunk["descriptors"] = np.asarray(det["descriptors"], np.float32)

        if "local_points_dense" in host:
            self._stash_dense(
                host, poses, chunk, scale_factor, n_frames,
                self._consumed if idx is None else idx,
                images=batch["images"],
            )

        with self.timing.track("reconstruction"):
            recon = build_chunk_reconstruction(
                chunk,
                max_observations_per_track=self.config.max_observations_per_track,
                ba_iterations=self.config.ba_iterations,
                use_inverse_depth=self.config.use_inverse_depth,
            )
        return {"recon": recon, "pending": pending, "host": host}

    def _consume_finish(self, ctx: Dict) -> ChunkReconstruction:
        """Consume stage 2 (strictly in order): Sim3-align against the
        previous chunk, append to the chain, debug artifacts, viewer update."""
        recon = ctx["recon"]
        pending = ctx["pending"]
        host = ctx["host"]
        batch = pending["batch"]
        with self.timing.track("alignment"):
            res = None
            if self.reconstructions:
                res = align_chunks(
                    self.reconstructions[-1],
                    recon,
                    refine=self.config.align_refine,
                    refine_iterations=self.config.align_refine_iterations,
                )
                self.alignment_results.append(res)
        if self.config.debug_overlap and self.reconstructions:
            try:
                self._dump_overlap_debug(self.reconstructions[-1], recon, res, host)
            except Exception as e:  # debug artifact must never kill the run
                print(f"overlap debug dump failed: {e}")
        self.reconstructions.append(recon)
        self._consumed += 1
        # Everything below is observability side-effects. They run AFTER the
        # chunk was appended to the chain, so an exception here must NOT
        # propagate: the recovery machinery would re-consume the item and
        # append the chunk a SECOND time (duplicate frames in the merged
        # trajectory). A dead backend surfaced here is re-detected (and
        # recovered) by the next chunk's dispatch, which owns a consumable
        # item. Reference degradation semantics: errors in debug/viz are
        # printed and skipped (slam/online_reconstructor.py:877-879).
        if self.config.save_debug_recons:
            import os as _os

            from ..sfm.serialization import save_reconstruction

            try:
                rdir = _os.path.join(self.config.output_dir, "debug_recons")
                _os.makedirs(rdir, exist_ok=True)
                save_reconstruction(
                    recon, _os.path.join(rdir, f"recon_{self._consumed - 1:06d}.npz")
                )
            except Exception as e:
                print(f"debug recon save failed: {e}")
        if self.config.save_debug_projections:
            import os as _os

            from ..sfm.serialization import render_debug_projections

            imgs = batch["images"]
            if imgs.dtype == np.uint8:
                imgs = imgs.astype(np.float32) / 255.0
            dbg_dir = _os.path.join(self.config.output_dir, "debug_projections")
            _os.makedirs(dbg_dir, exist_ok=True)
            try:
                render_debug_projections(
                    recon, imgs,
                    _os.path.join(dbg_dir, f"chunk_{self._consumed - 1:06d}.gif"),
                )
            except Exception as e:  # debug artifact must never kill the run
                print(f"debug projections failed: {e}")
        if self.visualizer is not None:
            try:
                frame = batch["images"][-1].transpose(1, 2, 0)
                if frame.dtype != np.uint8:
                    frame = (frame * 255.0).clip(0, 255).astype(np.uint8)
                self.visualizer.update(
                    recon, frame=frame, keypoints=pending["kps"][-1]
                )
            except Exception as e:
                print(f"viewer update failed: {e}")
        if (
            self.config.live_mesh_every > 0
            and self._consumed % self.config.live_mesh_every == 0
        ):
            try:
                self._live_mesh_tick()
            except Exception as e:
                print(f"live mesh tick failed: {e}")
        return recon

    def _dump_overlap_debug(self, prev, recon, res, host) -> None:
        """Overlap diagnostic at alignment time: overlap frame ids on both
        sides, common counts, point/conf stats. Console + one JSON line per
        alignment in <output_dir>/overlap_debug.jsonl (the reference's
        _debug_print_overlap_indices, slam/online_reconstructor.py:1754-1810,
        as a persistent artifact instead of print-only)."""
        import json as _json
        import os as _os

        common = set(prev.frame_names) & set(recon.frame_names)
        entry = {
            "chunk": self._consumed,
            "prev_overlap_frames": [n for n in prev.frame_names if n in common],
            "cur_overlap_frames": [n for n in recon.frame_names if n in common],
            "num_common_frames": len(common),
            "num_common_tracks": int(res.num_common_tracks) if res else 0,
            "num_used_tracks": int(res.num_used_tracks) if res else 0,
            "alignment_success": bool(res.success) if res else False,
            "num_keypoints_per_frame": int(recon.num_tracks // max(1, recon.num_frames)),
            "num_points": int(recon.num_tracks),
            "num_live_points": int((recon.track_valid > 0).sum()),
            "mean_conf": float(np.asarray(host["conf_kp"]).mean()),
            "overlap": int(self.config.overlap),
            "chunk_length": int(self.config.chunk_length),
        }
        print(
            f"CHUNK OVERLAP DEBUG: chunk {entry['chunk']} | common frames "
            f"{entry['num_common_frames']} {entry['cur_overlap_frames']} | "
            f"common tracks {entry['num_common_tracks']} "
            f"(used {entry['num_used_tracks']}, "
            f"{'ok' if entry['alignment_success'] else 'FAILED'}) | "
            f"points {entry['num_live_points']}/{entry['num_points']} | "
            f"mean conf {entry['mean_conf']:.3f}"
        )
        _os.makedirs(self.config.output_dir, exist_ok=True)
        with open(
            _os.path.join(self.config.output_dir, "overlap_debug.jsonl"), "a"
        ) as f:
            f.write(_json.dumps(entry) + "\n")

    # ----- dense mapping (mapping/; beyond the reference) -----

    def _stash_dense(
        self, host, poses, chunk, scale_factor, n_frames, idx, images=None
    ) -> None:
        """Write this chunk's strided dense maps to <output>/dense/ at
        consume time (disk keeps RAM bounded at one chunk; the npz layout
        matches the offline --save-dense chunks so mapping/fuse.py consumes
        both). Poses stored are the PRE-alignment, metric-scaled ones the
        reconstruction was built from — fuse_chunks recovers each chunk's
        residual alignment scale from their baselines vs the final ones."""
        import os as _os

        from .chunk_creator import _store_dense_maps

        with self.timing.track("dense_stash"):
            dense = {
                "camera_poses": poses.astype(np.float32),
                "original_height": chunk["original_height"],
                "original_width": chunk["original_width"],
            }
            if "intrinsics" in chunk:
                dense["intrinsics"] = chunk["intrinsics"].astype(np.float32)
            _store_dense_maps(
                dense, host, scale_factor, n_frames, self.config.dense_stride,
                images=images,
            )
            ddir = _os.path.join(self.config.output_dir, "dense")
            _os.makedirs(ddir, exist_ok=True)
            from ..io.npz import save_npz

            save_npz(
                _os.path.join(ddir, f"dense_{idx:06d}.npz"),
                self.config.chunk_compression,
                **dense,
            )

    def _live_mesh_tick(self) -> None:
        """Kick a background live-mesh refresh (non-blocking; drops the tick
        when the previous refresh is still running)."""
        if self._live_mesh_thread is not None and self._live_mesh_thread.is_alive():
            return
        import glob as _glob
        import os as _os
        import threading

        files = sorted(
            _glob.glob(_os.path.join(self.config.output_dir, "dense", "dense_*.npz"))
        )
        n = min(len(files), len(self.reconstructions))
        if n == 0:
            return
        recons = list(self.reconstructions[:n])
        self._live_mesh_thread = threading.Thread(
            target=self._live_mesh_fuse, args=(files[:n], recons), daemon=True
        )
        self._live_mesh_thread.start()

    def _live_mesh_fuse(self, files, recons) -> None:
        """Re-fuse the stashes under the CURRENT aligned poses on the CPU
        device (never contends with the in-flight TPU forward) and push the
        surface to the viewer's mesh layer. Re-fusing from scratch keeps the
        preview consistent with alignment/drift corrections; a coarser voxel
        cap keeps each refresh cheap. Pose mutations racing a refresh can
        only skew the PREVIEW — the authoritative mesh comes from
        export_mesh at finalization, which runs synchronously."""
        import jax as _jax

        from ..mapping.fuse import fuse_chunks
        from ..mapping.tsdf import TSDFConfig

        def _load(p):
            with np.load(p) as z:
                return dict(z)

        cfg = TSDFConfig(
            voxel_size=self.config.mesh_voxel_size,
            max_voxels=min(self.config.mesh_max_voxels, 128**3),
            conf_threshold=self.config.mesh_conf_threshold,
        )
        try:
            with _jax.default_device(_jax.devices("cpu")[0]):
                volume = fuse_chunks(
                    [lambda p=p: _load(p) for p in files], recons,
                    config=cfg, overlap=self.config.overlap,
                )
            verts, faces, vcols = volume.extract_mesh(
                min_weight=self.config.mesh_min_weight
            )
            if self.visualizer is not None and len(verts):
                self.visualizer.show_mesh(verts, faces, vcols)
            print(f"live mesh: {len(verts)} verts from {len(files)} chunks")
        except Exception as e:  # a preview failure must never kill the run
            print(f"live mesh refresh failed: {e}")

    def export_mesh(self, path: Optional[str] = None) -> Optional[str]:
        """TSDF-fuse the stashed dense maps under the FINAL chunk poses and
        write a surface-nets mesh. Call after apply_loop_closure /
        apply_telemetry — the reconstructions' poses at call time define the
        mesh frame, so drift corrections are baked in. Returns the mesh path
        (None when skipped)."""
        import glob as _glob
        import os as _os

        from ..mapping.fuse import export_fused_mesh
        from ..mapping.tsdf import TSDFConfig

        files = sorted(
            _glob.glob(_os.path.join(self.config.output_dir, "dense", "dense_*.npz"))
        )
        if not files:
            print(
                "mesh export skipped: no stashed dense maps — run with "
                "export_mesh/save_dense enabled (--export-mesh)"
            )
            return None
        if len(files) != len(self.reconstructions):
            print(
                f"mesh export skipped: {len(files)} dense chunks vs "
                f"{len(self.reconstructions)} reconstructions (stale dense/ "
                "directory from a previous run?)"
            )
            return None

        def _load(p):
            with np.load(p) as z:
                return dict(z)

        result = export_fused_mesh(
            [lambda p=p: _load(p) for p in files],
            self.reconstructions,
            path or _os.path.join(self.config.output_dir, "fused_mesh.ply"),
            config=TSDFConfig(
                voxel_size=self.config.mesh_voxel_size,
                max_voxels=self.config.mesh_max_voxels,
                conf_threshold=self.config.mesh_conf_threshold,
            ),
            overlap=self.config.overlap,
            min_weight=self.config.mesh_min_weight,
            volume_path=(
                _os.path.join(self.config.output_dir, "fused_volume.npz")
                if self.config.save_volume
                else None
            ),
        )
        if result is None:
            return None
        if self.visualizer is not None and len(result["vertices"]):
            self.visualizer.show_mesh(
                result["vertices"], result["faces"], result["colors"]
            )
        return result["path"]

    def _recover_backend(self) -> None:
        # epoch lets nested recovery paths detect "the backend was already
        # reset further down this call chain" and skip a redundant multi-
        # second reset (clear_caches + param re-upload + step rebuild)
        self._backend_epoch = getattr(self, "_backend_epoch", 0) + 1
        self._upload_cache.reset()  # cached device frames died with the backend
        self._group_upload_cache.reset()
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
        if self.mesh is None:
            self.params = jax.device_put(self._host_params)
        else:
            # the old mesh holds device handles from the dead backend
            from ..parallel import make_mesh

            self.mesh = make_mesh(
                self.config.data_parallel_chunks,
                self.config.tensor_parallel,
                n_sp=self.config.sequence_parallel,
            )
        if self.moge is not None:
            if self.mesh is not None:
                self.moge.shard_params(self.mesh)
            else:
                self.moge.reset()
        self._make_steps()  # re-shards params itself in mesh mode

    # ----- drive loops -----

    def process_image_paths_sync(self, image_paths: List) -> Dict:
        """Synchronous drive mode (the reference's
        process_chunks_with_background_loader): each chunk is fully processed
        before the next is dispatched. Simpler; no device/host overlap."""
        return self.process_image_paths(image_paths, pipelined=False)

    def queue_status(self) -> Dict:
        """Telemetry snapshot mirroring the reference's queue-status dict
        (slam/online_reconstructor.py:922-954): produced/consumed/inflight
        counts plus alignment and timing summaries."""
        return {
            "chunks_produced": self._produced,
            "chunks_consumed": self._consumed,
            "chunks_inflight": self._produced - self._consumed,
            "data_parallel_chunks": self.config.data_parallel_chunks,
            "overlap_device_host": self.config.overlap_device_host,
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
        dense_on = (
            self.config.save_dense
            or self.config.export_mesh
            or self.config.live_mesh_every > 0
        )
        if dense_on and self._consumed == 0:
            # clear stashes left by a PREVIOUS run: export_mesh pairs
            # dense_*.npz with reconstructions by index. Only before the
            # first chunk — later segments on the same instance continue
            # the recon chain and must keep their earlier stashes.
            import glob as _glob
            import os as _os

            for p in _glob.glob(
                _os.path.join(self.config.output_dir, "dense", "dense_*.npz")
            ):
                _os.remove(p)
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
        pending: List[Dict] = []  # dispatched, not yet consumed (in order)

        def dispatch_with_recovery(batch):
            try:
                return self._dispatch_device(batch)
            except Exception as e:
                if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                    raise
                print(f"device runtime failure ({str(e)[:80]}); resetting backend, retrying chunk")
                epoch = getattr(self, "_backend_epoch", 0)
                _quiesce_async()  # consumer may hold buffers on the dead backend
                if getattr(self, "_backend_epoch", 0) == epoch:
                    # quiescing a parked consumer can itself have recovered
                    # the backend (redo path); don't reset it twice
                    self._recover_backend()
                return self._dispatch_device(batch)

        def recover_and_redo(item, exc):
            """A backend crash invalidates in-flight device buffers; reset and
            re-run this chunk's forward synchronously (non-crash errors are
            re-raised). Always called with the device quiescent — either from
            the drive thread's own consume, or after the consumer thread has
            been joined — so recovery never races a concurrent dispatch."""
            nonlocal frames_done
            if "UNAVAILABLE" not in str(exc) and "crashed" not in str(exc):
                raise exc
            print(f"device failure at consume ({str(exc)[:80]}); resetting, re-running chunk")
            self._recover_backend()
            self._produced -= 1  # re-dispatch below re-counts it
            if self.mesh is not None:
                redo = self._finish_group(
                    self._dispatch_group(
                        [item["batch"]], self.config.data_parallel_chunks
                    )
                )[0]
            else:
                redo = dispatch_with_recovery(item["batch"])
            self._consume(redo)
            frames_done += item["batch"]["images"].shape[0]

        def consume_with_recovery(item):
            nonlocal frames_done
            try:
                self._consume(item)
            except Exception as e:
                recover_and_redo(item, e)
                return
            frames_done += item["batch"]["images"].shape[0]

        # ----- async SfM consumer (config.async_sfm) -----
        # The host SfM chain of chunk k runs off the drive thread while it
        # uploads and dispatches chunk k+1 — BA is pinned to the CPU backend
        # (sfm/device.py) so the two genuinely overlap. The chain itself is a
        # two-stage in-order pipeline: build (materialize + metric scale +
        # recon/BA — independent per chunk) runs one chunk ahead on a
        # single-worker executor while finish (Sim3 alignment + chain append
        # + viz — strictly sequential) runs on the consumer thread, so the
        # steady-state period is max(forward+pull, build, finish) instead of
        # their sum. A single bounded queue preserves order and bounds
        # device-resident chunks. On any consumer error the thread parks with
        # every unprocessed item, and the drive thread recovers serially (the
        # device is quiescent at that point).
        use_async = (
            pipelined and self.config.overlap_device_host and self.config.async_sfm
        )
        consumer = None
        cq = None
        cstate = {"exc": None, "items": []}
        _DONE = object()

        def _consumer_loop(my_q):
            # my_q is bound at thread start: a consumer only ever reads the
            # queue it was born with, so a stale thread from a double-crash
            # restart can never steal items (or the _DONE) from its successor
            nonlocal frames_done
            import concurrent.futures as _f

            ex = _f.ThreadPoolExecutor(1, thread_name_prefix="sfm-build")
            prev_item = prev_fut = None
            # absolute chunk index for the dense stash: read lazily at the
            # first item, not at thread start — after a crash recovery the
            # drive thread consumes the redo + tail chunks inline AFTER
            # restarting this thread, and an eager snapshot would be stale.
            # Race-free: nothing is enqueued until that inline work is done.
            next_idx = None
            try:
                while True:
                    it = my_q.get()
                    nxt_fut = None
                    if it is not _DONE:
                        if next_idx is None:
                            next_idx = self._consumed
                        try:
                            nxt_fut = ex.submit(self._consume_build, it, next_idx)
                        except RuntimeError:
                            # interpreter shutdown: concurrent.futures' atexit
                            # hook killed the executor while this (leaked,
                            # _abort_consumer gave up) daemon thread was still
                            # draining the queue — exit quietly
                            return
                        next_idx += 1
                    if prev_fut is not None:
                        try:
                            self._consume_finish(prev_fut.result())
                            frames_done += prev_item["batch"]["images"].shape[0]
                        except BaseException as e:  # drive thread recovers
                            rest = []
                            if nxt_fut is not None:
                                try:
                                    # settle the lookahead build and keep its
                                    # ctx: the build freed the item's device
                                    # buffers, so the raw item alone is no
                                    # longer consumable (_consume reuses the
                                    # ctx; a failed build falls back to the
                                    # dev-None re-dispatch in _consume_build)
                                    it["_built"] = nxt_fut.result()
                                except BaseException:
                                    pass
                                rest.append(it)
                            cstate["items"] = [prev_item] + rest
                            cstate["exc"] = e
                            return
                    if it is _DONE:
                        return
                    prev_item, prev_fut = it, nxt_fut
            finally:
                ex.shutdown(wait=False)

        cgen = {"n": 0}  # bumped per start; detects nested restarts

        def _start_consumer():
            nonlocal consumer, cq
            import queue as _q
            import threading as _t

            cq = _q.Queue(maxsize=2)
            cgen["n"] += 1
            consumer = _t.Thread(
                target=_consumer_loop, args=(cq,), name="sfm-consumer", daemon=True
            )
            consumer.start()

        def _service_consumer():
            """Handle a parked consumer: redo the failed chunk inline (or
            re-raise), consume the unprocessed + queued tail inline in order,
            restart the thread."""
            if cstate["exc"] is None:
                return
            consumer.join()
            exc = cstate["exc"]
            failed, *tail = cstate["items"]
            cstate["exc"] = None
            cstate["items"] = []
            import queue as _q

            while True:
                try:
                    r = cq.get_nowait()
                except _q.Empty:
                    break
                if r is not _DONE:
                    tail.append(r)
            gen0 = cgen["n"]
            recover_and_redo(failed, exc)  # raises unless a backend crash
            for r in tail:
                consume_with_recovery(r)
            # the redo path can itself crash the backend, whose recovery
            # (_quiesce_async inside dispatch_with_recovery) already restarted
            # the consumer — starting a second one here would leak a thread
            if cgen["n"] == gen0:
                _start_consumer()

        def _enqueue(item):
            import queue as _q

            while True:
                _service_consumer()
                try:
                    cq.put(item, timeout=0.5)
                    return
                except _q.Full:
                    continue

        def _drain_consumer():
            while True:
                _enqueue(_DONE)
                consumer.join()
                if cstate["exc"] is None:
                    return
                _service_consumer()  # redo+drain+restart, then re-send _DONE

        def _quiesce_async():
            """Drain the consumer (redoing any crashed chunk inline) and
            restart it fresh+idle, so the caller's recovery code owns the
            device and the recon chain exclusively. No-op in sync mode."""
            if not use_async or consumer is None:
                return
            _drain_consumer()
            _start_consumer()

        def _abort_consumer():
            """Best-effort consumer stop when the drive loop exits abnormally
            (non-backend exception): without it the daemon thread and its
            build executor stay blocked on the queue for the process
            lifetime — one leaked thread pair per failed call on a
            long-lived host. Never raises; never blocks indefinitely (a
            parked consumer exits its thread, breaking the loop)."""
            import queue as _q

            if consumer is None:
                return
            # bounded: a consumer wedged in a hung device pull (cq full,
            # is_alive forever) must not block the original exception from
            # propagating — give up after ~5 s and leak the daemon thread
            for _ in range(10):
                if not consumer.is_alive():
                    return
                try:
                    cq.put(_DONE, timeout=0.5)
                    return
                except _q.Full:
                    continue

        dp = self.config.data_parallel_chunks if self.mesh is not None else 1
        if dp > 1:
            # multi-chip: group dp same-shape chunks per sharded device step,
            # consume strictly in order (chunks are independent at inference;
            # alignment order is preserved on the host side). Groups pipeline
            # 1-deep: group k+1's sharded step is dispatched BEFORE group k is
            # materialized/consumed, so device and host overlap exactly like
            # the reference's producer/consumer split
            # (slam/online_reconstructor.py:761-954). pipelined=False or
            # overlap_device_host=False disable the overlap (strictly serial
            # device use — the flags exist because two in-flight programs
            # pressure HBM on fragile backends).
            group_depth = 1 if (pipelined and self.config.overlap_device_host) else 0
            group: List[Dict] = []
            pending_group: List[Dict] = []  # dispatched, unconsumed
            if use_async:
                _start_consumer()
            emit = _enqueue if use_async else consume_with_recovery

            def finish_group_pending(depth=0):
                while len(pending_group) > depth:
                    pg = pending_group.pop(0)
                    try:
                        items = self._finish_group(pg)
                    except Exception as e:
                        if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                            raise
                        print(f"device failure at group finish ({str(e)[:80]}); resetting, redoing group")
                        epoch = getattr(self, "_backend_epoch", 0)
                        _quiesce_async()
                        if getattr(self, "_backend_epoch", 0) == epoch:
                            self._recover_backend()
                        self._produced -= pg["n_real"]  # re-dispatch re-counts
                        items = self._finish_group(
                            self._dispatch_group(pg["group"], dp)
                        )
                    for item in items:
                        emit(item)

            def flush_group():
                if not group:
                    return
                try:
                    disp = self._dispatch_group(group, dp)
                except Exception as e:
                    if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                        raise
                    print(f"device failure at group dispatch ({str(e)[:80]}); resetting backend")
                    epoch = getattr(self, "_backend_epoch", 0)
                    _quiesce_async()
                    redo = pending_group.pop(0) if pending_group else None
                    if getattr(self, "_backend_epoch", 0) == epoch:
                        self._recover_backend()
                    if redo is not None:
                        self._produced -= redo["n_real"]
                        for item in self._finish_group(
                            self._dispatch_group(redo["group"], dp)
                        ):
                            consume_with_recovery(item)
                    disp = self._dispatch_group(group, dp)
                pending_group.append(disp)
                group.clear()
                finish_group_pending(depth=group_depth)

            try:
                for batch in loader:
                    compatible = not group or (
                        group[0]["images"].shape == batch["images"].shape
                        or (
                            self.config.pad_tail_chunks
                            and group[0]["images"].shape[-2:]
                            == batch["images"].shape[-2:]
                        )
                    )
                    if not compatible:
                        flush_group()
                    group.append(batch)
                    if len(group) == dp:
                        flush_group()
                flush_group()
                finish_group_pending()
                if use_async:
                    _drain_consumer()
            except BaseException:
                _abort_consumer()
                raise
        elif use_async:
            _start_consumer()
            try:
                for batch in loader:
                    _enqueue(dispatch_with_recovery(batch))
                _drain_consumer()
            except BaseException:
                _abort_consumer()
                raise
        else:
            depth = 1 if pipelined else 0
            for batch in loader:
                pending.append(dispatch_with_recovery(batch))
                while len(pending) > depth:
                    consume_with_recovery(pending.pop(0))
            while pending:
                consume_with_recovery(pending.pop(0))

        wall = time.time() - t_start
        fps = frames_done / wall if wall > 0 else 0.0
        print(f"Online: {frames_done} frames in {wall:.2f}s -> {fps:.2f} FPS")
        self.timing.print_statistics()
        return {
            "num_chunks": len(self.reconstructions),
            "num_frames": frames_done,
            "fps": fps,
        }

    def apply_loop_closure(self):
        """Loop-closure finalization over the accumulated chunk
        reconstructions (sfm/loops.close_loops): detect revisits by
        descriptor matching, distribute drift with the Sim3 pose graph.
        Call after processing, before apply_telemetry (georeferencing should
        see the loop-consistent geometry). Needs ALIKED chunks."""
        if not self.config.loop_closure or len(self.reconstructions) < 2:
            return None
        from ..sfm.loops import close_loops

        stats = close_loops(
            self.reconstructions,
            min_inliers=self.config.loop_min_inliers,
            min_cosine=self.config.loop_min_cosine,
        )
        if stats["num_loop_edges"]:
            print(
                f"loop closure: {stats['num_loop_edges']} edge(s), pose-graph "
                f"cost {stats['initial_cost']:.4f} -> {stats['final_cost']:.4f}"
            )
        else:
            has_desc = any(r.track_desc is not None for r in self.reconstructions)
            why = "" if has_desc else " (grid chunks carry no descriptors — use --keypoints aliked)"
            print(f"loop closure: no verified loop edges{why}")
        return stats

    def apply_telemetry(self):
        """Gravity + GPS constrained finalization over the accumulated chunk
        reconstructions (sfm/priors.constrain_with_telemetry — the
        reference's README-TODO residuals). Call after processing, before
        the exports; georeferences everything into the GPS ENU frame."""
        if not self.config.telemetry_path or not self.reconstructions:
            return None
        from ..sfm.priors import constrain_with_telemetry
        from ..utils.telemetry import load_telemetry

        imp = load_telemetry(self.config.telemetry_path)
        stats = constrain_with_telemetry(
            self.reconstructions, imp,
            gps_sigma=self.config.gps_sigma,
            gravity_sigma=self.config.gravity_sigma,
            refine_iterations=self.config.telemetry_refine_iterations,
        )
        print(
            f"telemetry: gps={stats['gps']} gravity={stats['gravity']} "
            f"refined {stats['refined_chunks']} chunks"
            + (f", GPS RMS {stats['gps_rms_m']:.2f} m" if stats["gps"] else "")
        )
        return stats

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
