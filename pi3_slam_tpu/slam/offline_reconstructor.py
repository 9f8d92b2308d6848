"""Offline reconstruction: load chunk files, per-chunk BA, chain Sim3
alignment, export merged PLY / camera PLY / TUM trajectory.

Replaces OfflineReconstructor (slam/offline_reconstructor.py:24-257): same
artifacts (final_points.ply, final_camera_poses.ply, trajectory_tum.txt with
integer timestamps, dedup by view name) with .npz chunk files instead of
torch pickles.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Dict, List

import numpy as np

from ..io.ply import write_ply
from ..io.tum import write_tum_trajectory
from ..sfm.alignment import align_chunks
from ..sfm.reconstruction import ChunkReconstruction, build_chunk_reconstruction
from .config import ReconstructorConfig


def load_chunk_npz(path: str) -> Dict:
    """Load a chunk .npz into the dict format build_chunk_reconstruction
    expects (fp16 storage upcast to fp32)."""
    z = np.load(path, allow_pickle=False)
    if "keypoints" not in z.files:
        kind = "dense (created with --keypoints none)" if "dense" in z.files else "incomplete"
        raise ValueError(
            f"{path} is a {kind} chunk without keypoint tracks; reconstruction "
            "needs keypoint-sparse chunks — re-run create_offline_chunks.py "
            "with --keypoints grid (or aliked)"
        )
    chunk = {
        "keypoints": z["keypoints"].astype(np.float32),
        "points": z["points"].astype(np.float32),
        "colors": z["colors"].astype(np.float32) / 255.0,
        "camera_poses": z["camera_poses"].astype(np.float64),
        # video chunks store (N, 2) ["video_path", "frame_idx"] rows — keep
        # the pair so frame names stay 'video#idx' (identity + timebase)
        "image_paths": (
            z["image_paths"]
            if z["image_paths"].ndim > 1
            else [str(p) for p in z["image_paths"]]
        ),
        "original_width": int(z["original_width"]),
        "original_height": int(z["original_height"]),
    }
    for opt in (
        "intrinsics", "masks", "conf", "metric_scale", "start_idx", "end_idx",
        "keypoint_valid", "obs_frame", "obs_uv", "obs_valid", "obs_refined",
        # dense per-pixel maps (--save-dense) feed mesh export (mapping/)
        "points_dense", "local_points_dense", "conf_dense", "masks_dense",
        "rgb_dense", "dense_stride",
    ):
        if opt in z.files:
            chunk[opt] = z[opt]
    if "descriptors" in z.files:
        chunk["descriptors"] = z["descriptors"].astype(np.float32)
    return chunk


class OfflineReconstructor:
    def __init__(self, config: ReconstructorConfig):
        from ..utils.precision import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.output_dir = config.output_dir or config.chunk_dir
        os.makedirs(self.output_dir, exist_ok=True)
        # auto-load chunk metadata (slam/offline_reconstructor.py:31-46)
        meta_path = os.path.join(config.chunk_dir, "chunk_metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if config.chunk_length is None:
                config.chunk_length = meta.get("chunk_length")
            if config.overlap is None:
                config.overlap = meta.get("overlap")
            print(f"chunk metadata: length={config.chunk_length} overlap={config.overlap}")

    def _chunk_files(self) -> List[str]:
        files = sorted(glob.glob(os.path.join(self.config.chunk_dir, "chunks", "chunk_*.npz")))
        if not files:
            files = sorted(glob.glob(os.path.join(self.config.chunk_dir, "chunk_*.npz")))
        return files

    def run(self) -> Dict:
        files = self._chunk_files()
        if not files:
            raise FileNotFoundError(f"no chunk files under {self.config.chunk_dir}")
        print(f"Reconstructing from {len(files)} chunks")

        recons: List[ChunkReconstruction] = []
        align_stats = []
        for i, path in enumerate(files):
            chunk = load_chunk_npz(path)
            t0 = time.time()
            recon = build_chunk_reconstruction(
                chunk,
                max_observations_per_track=self.config.max_observations_per_track,
                ba_iterations=self.config.ba_iterations,
                use_inverse_depth=self.config.use_inverse_depth,
                observation_fan=self.config.observation_fan,
            )
            dt = time.time() - t0
            n = recon.num_frames
            print(f"  chunk {i}: recon {n} frames in {dt:.2f}s ({n/dt:.1f} FPS)")
            if self.config.save_debug:
                from ..sfm.serialization import save_reconstruction

                save_reconstruction(
                    recon, os.path.join(self.output_dir, f"recon_{i:06d}.npz")
                )
            if recons:
                res = align_chunks(
                    recons[-1],
                    recon,
                    refine=self.config.align_refine,
                    refine_iterations=self.config.align_refine_iterations,
                )
                align_stats.append(res)
                status = "ok" if res.success else "FAILED"
                via = " via pose fallback" if res.method == "poses" else ""
                print(
                    f"    align -> {status}{via} (common {res.num_common_tracks}, "
                    f"scale {float(res.sim3.scale):.4f})"
                )
            recons.append(recon)

        loop_stats = None
        if self.config.loop_closure:
            loop_stats = self._close_loops(recons)

        telemetry_stats = None
        if self.config.telemetry_path:
            telemetry_stats = self._apply_telemetry(recons)

        artifacts = self.export(recons)
        if self.config.export_mesh:
            mesh_path = self._export_mesh(recons, files)
            if mesh_path:
                artifacts["mesh"] = mesh_path
        return {
            "reconstructions": recons,
            "alignment": align_stats,
            "loop_closure": loop_stats,
            "artifacts": artifacts,
            "telemetry": telemetry_stats,
        }

    def _export_mesh(self, recons, files) -> str | None:
        """TSDF-fuse the chunks' dense maps under the final aligned poses and
        write a surface-nets mesh (mapping/; beyond the reference)."""
        from ..mapping.fuse import export_fused_mesh
        from ..mapping.tsdf import TSDFConfig

        def _has_dense(p):
            with np.load(p) as z:  # header check only, close the handle
                return "local_points_dense" in z.files

        if not all(_has_dense(p) for p in files):
            print(
                "mesh export skipped: chunks carry no dense maps — recreate "
                "them with create_offline_chunks --save-dense"
            )
            return None
        # lazy loaders: fuse_chunks materializes one chunk's dense maps
        # at a time (a long run's dense frames would not fit in RAM)
        result = export_fused_mesh(
            [lambda p=p: load_chunk_npz(p) for p in files],
            recons,
            os.path.join(self.output_dir, "fused_mesh.ply"),
            config=TSDFConfig(
                voxel_size=self.config.mesh_voxel_size,
                max_voxels=self.config.mesh_max_voxels,
                conf_threshold=self.config.mesh_conf_threshold,
            ),
            overlap=self.config.overlap or 0,
            min_weight=self.config.mesh_min_weight,
            volume_path=(
                os.path.join(self.output_dir, "fused_volume.npz")
                if self.config.save_volume
                else None
            ),
        )
        if result is None:
            return None
        if self.config.mesh_preview_views > 0:
            self._render_mesh_previews(result["volume"], recons)
        return result["path"]

    def _render_mesh_previews(self, volume, recons) -> None:
        """Raycast depth/normal previews of the fused volume from evenly
        spaced final camera poses (mapping/raycast.py) — a quick visual
        check of the reconstruction without opening the mesh."""
        from PIL import Image

        from ..mapping.raycast import raycast_depth

        rot = np.concatenate([np.asarray(r.rotations) for r in recons])
        cen = np.concatenate([np.asarray(r.centers) for r in recons])
        n = min(self.config.mesh_preview_views, len(cen))
        pick = np.linspace(0, len(cen) - 1, n).astype(int)
        h, w = 240, 320
        intr = np.array([0.8 * w, 0.8 * w, w / 2, h / 2])
        pdir = os.path.join(self.output_dir, "mesh_previews")
        os.makedirs(pdir, exist_ok=True)
        for j, i in enumerate(pick):
            out = raycast_depth(volume, intr, rot[i], cen[i], h, w)
            d = out["depth"]
            hi = np.percentile(d[out["mask"]], 98) if out["mask"].any() else 1.0
            depth_img = np.where(
                out["mask"], np.clip(d / max(hi, 1e-9), 0, 1) * 255, 0
            ).astype(np.uint8)
            normal_img = ((out["normals"] * 0.5 + 0.5) * 255).astype(np.uint8)
            normal_img[~out["mask"]] = 0
            Image.fromarray(depth_img).save(
                os.path.join(pdir, f"depth_{j:03d}.png")
            )
            Image.fromarray(normal_img).save(
                os.path.join(pdir, f"normal_{j:03d}.png")
            )
        print(f"Rendered {n} depth/normal preview pairs -> {pdir}")

    def _close_loops(self, recons) -> Dict:
        """Drift correction via loop closure (sfm/loops.py) — a capability
        the reference lacks (its alignment chain is strictly sequential)."""
        from ..sfm.loops import close_loops

        stats = close_loops(
            recons,
            min_inliers=self.config.loop_min_inliers,
            min_cosine=self.config.loop_min_cosine,
        )
        if stats["num_loop_edges"] == 0:
            has_desc = any(r.track_desc is not None for r in recons)
            why = "" if has_desc else " (grid chunks carry no descriptors — use --keypoints aliked)"
            print(f"loop closure: no verified loop edges{why}")
        else:
            for e in stats["edges"]:
                print(
                    f"loop closure: chunk {e.j} -> {e.i} "
                    f"({e.num_inliers}/{e.num_matches} inliers, rms {e.inlier_rms:.3f})"
                )
            print(
                f"loop closure: pose graph over {len(recons)} chunks, cost "
                f"{stats['initial_cost']:.4f} -> {stats['final_cost']:.4f}"
            )
        return stats

    def _apply_telemetry(self, recons) -> Dict:
        """Gravity + GPS constrained refinement (sfm/priors.py).

        Implements the reference's own roadmap items ("TODO: Add gravity
        residuals / Add GPS residuals", /root/reference/README.md) on top of
        its telemetry importers: (1) a Sim3 fit of the stitched camera track
        onto the interpolated GPS ENU track georeferences the whole
        reconstruction (metric scale from geodesy); (2) each chunk is then
        re-refined with per-camera GPS position priors and gravity-direction
        residuals in the BA.
        """
        from ..sfm.priors import constrain_with_telemetry
        from ..utils.telemetry import load_telemetry

        imp = load_telemetry(self.config.telemetry_path)
        stats = constrain_with_telemetry(
            recons, imp,
            gps_sigma=self.config.gps_sigma,
            gravity_sigma=self.config.gravity_sigma,
            refine_iterations=self.config.telemetry_refine_iterations,
        )
        if stats["gps"]:
            print(
                f"telemetry: georeferenced to ENU (scale {stats['scale']:.4f}, "
                f"GPS RMS {stats['gps_rms_m']:.2f} m, origin {stats['origin']})"
            )
        print(
            f"telemetry: refined {stats['refined_chunks']}/{len(recons)} chunks "
            f"(gps={stats['gps']}, gravity={stats['gravity']})"
        )
        return stats

    def export(self, recons: List[ChunkReconstruction]) -> Dict[str, str]:
        """Merged exports with view dedup by name (first occurrence wins)."""
        seen = set()
        centers, rotations = [], []
        for r in recons:
            for j, nm in enumerate(r.frame_names):
                if nm in seen:
                    continue
                seen.add(nm)
                centers.append(r.centers[j])
                rotations.append(r.rotations[j].T)  # R_cw -> R_wc (cam-to-world)

        clouds = [r.points[r.track_valid > 0] for r in recons]
        colors = [r.colors[r.track_valid > 0] for r in recons]
        cloud = np.concatenate(clouds) if clouds else np.zeros((0, 3))
        color = np.concatenate(colors) if colors else np.zeros((0, 3))

        ply_path = os.path.join(self.output_dir, "final_points.ply")
        write_ply(cloud, color, ply_path)
        cam_ply_path = os.path.join(self.output_dir, "final_camera_poses.ply")
        write_ply(
            np.asarray(centers).reshape(-1, 3),
            np.tile([1.0, 0.0, 0.0], (len(centers), 1)),  # red, like the reference
            cam_ply_path,
        )
        tum_path = os.path.join(self.output_dir, "trajectory_tum.txt")
        write_tum_trajectory(
            tum_path, np.asarray(centers), np.asarray(rotations), integer_timestamps=True
        )
        print(
            f"Exported {cloud.shape[0]} points, {len(centers)} poses -> {self.output_dir}"
        )
        artifacts = {"points": ply_path, "cameras": cam_ply_path, "trajectory": tum_path}
        if self.config.save_colmap:
            from ..io.colmap import write_colmap_text

            colmap_dir = os.path.join(self.output_dir, "colmap")
            artifacts["colmap"] = write_colmap_text(recons, colmap_dir)["images"]
            print(f"Exported COLMAP text model -> {colmap_dir}")
        return artifacts
