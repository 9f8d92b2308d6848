"""Pipeline configuration dataclasses.

Mirrors OfflineCreatorConfig (slam/offline_chunk_creator.py:36-50) and the
constructor kwargs of the reference CLIs, with TPU-specific additions
(checkpoint path for converted weights, compute dtype).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class OfflineCreatorConfig:
    output_dir: str = "output_chunks"
    chunk_length: int = 100
    overlap: int = 10
    pixel_limit: int = 255000 // 2
    device: str = "tpu"
    # model
    checkpoint_path: Optional[str] = None  # converted Pi3 .npz; None = random init
    compute_dtype: str = "bfloat16"
    # metric scale
    use_metric_depth: bool = True
    moge_checkpoint_path: Optional[str] = None
    # keypoints
    keypoint_type: str = "grid"
    max_keypoints: int = 1000
    keypoint_threshold: float = 0.005  # ALIKED detection threshold (--kp-threshold)
    grid_spacing: Optional[int] = None
    aliked_checkpoint_path: Optional[str] = None  # converted ALIKED .npz
    # camera
    estimate_camera_params: bool = True
    cam_dist_path: Optional[str] = None  # calibration JSON for undistortion
    # loader
    num_loader_workers: int = 2
    conf_threshold: float = 0.1
    depth_edge_rtol: float = 0.03
    # single-chunk dispatch pipeline depth: how many chunks may be in flight
    # on the device before the host blocks on the oldest. 2 keeps the device
    # stream fed across host gaps (npz writes, loader stalls, MoGe ratio) on
    # the remote-TPU tunnel whose transfers serialize with compute; 1 = the
    # round-3 behavior.
    dispatch_depth: int = 2
    # pad short tail chunks to chunk_length on the device (repeat the last
    # frame, slice outputs back): every chunk then runs the ONE compiled
    # program instead of compiling a second XLA program per odd tail shape
    # (SURVEY §7 hard part (c): no recompiles across chunk lengths). The
    # wasted tail compute (<= one chunk) is far below one compile.
    pad_tail_chunks: bool = True
    # npz deflate level for chunk/dense files: 'default' (zlib 6, smallest),
    # 'fast' (zlib 1, ~3x faster host-side deflate between dispatches),
    # 'none' (STORED — the reference's torch.save chunks are uncompressed
    # too). Readers are unchanged (np.load handles all three).
    chunk_compression: str = "default"
    # EXPERIMENTAL: merge this many consecutive frames' key/value tokens in
    # the decoder's global attention (Pi3Config.global_kv_merge) — cuts
    # global-attention FLOPs by the factor; approximate, validate accuracy
    # on a real checkpoint first. 1 = exact (default).
    global_kv_merge: int = 1
    # correlation-based observation refinement (the reference's README TODO,
    # implemented in ops/correlation.py): the track observation fan is
    # projected and ZNCC-refined inside the device step (images still on
    # device) and persisted in the chunk; the reconstructor then uses the
    # photometrically measured observations instead of re-projecting (its
    # --max-observations-per-track is superseded by the stored fan width).
    # Offline creator only.
    refine_observations: bool = False
    refine_max_observations: int = 10
    refine_patch_radius: int = 3
    refine_search_radius: int = 4
    refine_min_zncc: float = 0.5
    # store strided dense per-pixel maps (depth/points/conf/mask/rgb)
    # ALONGSIDE the sparse tracks — feeds the dense-mapping subsystem
    # (mapping/tsdf.py: TSDF fusion + mesh export in reconstruct_offline
    # --export-mesh). dense_stride subsamples spatially on-device, cutting
    # the pull + npz cost by stride^2. keypoint_type='none' keeps the
    # reference's full-res dense-only chunks (stride still applies).
    save_dense: bool = False
    dense_stride: int = 1
    resume: bool = False  # skip chunks whose files already exist
    # chunk-level data parallelism: process this many chunks per device step,
    # sharded over the mesh's dp axis (1 = single-chip path)
    data_parallel_chunks: int = 1
    # tensor parallelism over attention heads / MLP hidden (Megatron split,
    # parallel/mesh.py); dp * tp devices are used per step
    tensor_parallel: int = 1
    # sequence parallelism: ring attention over the sp mesh axis for chunks
    # whose global-attention sequence exceeds one chip (parallel/ring.py);
    # dp * tp * sp devices are used per step
    sequence_parallel: int = 1
    # capture a jax.profiler trace of one steady-state chunk into this dir
    # (viewable with tensorboard/xprof); None = off
    profile_dir: Optional[str] = None


@dataclass
class ReconstructorConfig:
    chunk_dir: str = "output_chunks"
    output_dir: Optional[str] = None
    chunk_length: Optional[int] = None  # auto from chunk_metadata.json
    overlap: Optional[int] = None
    max_observations_per_track: int = 10
    # 'subsampled' (default): earlier frames evenly subsampled so the padded
    # observation width M equals max_observations_per_track. 'unbounded': the
    # reference's literal fan — every track projects into ALL earlier frames
    # (utils/chunk_reconstruction.py:163-185). Measured A/B (APE + runtime)
    # in PARITY.md / tools/ablate_observation_fan.py.
    observation_fan: str = "subsampled"
    use_inverse_depth: bool = False
    optimize_focal: bool = False
    ba_iterations: int = 10
    # pose-prior refinement after each Sim3 alignment (reference runs 50
    # Huber-3.0 iterations, utils/reconstruction_alignment.py:137-159)
    align_refine: bool = True
    align_refine_iterations: int = 50
    save_debug: bool = False  # also saves per-chunk recon_XXXXXX.npz (.sfm analog)
    # telemetry-constrained refinement (gravity + GPS residuals — the
    # reference's README TODO, implemented here; sfm/priors.py): a file with
    # gravity/GPS streams (generic JSON, or a GoPro MP4 parsed in-process;
    # ZED jsonl / Kalibr CSV import but carry only IMU, so they do not
    # activate these constraints) on the frame-timestamp timebase. GPS
    # georeferences the reconstruction into a local ENU frame (metric scale
    # from the geodetic track); gravity constrains absolute roll/pitch
    # against the fixed world -z (gravity-only runs level the world frame
    # onto the measured axis first).
    telemetry_path: Optional[str] = None
    gps_sigma: float = 2.0  # meters (0 disables GPS priors)
    gravity_sigma: float = 0.05  # unit-vector residual sigma (0 disables)
    telemetry_refine_iterations: int = 20
    # loop closure (beyond the reference, whose stitching is strictly
    # sequential): detect revisits between non-adjacent chunks by track-
    # descriptor matching + robust geometric verification, then distribute
    # the drift with a Sim3 pose graph (sfm/loops.py, sfm/posegraph.py).
    # Needs ALIKED chunks (descriptors); grid chunks detect nothing.
    loop_closure: bool = False
    loop_min_inliers: int = 20
    loop_min_cosine: float = 0.85
    # also export a COLMAP text model (cameras/images/points3D.txt) into
    # <output>/colmap for downstream novel-view pipelines (gaussian
    # splatting, nerfstudio). Beyond the reference (PLY + TUM only).
    save_colmap: bool = False
    # TSDF-fuse the chunks' dense maps (requires chunks created with
    # --save-dense) with the final aligned poses and export a surface-nets
    # triangle mesh to <output>/fused_mesh.ply (mapping/; beyond the
    # reference). mesh_voxel_size <= 0 auto-sizes to ~192 voxels across
    # the scene.
    export_mesh: bool = False
    mesh_voxel_size: float = 0.0
    mesh_max_voxels: int = 192**3
    mesh_conf_threshold: float = 0.25
    mesh_min_weight: float = 1.0
    # raycast this many depth/normal preview PNG pairs of the fused volume
    # from evenly spaced final camera poses (mapping/raycast.py)
    mesh_preview_views: int = 0
    # also persist the fused TSDF volume (fused_volume.npz) — re-mesh or
    # raycast later without re-fusing (TSDFVolume.load)
    save_volume: bool = False


@dataclass
class OnlineConfig:
    chunk_length: int = 30
    overlap: int = 5
    pixel_limit: int = 255000 // 2
    checkpoint_path: Optional[str] = None
    compute_dtype: str = "bfloat16"
    use_metric_depth: bool = True
    moge_checkpoint_path: Optional[str] = None
    keypoint_type: str = "grid"
    max_keypoints: int = 1000
    keypoint_threshold: float = 0.005  # ALIKED detection threshold (--kp-threshold)
    aliked_checkpoint_path: Optional[str] = None  # converted ALIKED .npz
    estimate_camera_params: bool = True
    cam_dist_path: Optional[str] = None
    max_observations_per_track: int = 10
    # inverse-depth track parametrization in the per-chunk BA (reference
    # --use_inverse_depth, pi3_slam_online_modular.py:166)
    use_inverse_depth: bool = False
    # per-chunk BA Gauss-Newton iterations (build stage) and Sim3-refine BA
    # settings (finish stage) — the same knobs as ReconstructorConfig, so the
    # streaming chain can be configured identically to the offline one
    # (tests/test_system_ape.py gates their APE equality at eval scale)
    ba_iterations: int = 10
    align_refine: bool = True
    align_refine_iterations: int = 50
    # point filtering in the jitted chunk step (reference --conf_threshold;
    # ours applies to sigmoid(conf), slam/chunk_creator.py)
    conf_threshold: float = 0.1
    depth_edge_rtol: float = 0.03
    # pad short tail chunks to chunk_length on the device (see
    # OfflineCreatorConfig.pad_tail_chunks)
    pad_tail_chunks: bool = True
    # EXPERIMENTAL global-attention kv merge (see OfflineCreatorConfig)
    global_kv_merge: int = 1
    num_loader_workers: int = 2
    visualize: bool = False
    viz_port: int = 8080
    output_dir: str = "online_output"
    # save each chunk's aligned reconstruction as recon_XXXXXX.npz (the
    # reference's --save_chunk_reconstructions / .sfm dumps)
    save_debug_recons: bool = False
    # per-chunk reprojection-debug GIFs (observed vs reprojected keypoints),
    # the reference's --save_debug_projections (chunk_reconstruction.py:224-443)
    save_debug_projections: bool = False
    # per-alignment overlap diagnostic (overlap frame ids, common-track
    # counts, point/conf stats) printed and appended to overlap_debug.jsonl —
    # the reference's _debug_print_overlap_indices
    # (slam/online_reconstructor.py:1754-1810)
    debug_overlap: bool = False
    # loop-closure finalization (sfm/loops.py — see ReconstructorConfig):
    # applied over the accumulated chunk reconstructions before the exports
    loop_closure: bool = False
    loop_min_inliers: int = 20
    loop_min_cosine: float = 0.85
    # correlation-based observation refinement inside the device step (see
    # OfflineCreatorConfig.refine_observations); the online reconstruction
    # then consumes the photometric measurements directly
    refine_observations: bool = False
    refine_max_observations: int = 10
    refine_patch_radius: int = 3
    refine_search_radius: int = 4
    refine_min_zncc: float = 0.5
    # gravity/GPS constrained finalization (sfm/priors.py, shared with the
    # offline reconstructor's --telemetry)
    telemetry_path: Optional[str] = None
    gps_sigma: float = 2.0
    gravity_sigma: float = 0.05
    telemetry_refine_iterations: int = 20
    # infer/recon overlap: keep the next chunk's forward in flight on the
    # accelerator while the host runs this chunk's reconstruction. SfM solvers
    # are pinned to the CPU backend ('auto' = cpu whenever the model runs on
    # an accelerator) so BA never contends with the forward for device HBM —
    # the TPU-native analog of the reference's spawned-worker overlap
    # (slam/online_reconstructor.py:761-954).
    overlap_device_host: bool = True
    # run the host SfM chain (materialize + metric scale + reconstruction/BA
    # + Sim3 alignment) on a consumer thread so it overlaps the NEXT chunk's
    # forward: the drive loop only extracts keypoints and dispatches device
    # steps; a single in-order queue feeds the consumer (strict alignment
    # order by construction). Steady-state chunk period drops from
    # (forward + pull + SfM) to max(forward + pull, SfM). Requires
    # overlap_device_host; pipelined=False disables it.
    async_sfm: bool = True
    sfm_backend: str = "auto"  # 'auto' | 'cpu' | 'default'
    # chunk-level data parallelism over a device mesh (1 = single chip)
    data_parallel_chunks: int = 1
    # tensor parallelism over heads/hidden (dp * tp devices per step)
    tensor_parallel: int = 1
    # sequence parallelism: ring attention over sp for very long chunks
    sequence_parallel: int = 1
    # dense mapping (mapping/; beyond the reference): the device step also
    # returns strided dense per-pixel maps, stashed per chunk to
    # <output>/dense/ at consume time (disk-bounded, never accumulated in
    # RAM); export_mesh() TSDF-fuses them under the FINAL chunk poses —
    # call it after loop closure / telemetry so the mesh sees the corrected
    # geometry. save_dense stashes without meshing (fuse later offline).
    save_dense: bool = False
    export_mesh: bool = False
    dense_stride: int = 2
    # npz deflate level for dense stashes (see OfflineCreatorConfig)
    chunk_compression: str = "default"
    mesh_voxel_size: float = 0.0  # <= 0: auto (~192 voxels across the scene)
    mesh_max_voxels: int = 192**3
    mesh_conf_threshold: float = 0.25
    mesh_min_weight: float = 1.0
    save_volume: bool = False  # persist fused_volume.npz alongside the mesh
    # live mesh: every K consumed chunks, re-fuse the stashes under the
    # CURRENT aligned poses on a background thread (CPU device — never
    # contends with the TPU forward) and push the growing surface to the
    # visualizer's mesh layer. 0 = off. Re-fusing from scratch keeps the
    # surface consistent with alignment corrections as they happen.
    live_mesh_every: int = 0
