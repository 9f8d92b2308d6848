"""Loop-closure detection and correction over chunk reconstructions.

The reference's stitching is purely sequential (each chunk aligned only to
its predecessor, utils/reconstruction_alignment.py:40-198) — revisiting a
place does not correct accumulated drift. This module detects revisits
between non-adjacent chunks (descriptor matching + robust geometric
verification) and distributes the loop error across the chain with the Sim3
pose graph (sfm/posegraph.py).

Detection needs appearance: chunks created with the learned (ALIKED)
extractor carry L2-normalized track descriptors; grid-keypoint chunks have
no appearance signal, so detection returns no candidates there (documented
— run create_offline_chunks.py with --keypoints aliked to enable loop
closure).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..geometry.sim3 import Sim3, robust_umeyama, sim3_apply
from .alignment import (
    apply_sim3_to_reconstruction,
    mutual_nn_match,
    subsample_live_tracks,
)
from .posegraph import optimize_sim3_pose_graph, sequential_edges, stack_sim3, index_sim3
from .reconstruction import ChunkReconstruction


@dataclasses.dataclass
class LoopEdge:
    i: int  # earlier chunk
    j: int  # later chunk
    sim3: Sim3  # T with X_i^-1 o X_j = T: maps chunk-j world points onto chunk-i's
    num_matches: int
    num_inliers: int
    inlier_rms: float


def _chunk_proximity(a: ChunkReconstruction, b: ChunkReconstruction) -> float:
    """Distance between camera-track bounding spheres, normalized by the sum
    of radii (< 1 means the spheres overlap)."""
    ca, cb = a.centers.mean(axis=0), b.centers.mean(axis=0)
    ra = float(np.linalg.norm(a.centers - ca, axis=-1).max())
    rb = float(np.linalg.norm(b.centers - cb, axis=-1).max())
    return float(np.linalg.norm(ca - cb)) / max(ra + rb, 1e-9)


def chunk_global_descriptor(recon: ChunkReconstruction, cap: int = 2048) -> np.ndarray:
    """Chunk-level place signature: L2-normalized mean of (subsampled) track
    descriptors — a cheap bag-of-features aggregate whose cosine similarity
    prefilters candidate pairs so full mutual-NN matching stays off the
    O(n_chunks^2) path on long sequences."""
    if recon.track_desc is None:
        return np.zeros(0, np.float32)
    live = subsample_live_tracks(recon, cap)
    if live.size == 0:
        return np.zeros(recon.track_desc.shape[1], np.float32)
    g = recon.track_desc[live].mean(axis=0)
    return (g / max(np.linalg.norm(g), 1e-9)).astype(np.float32)


def detect_loop_closures(
    recons: Sequence[ChunkReconstruction],
    *,
    min_separation: int = 2,
    max_proximity: float = 1.5,
    max_desc_tracks: int = 2048,
    min_cosine: float = 0.85,
    min_matches: int = 30,
    min_inliers: int = 20,
    min_inlier_ratio: float = 0.5,
    inlier_scale_factor: float = 0.05,
    global_prefilter_top_k: int | None = None,
) -> List[LoopEdge]:
    """Find verified loop edges between non-adjacent chunks.

    Pipeline per candidate pair: (1) proximity gate on the current (drifted)
    world placement — loops we can close are those whose drift is smaller
    than the chunk extent; (2) mutual-NN cosine matching of track
    descriptors; (3) trimmed Huber-IRLS Umeyama fit with an inlier gate at
    ``inlier_scale_factor`` x the matched cloud's median spread. Candidates
    failing any gate are dropped silently (a wrong loop edge is far worse
    than a missed one; the pose graph's Huber loss is the last backstop).
    """
    edges: List[LoopEdge] = []
    n = len(recons)
    subs = [None] * n

    # optional place-recognition prefilter: rank candidate partners of each
    # chunk by global-descriptor cosine, run full matching only on the top-k
    # — keeps long sequences off the O(n^2) mutual-NN path
    allowed = None
    if global_prefilter_top_k is not None and n > 2:
        described = [k for k, r in enumerate(recons) if r.track_desc is not None]
        dims = {recons[k].track_desc.shape[1] for k in described}
        if len(described) > 2 and len(dims) == 1:
            gd = np.stack([chunk_global_descriptor(recons[k]) for k in described])
            gsim = gd @ gd.T
            allowed = set()
            for jj, j in enumerate(described):
                cand = [
                    (float(gsim[ii, jj]), i)
                    for ii, i in enumerate(described)
                    if abs(i - j) > min_separation
                ]
                cand.sort(reverse=True)
                for _, i in cand[:global_prefilter_top_k]:
                    allowed.add((min(i, j), max(i, j)))

    for i in range(n):
        for j in range(i + min_separation + 1, n):
            a, b = recons[i], recons[j]
            if a.track_desc is None or b.track_desc is None:
                continue
            if allowed is not None and (i, j) not in allowed:
                continue
            if _chunk_proximity(a, b) > max_proximity:
                continue
            if subs[i] is None:
                subs[i] = subsample_live_tracks(a, max_desc_tracks)
            if subs[j] is None:
                subs[j] = subsample_live_tracks(b, max_desc_tracks)
            ai, bj = subs[i], subs[j]
            if ai.size < min_matches or bj.size < min_matches:
                continue
            qm, rm = mutual_nn_match(b.track_desc[bj], a.track_desc[ai], min_cosine)
            n_match = int(qm.size)
            if n_match < min_matches:
                continue
            src = b.points[bj[qm]].astype(np.float64)  # query (later chunk)
            dst = a.points[ai[rm]].astype(np.float64)

            spread = np.median(
                np.linalg.norm(dst - np.median(dst, axis=0), axis=-1)
            )
            tau = max(float(spread) * inlier_scale_factor, 1e-6)
            from .device import sfm_compute

            with sfm_compute():
                t = robust_umeyama(
                    jnp.asarray(src, jnp.float32),
                    jnp.asarray(dst, jnp.float32),
                    huber_delta=tau,
                    iterations=8,
                    trim_multiplier=3.0,
                )
                res = np.asarray(
                    jnp.linalg.norm(
                        sim3_apply(t, jnp.asarray(src, jnp.float32))
                        - jnp.asarray(dst, jnp.float32),
                        axis=-1,
                    )
                )
            inl = res <= 2.0 * tau
            n_inl = int(inl.sum())
            if n_inl < min_inliers or n_inl < min_inlier_ratio * n_match:
                continue
            edges.append(
                LoopEdge(
                    i=i,
                    j=j,
                    sim3=t,
                    num_matches=n_match,
                    num_inliers=n_inl,
                    inlier_rms=float(np.sqrt(np.mean(res[inl] ** 2))),
                )
            )
    return edges


def close_loops(
    recons: Sequence[ChunkReconstruction],
    edges: Optional[List[LoopEdge]] = None,
    *,
    iterations: int = 15,
    sequential_weight: float = 2.0,
    huber_delta: float = 0.5,
    **detect_kwargs,
) -> dict:
    """Detect loops (unless ``edges`` given), optimize the Sim3 pose graph,
    and apply the per-chunk corrections in place.

    Node k is a world-frame correction X_k for chunk k (init identity); a
    loop fit T (chunk-j points onto chunk-i points) constrains
    X_i^-1 o X_j = T, sequential edges hold X_k^-1 o X_{k+1} = I so the
    already-refined overlap stitching deforms as little as possible while
    the loop error is spread over the chain.
    """
    n = len(recons)
    if edges is None:
        edges = detect_loop_closures(recons, **detect_kwargs)
    if not edges or n < 2:
        return {"num_loop_edges": 0, "applied": False, "edges": edges or []}

    seq_i, seq_j, seq_meas = sequential_edges(n)
    ei = np.concatenate([seq_i, np.array([e.i for e in edges], np.int32)])
    ej = np.concatenate([seq_j, np.array([e.j for e in edges], np.int32)])
    meas = stack_sim3(seq_meas + [e.sim3 for e in edges])
    w = np.concatenate(
        [
            np.full(n - 1, sequential_weight, np.float32),
            np.ones(len(edges), np.float32),
        ]
    )

    ident = Sim3(jnp.ones(()), jnp.eye(3), jnp.zeros(3))
    from .device import sfm_compute

    with sfm_compute():
        result = optimize_sim3_pose_graph(
            stack_sim3([ident] * n),
            jnp.asarray(ei),
            jnp.asarray(ej),
            meas,
            jnp.asarray(w),
            iterations=iterations,
            huber_delta=huber_delta,
        )
    for k, recon in enumerate(recons):
        apply_sim3_to_reconstruction(recon, index_sim3(result.nodes, k))
    return {
        "num_loop_edges": len(edges),
        "applied": True,
        "edges": edges,
        "initial_cost": result.initial_cost,
        "final_cost": result.final_cost,
    }
