"""Trajectory evaluation: absolute pose error with Sim3 alignment.

Replacement for the `evo_ape tum <gt> <est> -as` gate the reference's eval
scripts use (scripts/eval_7scenes.sh:173-176): associate trajectories by
timestamp, Umeyama-align the estimate to ground truth with scale (evo's
--align --correct_scale), report translational APE statistics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry.sim3 import umeyama, sim3_apply
from ..io.tum import read_tum_trajectory


@dataclass
class APEResult:
    rmse: float
    mean: float
    median: float
    std: float
    min: float
    max: float
    num_pairs: int

    def as_dict(self) -> Dict[str, float]:
        return {
            "rmse": self.rmse,
            "mean": self.mean,
            "median": self.median,
            "std": self.std,
            "min": self.min,
            "max": self.max,
            "num_pairs": self.num_pairs,
        }


def associate(
    ts_a: np.ndarray, ts_b: np.ndarray, max_diff: float = 0.01
) -> Tuple[np.ndarray, np.ndarray]:
    """Unique timestamp association, evo/TUM-script exact: enumerate candidate
    pairs within max_diff, take them best-difference-first, and never reuse a
    timestamp from either side (the previous greedy version could match one
    estimate pose to several ground-truth stamps, silently flattering APE)."""
    ts_a = np.asarray(ts_a, np.float64)
    ts_b = np.asarray(ts_b, np.float64)
    cand = []
    for i, t in enumerate(ts_a):
        lo = int(np.searchsorted(ts_b, t - max_diff, side="left"))
        hi = int(np.searchsorted(ts_b, t + max_diff, side="right"))
        for c in range(lo, hi):
            cand.append((abs(ts_b[c] - t), i, c))
    cand.sort(key=lambda x: x[0])
    used_a, used_b = set(), set()
    pairs = []
    for d, i, c in cand:
        if i in used_a or c in used_b:
            continue
        used_a.add(i)
        used_b.add(c)
        pairs.append((i, c))
    pairs.sort()
    if not pairs:
        return np.zeros(0, int), np.zeros(0, int)
    ia, ib = zip(*pairs)
    return np.asarray(ia, int), np.asarray(ib, int)


def ape_translation(
    gt_positions: np.ndarray,
    est_positions: np.ndarray,
    align_sim3: bool = True,
) -> APEResult:
    """APE over already-associated position sequences."""
    gt = np.asarray(gt_positions, np.float64)
    est = np.asarray(est_positions, np.float64)
    assert gt.shape == est.shape and gt.ndim == 2
    if align_sim3 and gt.shape[0] >= 3:
        s = umeyama(jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32))
        est = np.asarray(sim3_apply(s, jnp.asarray(est, jnp.float32)), np.float64)
    err = np.linalg.norm(est - gt, axis=1)
    return APEResult(
        rmse=float(np.sqrt(np.mean(err**2))),
        mean=float(err.mean()),
        median=float(np.median(err)),
        std=float(err.std()),
        min=float(err.min()),
        max=float(err.max()),
        num_pairs=int(err.size),
    )


def evaluate_tum_files(
    gt_path: str, est_path: str, align_sim3: bool = True, max_diff: float = 0.01
) -> APEResult:
    """evo_ape-style evaluation of two TUM files."""
    gt = read_tum_trajectory(gt_path)
    est = read_tum_trajectory(est_path)
    ia, ib = associate(gt["timestamps"], est["timestamps"], max_diff)
    if ia.size < 2:
        raise ValueError(
            f"only {ia.size} timestamp associations between {gt_path} and {est_path}"
        )
    return ape_translation(gt["positions"][ia], est["positions"][ib], align_sim3)
