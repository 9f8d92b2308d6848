"""Surface-metric tests (utils/mesh_eval.py): analytic-sphere ground truth.

The sphere gives every quantity a closed form: a surface-nets mesh of the
sphere SDF must score near-perfect F-score against uniform sphere samples
at a threshold of ~2 voxels, and a radially displaced mesh must lose
accuracy but not completeness symmetry.
"""

import json

import numpy as np
import pytest

from pi3_slam_tpu.mapping import surface_nets
from pi3_slam_tpu.utils.mesh_eval import (
    evaluate_mesh,
    sample_mesh_surface,
    surface_metrics,
)

RADIUS = 1.0


def _sphere_mesh(n=33, radius=RADIUS):
    g = np.linspace(-1.6, 1.6, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - radius
    verts, faces, _ = surface_nets(
        sdf, origin=np.array([-1.6] * 3), voxel_size=g[1] - g[0]
    )
    return verts, faces, g[1] - g[0]


def _sphere_samples(rng, n=20000, radius=RADIUS):
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True) * radius


def test_mesh_surface_sampling_uniform_by_area(rng):
    verts, faces, _ = _sphere_mesh()
    s = sample_mesh_surface(verts, faces, 20000, seed=1)
    assert s.shape == (20000, 3)
    r = np.linalg.norm(s, axis=1)
    # samples lie on the mesh (itself within ~half a voxel of the sphere)
    assert np.abs(r - RADIUS).max() < 0.15
    # area-uniform: every octant receives ~1/8 of the samples
    octant = (s[:, 0] > 0).astype(int) * 4 + (s[:, 1] > 0) * 2 + (s[:, 2] > 0)
    counts = np.bincount(octant, minlength=8) / len(s)
    assert np.abs(counts - 0.125).max() < 0.02


def test_sphere_mesh_scores_near_perfect(rng):
    verts, faces, vs = _sphere_mesh()
    gt = _sphere_samples(rng)
    m = evaluate_mesh(verts, faces, gt, threshold=2 * vs, n_samples=20000)
    assert m.fscore > 0.99, m.as_dict()
    assert m.accuracy < vs
    assert m.completeness < vs
    assert m.chamfer == pytest.approx(0.5 * (m.accuracy + m.completeness))


def test_displaced_mesh_loses_fscore(rng):
    verts, faces, vs = _sphere_mesh()
    gt = _sphere_samples(rng)
    base = evaluate_mesh(verts, faces, gt, threshold=2 * vs, n_samples=10000)
    # inflate the mesh radially by 4 voxels: accuracy/completeness degrade
    r = np.linalg.norm(verts, axis=1, keepdims=True)
    inflated = verts * (1 + 4 * vs / np.maximum(r, 1e-9))
    worse = evaluate_mesh(inflated, faces, gt, threshold=2 * vs, n_samples=10000)
    assert worse.fscore < 0.2 < base.fscore
    assert worse.accuracy > 3 * vs
    assert worse.completeness > 3 * vs


def test_partial_mesh_precision_recall_split(rng):
    """Half a sphere: precision stays high (every pred point is on the
    surface) while recall drops to ~the covered fraction."""
    verts, faces, vs = _sphere_mesh()
    keep = verts[faces].mean(axis=1)[:, 0] > 0  # +x hemisphere faces
    m = surface_metrics(
        sample_mesh_surface(verts, faces[keep], 10000, seed=2),
        _sphere_samples(rng),
        threshold=2 * vs,
    )
    assert m.precision > 0.99
    assert 0.3 < m.recall < 0.7
    assert m.completeness > m.accuracy


def test_auto_threshold_and_empty_inputs(rng):
    verts, faces, _ = _sphere_mesh()
    gt = _sphere_samples(rng)
    m = evaluate_mesh(verts, faces, gt, n_samples=5000)  # auto threshold
    assert m.threshold == pytest.approx(0.01 * np.linalg.norm(gt.max(0) - gt.min(0)), rel=1e-6)
    with pytest.raises(ValueError):
        surface_metrics(np.zeros((0, 3)), gt, 0.1)


def test_eval_mesh_cli(tmp_path, rng, capsys):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import eval_mesh as cli

    from pi3_slam_tpu.io.mesh import write_mesh_ply

    verts, faces, vs = _sphere_mesh()
    pred = str(tmp_path / "pred.ply")
    gt = str(tmp_path / "gt.ply")
    write_mesh_ply(verts, faces, pred)
    write_mesh_ply(verts, faces, gt)  # GT as a mesh: area-sampled by the CLI
    rc = cli.main(["--mesh", pred, "--gt", gt, "--threshold", str(2 * vs),
                   "--samples", "5000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fscore"] > 0.99
    assert out["num_gt"] == 5000
