"""Regression bound on the --global-kv-merge approximation drift.

tools/kv_merge_drift.py is the synthetic proxy published in PARITY.md next to
the kv-merge FPS claim; this test pins its numbers so a wiring regression in
the merge path (group misalignment, wrong merge axis, scale loss — anything
that would silently wreck accuracy for users who enable the lever) fails
loudly. Random weights give near-uniform attention where merging is
near-exact by construction, so the proxy sharpens attention logits
(q_norm_scale x8) into the regime where merging actually bites; see the tool
docstring for the measured calibration.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from kv_merge_drift import drift_metrics, make_video_frames, sharpen_params  # noqa: E402
from test_pi3_model import TINY, make_tiny_params  # noqa: E402

from pi3_slam_tpu.models import pi3_forward  # noqa: E402


@pytest.mark.parametrize("merge", [2, 4])
def test_kv_merge_drift_bound(merge):
    params = sharpen_params(make_tiny_params(0), 8.0)
    rng = np.random.default_rng(1000)
    imgs = jnp.asarray(make_video_frames(rng, 8, 42, 56))
    fwd = jax.jit(pi3_forward, static_argnames=("cfg",))
    exact = jax.tree.map(np.asarray, fwd(params, imgs, TINY))
    merged = fwd(params, imgs, dataclasses.replace(TINY, global_kv_merge=merge))
    d = drift_metrics(exact, merged)

    # measured (sharpen 8, correlated frames): point_rel ~2e-6,
    # trans_rel ~1e-4..1.4e-3, rot ~0..5e-3 deg — bounds at ~10x margin
    assert d["point_rel"] < 1e-4, d
    assert d["trans_rel"] < 2e-2, d
    assert d["rot_deg"] < 0.5, d
    assert d["conf_mad"] < 1e-4, d
    # and the merge path must actually have engaged (drift exactly zero
    # would mean it silently fell back to the exact path)
    assert d["trans_rel"] > 1e-8, d


def test_kv_merge_drift_metric_sensitivity():
    """The drift metric grows when the merge's core assumption (consecutive-
    frame correlation) is violated — evidence the proxy measures the merge,
    not numeric noise."""
    params = sharpen_params(make_tiny_params(0), 32.0)
    rng = np.random.default_rng(5)
    fwd = jax.jit(pi3_forward, static_argnames=("cfg",))
    cfg4 = dataclasses.replace(TINY, global_kv_merge=4)

    corr = jnp.asarray(make_video_frames(rng, 8, 42, 56))
    uncorr = jnp.asarray(rng.uniform(size=(1, 8, 3, 42, 56)).astype(np.float32))
    d_corr = drift_metrics(jax.tree.map(np.asarray, fwd(params, corr, TINY)),
                           fwd(params, corr, cfg4))
    d_uncorr = drift_metrics(jax.tree.map(np.asarray, fwd(params, uncorr, TINY)),
                             fwd(params, uncorr, cfg4))
    assert d_uncorr["trans_rel"] > 2.0 * d_corr["trans_rel"], (d_corr, d_uncorr)


@pytest.mark.slow
def test_kv_merge_ape_bridge_bound():
    """Task-level bound: the full online pipeline with --global-kv-merge 2/4
    must stay within 15% of trajectory span APE of the exact path on the
    sharpened synthetic protocol (measured median ~5-6%, PARITY.md round 5 —
    the SfM chain amplifies the ~1% forward drift), and must actually differ
    from it (wiring canary: a silently dead merge path would read as
    zero APE)."""
    from kv_merge_drift import ape_bridge

    rows = ape_bridge(merges=(2, 4), sharpen=8.0, seed=0, quiet=True)
    assert len(rows) == 2
    for r in rows:
        assert r["ape_rel_span"] < 0.15, r
        assert r["ape_rel_span"] > 1e-6, r
