"""Golden-image comparisons against the reference's own checked-in renders
(SURVEY.md §4: the reference's validation is golden-image-by-eyeball; these
tests make it quantitative).

Comparisons are in TONEMAPPED space at reduced resolution (box filter).
Tolerances account for (a) Monte-Carlo noise in the low-spp goldens and
(b) gamma concavity making noisier renders slightly darker on average.
"""

import dataclasses

import jax
import numpy as np
import pytest
from PIL import Image

from tests.conftest import SCENES
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.io.image import read_png, tonemap_srgb
from tinyraytracing_tpu.render import render


def _golden(path, size):
    img = read_png(path)
    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BOX), np.float64
    )


@pytest.mark.slow
def test_back_scene_matches_golden(test_scene):
    scene, cam = test_scene
    size, spp = 64, 24
    cam = dataclasses.replace(cam, width=size, height=size)
    cfg = RenderConfig(intersector="mxu", max_depth=10, tri_chunk=64)
    ours = tonemap_srgb(
        np.asarray(render(scene, cam, jax.random.PRNGKey(0), cfg, spp))
    ).astype(np.float64)
    gold = _golden(f"{SCENES}/test/image10.png", size)

    # The golden is a 10-spp render: per-pixel MC noise is large, and the
    # concave tonemap + uint8 clipping systematically DARKEN noisy renders
    # (E[g(X)] < g(E[X])), so our cleaner render reads ~10-16% brighter.
    # The tight cross-implementation fidelity check is
    # test_cornell_matches_cpu_reference_render below; here we bound the
    # drift and require strong structural correlation.
    for c in range(3):
        rel = abs(ours[..., c].mean() - gold[..., c].mean()) / gold[..., c].mean()
        assert rel < 0.2, (c, rel)
        assert ours[..., c].mean() > gold[..., c].mean() - 2  # brighter side only
    for sl in (np.s_[:32, :32], np.s_[:32, 32:], np.s_[32:, :32], np.s_[32:, 32:]):
        rel = abs(ours[sl].mean() - gold[sl].mean()) / gold[sl].mean()
        assert rel < 0.25, (sl, rel)
    # pixelwise correlation: same image content, not just same brightness
    a = ours.mean(-1).ravel() - ours.mean()
    b = gold.mean(-1).ravel() - gold.mean()
    corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    assert corr > 0.85, corr


@pytest.mark.slow
def test_cornell_matches_cpu_reference_render():
    """Cross-implementation fidelity: our TPU-native renderer vs the CPU
    reimplementation of the reference estimator (baselines/cpu_reference.cc)
    on the same synthesized cornell geometry."""
    import os
    import subprocess

    from tinyraytracing_tpu.models.procedural import cornell_box

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = os.path.join(root, "baselines", "cpu_ref")
    if not os.path.exists(exe):
        try:
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-std=c++17",
                 os.path.join(root, "baselines", "cpu_reference.cc"), "-o", exe],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            pytest.skip("no native toolchain")
    out = os.path.join(root, "baselines", "_test_cornell.ppm")
    subprocess.run([exe, "96", "96", "24", out], check=True, capture_output=True)
    with open(out, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        f.readline()
        ref = np.frombuffer(f.read(), np.uint8).reshape(h, w, 3).astype(np.float64)

    scene, cam = cornell_box(width=96, height=96)
    cfg = RenderConfig(intersector="mxu", max_depth=10, tri_chunk=64)
    ours = tonemap_srgb(
        np.asarray(render(scene, cam, jax.random.PRNGKey(1), cfg, 24))
    ).astype(np.float64)

    for c in range(3):
        rel = abs(ours[..., c].mean() - ref[..., c].mean()) / ref[..., c].mean()
        assert rel < 0.06, (c, rel)
    a = ours.mean(-1).ravel() - ours.mean()
    b = ref.mean(-1).ravel() - ref.mean()
    corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    assert corr > 0.92, corr
