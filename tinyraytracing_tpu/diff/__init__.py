"""Differentiable rendering.

The reference is not differentiable at all; this package provides the
north-star capability (BASELINE.json): pixel gradients w.r.t. material
albedo, light radiance, vertex positions, and camera pose via path-replay
style backward passes (sampling decisions detached, contribution terms
differentiated — config.detach_sampling), validated against finite
differences in tests/test_diff.py.
"""

from tinyraytracing_tpu.diff.inverse import (
    SceneParams,
    apply_params,
    render_loss,
    make_train_step,
)

__all__ = ["SceneParams", "apply_params", "render_loss", "make_train_step"]
