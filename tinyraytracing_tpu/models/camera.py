"""Differentiable pinhole camera + batched ray generation.

Viewport math is reference-identical (RayTracingOnCPU/camera.cpp:3-28):

    h          = tan(radians(fovy) / 2)
    viewport   = (2h * aspect, 2h) at focal distance 1
    w          = normalize(eye - lookat)
    u          = normalize(cross(up, w));  v = cross(w, u)
    horizontal = viewport_w * u;  vertical = viewport_h * v
    llc        = eye - horizontal/2 - vertical/2 - w
    ray(s, t)  = normalize(llc + s*horizontal + t*vertical - eye) from eye

Screen mapping + jitter follow the reference driver (main.cpp:88-93):
``x = j/(W-1) + (u-.5)/W``, ``y = (H-i)/(H-1) + (u-.5)/H`` (note the y flip
and the slight >1 overshoot at the top row — kept for fidelity).

Unlike the reference, the whole W*H ray batch is produced by one fused array
program, and (eye, lookat, up, fovy) are differentiable pytree leaves so
pixel gradients flow to camera pose (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tinyraytracing_tpu.ops.linalg import cross, normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    eye: jax.Array       # (3,)
    lookat: jax.Array    # (3,)
    up: jax.Array        # (3,)
    fovy: jax.Array      # () degrees
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(eye, lookat, up, fovy, width, height) -> "Camera":
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return Camera(
            eye=f32(eye), lookat=f32(lookat), up=f32(up), fovy=f32(fovy),
            width=int(width), height=int(height),
        )

    @property
    def aspect(self):
        return self.width / self.height


def camera_basis(cam: Camera):
    """(origin, horizontal, vertical, lower_left_corner) per camera.cpp:3-17."""
    theta = jnp.deg2rad(cam.fovy)
    h = jnp.tan(theta / 2.0)
    viewport_h = 2.0 * h
    viewport_w = cam.aspect * viewport_h
    w = normalize(cam.eye - cam.lookat)
    u = normalize(cross(cam.up, w))
    v = cross(w, u)
    horizontal = viewport_w * u
    vertical = viewport_h * v
    llc = cam.eye - horizontal / 2.0 - vertical / 2.0 - w
    return cam.eye, horizontal, vertical, llc


def generate_rays(cam: Camera, key: jax.Array):
    """One jittered camera ray per pixel, row-major (top row first).

    Returns (origins (N,3), directions (N,3)) with N = W*H.
    """
    W, H = cam.width, cam.height
    eye, horizontal, vertical, llc = camera_basis(cam)

    j = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)           # column
    i = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)         # row (0 = top)
    jit = jax.random.uniform(key, (2, W * H), dtype=jnp.float32) - 0.5
    x = j / (W - 1.0) + jit[0] / W
    y = (H - i) / (H - 1.0) + jit[1] / H

    d = llc[None, :] + x[:, None] * horizontal[None, :] + y[:, None] * vertical[None, :] - eye[None, :]
    d = normalize(d)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


def generate_rays_for_pixels(cam: Camera, pix: jax.Array, key: jax.Array):
    """Jittered rays for an arbitrary subset of pixels.

    ``pix``: (N,) int32 global row-major pixel indices (i*W + j). Used by the
    sharded renderer where each device owns a slice of the pixel space.
    """
    W, H = cam.width, cam.height
    eye, horizontal, vertical, llc = camera_basis(cam)
    pixf = pix.astype(jnp.float32)
    i = jnp.floor(pixf / W)
    j = pixf - i * W
    jit = jax.random.uniform(key, (2,) + pix.shape, dtype=jnp.float32) - 0.5
    x = j / (W - 1.0) + jit[0] / W
    y = (H - i) / (H - 1.0) + jit[1] / H
    d = llc[None, :] + x[:, None] * horizontal[None, :] + y[:, None] * vertical[None, :] - eye[None, :]
    d = normalize(d)
    return jnp.broadcast_to(eye, d.shape), d


def generate_rays_np(cam: Camera, x: np.ndarray, y: np.ndarray):
    """Host-side (numpy, float64) ray gen for unit tests against hand math."""
    fovy = float(cam.fovy)
    eye = np.asarray(cam.eye, dtype=np.float64)
    lookat = np.asarray(cam.lookat, dtype=np.float64)
    up = np.asarray(cam.up, dtype=np.float64)
    h = np.tan(np.deg2rad(fovy) / 2)
    vh, vw = 2 * h, 2 * h * cam.aspect
    w = eye - lookat
    w /= np.linalg.norm(w)
    u = np.cross(up, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    horizontal, vertical = vw * u, vh * v
    llc = eye - horizontal / 2 - vertical / 2 - w
    d = llc + x[:, None] * horizontal + y[:, None] * vertical - eye
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.broadcast_to(eye, d.shape), d
