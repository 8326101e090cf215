"""Inverse-rendering demo (BASELINE.json config 4): recover material albedo
on the Cornell box by pixel-gradient descent.

Renders a target image with the true albedos, perturbs them, then descends
the MSE pixel loss using path-replay gradients. Writes target / initial /
recovered renders plus a JSON log of loss + albedo error per step.

Usage: python examples/inverse_rendering.py [--steps 60] [--size 48] [--out DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.diff.inverse import SceneParams, render_loss
from tinyraytracing_tpu.io.image import write_png
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.render import render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5.0)
    ap.add_argument("--out", default="/tmp/inverse_rendering")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = RenderConfig(intersector="mxu", max_depth=4, tri_chunk=64)
    scene, cam = cornell_box(width=args.size, height=args.size)
    key = jax.random.PRNGKey(0)

    target = render(scene, cam, key, cfg, args.spp)
    write_png(f"{args.out}/target.png", np.asarray(target))

    kd_true = scene.kd
    kd = kd_true * 0.4 + 0.25  # perturbed start
    # emissive materials' Kd is unobservable (emissive hits return radiance
    # directly) — exclude from the recovery-error metric
    observable = ~np.asarray(scene.mtl_emissive)

    def loss_fn(kd, k):
        return render_loss(SceneParams(kd=kd), scene, cam, k, target, cfg, args.spp)

    write_png(
        f"{args.out}/initial.png",
        np.asarray(render(dataclasses.replace(scene, kd=kd), cam, key, cfg, args.spp)),
    )

    g_fn = jax.jit(jax.value_and_grad(loss_fn))
    log = []
    for step in range(args.steps):
        # target and render share the key: the MC noise cancels in the
        # residual, so the loss floor is 0 and descent is exact
        l, g = g_fn(kd, key)
        kd = kd - args.lr * g
        err = float(np.abs(np.asarray(kd - kd_true))[observable].max())
        log.append(dict(step=step, loss=float(l), kd_max_err=err))
        if step % 10 == 0:
            print(f"step {step:3d}  loss {float(l):.6f}  |kd err| {err:.4f}")

    write_png(
        f"{args.out}/recovered.png",
        np.asarray(render(dataclasses.replace(scene, kd=kd), cam, key, cfg, args.spp)),
    )
    with open(f"{args.out}/log.json", "w") as f:
        json.dump(log, f, indent=1)
    print(f"final loss {log[-1]['loss']:.6f}, kd max err {log[-1]['kd_max_err']:.4f}")
    print(f"outputs in {args.out}")


if __name__ == "__main__":
    main()
