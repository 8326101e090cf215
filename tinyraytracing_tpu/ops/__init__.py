"""Compute kernels: vector math, ray-scene intersection (brute-force and
BVH), BVH construction, and Monte-Carlo sampling primitives."""
