"""Measure the CPU baseline (BASELINE.md: the reference publishes no
numbers, so the baseline must be measured by running the reference
algorithm). Compiles baselines/cpu_reference.cc with OpenMP, runs the
BASELINE.json config-1 setup (cornell box 256x256 @ 64 spp), and writes
baselines/cpu_baseline.json, which bench.py picks up for "vs_baseline".

Usage: python baselines/run_cpu_baseline.py [W H SPP]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def compile_ref() -> str:
    exe = os.path.join(HERE, "cpu_ref")
    src = os.path.join(HERE, "cpu_reference.cc")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", src, "-o", exe],
            check=True,
        )
    return exe


def main():
    w, h, spp = (int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (256, 256, 64)
    exe = compile_ref()
    out_png = os.path.join(HERE, f"cpu_cornell_{w}x{h}_{spp}.ppm")
    res = subprocess.run(
        [exe, str(w), str(h), str(spp), out_png],
        check=True, capture_output=True, text=True,
    )
    line = res.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    data["config"] = "cornell-box (BASELINE.json config 1 geometry)"
    data["threads"] = os.cpu_count()
    with open(os.path.join(HERE, "cpu_baseline.json"), "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
