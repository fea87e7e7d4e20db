import sys, time, subprocess, os
sys.path.insert(0, "/root/repo")
out = "/tmp/nbop"
subprocess.run([sys.executable, "/root/repo/tools/make_synthetic_bop.py",
                "--out", out, "--num-images", "6", "--num-classes", "2",
                "--height", "480", "--width", "640", "--max-objects", "4"],
               check=True, capture_output=True, cwd="/root/repo")
import numpy as np
from scflow_tpu.data.bop import RefineDataset
from scflow_tpu.data.loader import TestBatchBuilder
from scflow_tpu.rendering import load_mesh_dir
from scflow_tpu.training import Config, DataConfig, ModelConfig, build_points_bank

for use_native in (False, True):
    cfg = Config(model=ModelConfig(num_class=2),
                 data=DataConfig(image_scale=256, use_native=use_native))
    bank = load_mesh_dir(out + "/models")
    points = build_points_bank(bank, num_points=64)
    mp = [np.asarray(points.points[c]) for c in range(2)]
    ds = RefineDataset(out + "/test", out + "/init_poses",
                       out + "/image_lists/test.txt", class_names=("a", "b"))
    b = TestBatchBuilder(ds, cfg, mp)
    for i in range(len(b)): b[i]
    t0 = time.perf_counter(); n = 0
    for rep in range(8):
        for i in range(len(b)):
            item = b[i]
            if item is not None: n += 1
    dt = time.perf_counter() - t0
    print(f"use_native={use_native}: {n/dt:.1f} images/s ({1000*dt/n:.2f} ms/img), native_active={b._native}", flush=True)
