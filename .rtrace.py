import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.data import synthetic_batch

B = 32
bank = make_test_meshes(num_classes=21, subdivisions=3, radius=60.0)
r = Renderer(bank, image_size=(256, 256))
batch = synthetic_batch(jax.random.PRNGKey(0), r, B)
rot, tr, k, lab = (batch["ref_rotations"], batch["ref_translations"],
                   batch["k"], batch["labels"])

out = r(rot, tr, k, lab); jax.block_until_ready(out)
logdir = "/tmp/rtrace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(5):
    out = r(rot, tr, k, lab)
jax.block_until_ready(out)
jax.profiler.stop_trace()

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    ev = data.get("traceEvents", [])
    # find TPU device pids
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur_by_name = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), ""):
            nm = e.get("name", "?")
            dur_by_name[nm] += e.get("dur", 0)
    total = sum(dur_by_name.values())
    print(f"total device us (5 steps): {total}")
    for nm, d in dur_by_name.most_common(25):
        print(f"{d/5:10.1f} us/step  {nm[:100]}")
