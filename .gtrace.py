import sys, os, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.data import synthetic_batch
from scflow_tpu.training import Config, ModelConfig, build_model, render_at_pose

B = 32
cfg = Config(model=ModelConfig(num_class=21, iters=8, test_iters=8,
                               dtype="bfloat16"))
bank = make_test_meshes(num_classes=21, subdivisions=3, radius=60.0)
renderer = Renderer(bank, image_size=(256, 256))
model = build_model(cfg)
batch = synthetic_batch(jax.random.PRNGKey(0), renderer, B)
rendered, depth, _ = jax.jit(lambda r, t, k, lab: render_at_pose(
    renderer, r, t, k, lab, cfg.data.normalize_mean, cfg.data.normalize_std))(
    batch["ref_rotations"], batch["ref_translations"], batch["k"],
    batch["labels"])
variables = jax.jit(model.init)(
    jax.random.PRNGKey(1), rendered, batch["real_images"],
    batch["ref_rotations"], batch["ref_translations"], depth,
    batch["k"], batch["labels"])
params, bstats = variables["params"], variables.get("batch_stats", {})

@jax.jit
def fwd(rend, real, r, t, d, k, lab):
    return model.apply({"params": params, "batch_stats": bstats},
                       rend, real, r, t, d, k, lab, train=False)

args = (rendered, batch["real_images"], batch["ref_rotations"],
        batch["ref_translations"], depth, batch["k"], batch["labels"])
out = fwd(*args); jax.block_until_ready(out)
logdir = "/tmp/gtrace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(5):
    out = fwd(*args)
jax.block_until_ready(out)
jax.profiler.stop_trace()

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    ev = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), ""):
            dur[e.get("name", "?")] += e.get("dur", 0)
    print(f"total device us/step: {sum(dur.values())/5:.0f}")
    for nm, d in dur.most_common(40):
        print(f"{d/5:9.1f} us/step  {nm[:110]}")
