import sys, os, re
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.rendering.renderer import _render
from scflow_tpu.data import synthetic_batch

B = 32
bank = make_test_meshes(num_classes=21, subdivisions=3, radius=60.0)
r = Renderer(bank, image_size=(256, 256))
batch = synthetic_batch(jax.random.PRNGKey(0), r, B)
rot, tr, k, lab = (batch["ref_rotations"], batch["ref_translations"],
                   batch["k"], batch["labels"])

comp = _render.lower(r, rot, tr, k, lab).compile()
txt = comp.as_text()
print("HLO len", len(txt))
# find the definitions of the hot ops from the trace
for name in ["copy.444", "fusion.7", "reshape.10", "fusion.13", "fusion.12",
             "fusion.11", "fusion.8", "fusion.10", "fusion.6", "reshape.2",
             "copy.424", "concatenate.2", "fusion.9"]:
    pat = re.compile(r"^\s*%?" + re.escape(name) + r"\s*=.*$", re.M)
    m = pat.search(txt)
    print("\n##", name)
    print(m.group(0)[:400] if m else "  (not found)")
