import os, time
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(3)

# 1) reach kernel parity vs dilation fixpoint lane, on chip, realistic shapes
from cartseg_tpu.ops.edges import _hysteresis
from cartseg_tpu.ops.pallas.cc import reach_batch_pallas
B, H, W = 8, 512, 512
weak = (rng.random((B,H,W)) < 0.35)
strong = weak & (rng.random((B,H,W)) < 0.1)
wd, sd = jnp.asarray(weak), jnp.asarray(strong)
os.environ["CARTSEG_PALLAS_CC"] = "0"
want = np.asarray(_hysteresis(wd, sd))
os.environ["CARTSEG_PALLAS_CC"] = "1"
got = np.asarray(reach_batch_pallas(wd, sd))
print("reach parity:", (got == want).all(), "n_edges:", got.sum(), flush=True)

# 2) slimmed per-pixel area parity vs a numpy oracle, on chip
from cartseg_tpu.ops.connected_components import (
    connected_components, per_pixel_component_area)
m = rng.random((4, 256, 256)) < 0.4
lab = connected_components(jnp.asarray(m))
area = np.asarray(per_pixel_component_area(lab))
labn = np.asarray(lab)
ok = True
for b in range(4):
    vals, counts = np.unique(labn[b], return_counts=True)
    lut = dict(zip(vals.tolist(), counts.tolist()))
    want_b = np.vectorize(lut.get)(labn[b])
    ok &= (want_b == area[b]).all()
print("area parity:", ok, flush=True)
