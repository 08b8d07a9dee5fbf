import time
import numpy as np, jax, jax.numpy as jnp
from cartseg_tpu.ops.pallas.median import _median_pallas
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(1)
B, N = 64, 512*512
x = np.clip(np.abs(rng.normal(size=(B, N))).astype(np.float32) * 0.5, 0, 1)
xd = jnp.asarray(x)
t0 = time.perf_counter()
got = np.asarray(_median_pallas(xd))
print("first call (compile) s:", time.perf_counter() - t0, flush=True)
want = np.median(x, axis=-1)
print("chip parity max abs err:", np.max(np.abs(got - want)), flush=True)
med_sort = jax.jit(lambda a: jnp.median(a, axis=-1))
_ = np.asarray(med_sort(xd)); print("sort lane compiled", flush=True)
def timeit(fn, reps=10, groups=5):
    out = []
    for g in range(groups):
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            r = fn(xd)
            acc = r if acc is None else acc + r
        float(jnp.sum(acc))
        out.append((time.perf_counter() - t0) / reps * 1e3)
    return out
print("pallas ms:", [round(v,2) for v in timeit(_median_pallas)], flush=True)
print("sort   ms:", [round(v,2) for v in timeit(med_sort)], flush=True)
