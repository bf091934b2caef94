"""conv_chain dec2 baseline WITHOUT the vmem_limit compiler param
(fresh process so the jit cache cannot reuse the limited executable).

Usage: python scripts/exp_chain5.py > /tmp/exp_chain5.log 2>&1
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import wsiseg_tpu.ops.conv9 as c9

_orig = c9.pltpu.CompilerParams
def _patched(**kw):
    kw.pop("vmem_limit_bytes", None)
    return _orig(**kw)
c9.pltpu.CompilerParams = _patched

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
h, w = 384, 512
chans = [384, 256, 256]
x = jnp.asarray(rng.randn(h, w, chans[0]).astype(np.float32)).astype(jnp.bfloat16)
layers = []
for ci, co in zip(chans[:-1], chans[1:]):
    k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(co).astype(np.float32))
    layers.append((k, None, b, True))
fl = sum(h * w * 9 * 2 * ci * co for ci, co in zip(chans[:-1], chans[1:]))
fn = jax.jit(lambda x: c9.conv_chain(x, layers, br=8, wc=256))
t0 = time.time()
y = fn(x); float(jnp.sum(y[:8, :8].astype(jnp.float32)))
print(f"compile {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
for _ in range(10): y = fn(x)
float(jnp.sum(y[:2, :2].astype(jnp.float32)))
dt = (time.time() - t0) / 10
print(f"dec2 chain NO-vmem-limit: {dt*1e3:.2f} ms  {fl/dt/1e12:.2f} TF/s",
      flush=True)
