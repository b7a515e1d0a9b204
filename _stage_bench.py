import time, sys
def log(m):
    print(time.strftime("%H:%M:%S"), m, file=sys.stderr, flush=True)
import numpy as np
import jax, jax.numpy as jnp
from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import DHDNet
from dhd_tpu.models.dhd import ImageEncoder, MGHSTransform, BEVEncoder
from dhd_tpu.nn import UNet

def bench(make_step, iters=20):
    """make_step() -> jitted fn(carry)->carry. Chained + host-read timing."""
    step = make_step
    c = jnp.zeros((), jnp.float32)
    c = step(c); _ = float(c)      # compile + run to completion
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    _ = float(c)
    return (time.perf_counter() - t0) / iters * 1e3

cfg = get_config("dhd_s")
dt = jnp.bfloat16
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, with_gt=False).items()}

log("init model")
model = DHDNet(cfg, dtype=dt)
variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
_ = float(jnp.sum(jax.tree.leaves(variables)[0].astype(jnp.float32)))

@jax.jit
def full_step(c):
    b = dict(batch); b["imgs"] = batch["imgs"] + c.astype(batch["imgs"].dtype)
    out = model.apply(variables, b, train=False)["occ_logits"]
    return jnp.tanh(jnp.mean(out)) * 1e-6
print("full fwd: %.2f ms" % bench(full_step), flush=True)

enc = ImageEncoder(cfg, dtype=dt)
imgs = batch["imgs"].astype(dt).reshape(6, 256, 704, 3)
ev = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), imgs))()
_ = float(jnp.sum(jax.tree.leaves(ev)[0].astype(jnp.float32)))
@jax.jit
def enc_step(c):
    out = enc.apply(ev, imgs + c.astype(dt))[0]
    return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-6
print("img encoder: %.2f ms" % bench(enc_step), flush=True)

vt = MGHSTransform(cfg, dtype=dt)
feat = jnp.ones((1, 6, 16, 44, 256), dt) * 0.01
geom = {k: batch[k] for k in ("sensor2keyego", "intrins", "post_rots", "post_trans", "bda")}
vv = jax.jit(lambda: vt.init(jax.random.PRNGKey(0), feat, geom))()
_ = float(jnp.sum(jax.tree.leaves(vv)[0].astype(jnp.float32)))
@jax.jit
def vt_step(c):
    out = vt.apply(vv, feat + c.astype(dt), geom)["vox"]
    return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-6
print("vt (heightnet+pool): %.2f ms" % bench(vt_step), flush=True)

bev = BEVEncoder(cfg, dtype=dt)
bx = jnp.ones((1, 200, 200, 64), dt) * 0.01
bv = jax.jit(lambda: bev.init(jax.random.PRNGKey(0), bx))()
_ = float(jnp.sum(jax.tree.leaves(bv)[0].astype(jnp.float32)))
@jax.jit
def bev_step(c):
    out = bev.apply(bv, bx + c.astype(dt))
    return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-6
print("bev encoder: %.2f ms" % bench(bev_step), flush=True)

for cin, cout in ((256, 64), (256, 128), (512, 64)):
    un = UNet(n_classes=cout, dtype=dt)
    ux = jnp.ones((1, 200, 200, cin), dt) * 0.01
    uv = jax.jit(lambda: un.init(jax.random.PRNGKey(0), ux))()
    _ = float(jnp.sum(jax.tree.leaves(uv)[0].astype(jnp.float32)))
    def mk(un=un, uv=uv, ux=ux):
        @jax.jit
        def s(c):
            out = un.apply(uv, ux + c.astype(dt))
            return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-6
        return s
    print(f"unet({cin}->{cout}): %.2f ms" % bench(mk()), flush=True)
