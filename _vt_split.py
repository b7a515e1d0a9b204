"""Split view_transform cost: heightnet vs depthnet vs pooling (scratch)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.geometry import create_frustum, frustum_to_ego
from dhd_tpu.ops import compute_pool_indices, mghs_pool
from dhd_tpu.nn import HeightNet

def chained(step, iters=10):
    c = jnp.zeros((), jnp.float32)
    c = step(c); _ = float(c)
    t0 = time.perf_counter()
    for _ in range(iters): c = step(c)
    _ = float(c)
    return (time.perf_counter()-t0)/iters*1e3

cfg = get_config("dhd_s")
vt = cfg.vt
dt = jnp.bfloat16
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, with_gt=False).items()}
b, n = 1, 6
fh, fw = vt.feat_size
rng = np.random.default_rng(0)

# pooling only (precomputed indices, random depth/feat/mask)
coords = frustum_to_ego(create_frustum(vt.depth, vt.input_size, vt.downsample),
                        batch["sensor2keyego"], batch["intrins"],
                        batch["post_rots"], batch["post_trans"], batch["bda"])
idx = compute_pool_indices(coords, vt)
depth = jnp.asarray(rng.random((b, n, vt.D, fh, fw)).astype(np.float32)).astype(dt)
feat = jnp.asarray(rng.random((b, n, fh, fw, vt.out_channels)).astype(np.float32)).astype(dt)
mask = jnp.asarray((rng.random((b, n, fh, fw, 3)) < 0.34).astype(np.float32)).astype(dt)

@jax.jit
def pool_step(c):
    bev, vox = mghs_pool(depth + c.astype(dt), feat, mask, idx, vt)
    return jnp.tanh(jnp.sum(bev.astype(jnp.float32)) + jnp.sum(vox.astype(jnp.float32))) * 1e-9
print(f"pooling (2 segment-sums): {chained(pool_step):.2f} ms", flush=True)

# index build only
@jax.jit
def idx_step(c):
    co = frustum_to_ego(create_frustum(vt.depth, vt.input_size, vt.downsample),
                        batch["sensor2keyego"] + c, batch["intrins"],
                        batch["post_rots"], batch["post_trans"], batch["bda"])
    i2 = compute_pool_indices(co, vt)
    return jnp.tanh(jnp.sum(i2.seg_vox.astype(jnp.float32))) * 1e-12
print(f"coords+index build: {chained(idx_step):.2f} ms", flush=True)

# heightnet only
hn = HeightNet(mid_channels=vt.in_channels, height_channels=vt.num_height_bins,
               cfg=cfg.heightnet_cfg, dtype=dt)
x = jnp.asarray(rng.random((b*n, fh, fw, vt.in_channels)).astype(np.float32)).astype(dt)
mlp = jnp.zeros((b*n, 27), jnp.float32)
v = jax.jit(lambda: hn.init(jax.random.PRNGKey(0), x, mlp))()
_ = float(jnp.sum(jax.tree.leaves(v)[0].astype(jnp.float32)))
@jax.jit
def hn_step(c):
    out = hn.apply(v, x + c.astype(dt), mlp)
    return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-6
print(f"heightnet: {chained(hn_step):.2f} ms", flush=True)

# pallas pooling path
from dhd_tpu.ops.pallas_pool import segment_sum_pooling
vals = (depth[..., None] * feat[:, :, None]).reshape(-1, vt.out_channels)
@jax.jit
def pallas_step(c):
    out = segment_sum_pooling(vals + c.astype(dt), idx.seg_vox, idx.num_seg_vox)
    return jnp.tanh(jnp.sum(out)) * 1e-9
print(f"pallas vox pool (incl product+sort): {chained(pallas_step):.2f} ms", flush=True)

@jax.jit
def xla_step(c):
    out = jax.ops.segment_sum(vals + c.astype(dt), idx.seg_vox, num_segments=idx.num_seg_vox + 1)
    return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-9
print(f"xla vox pool (incl product): {chained(xla_step):.2f} ms", flush=True)
