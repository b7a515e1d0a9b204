"""XLA segment_sum vs Pallas kernel at DHD-S pooling scale (scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.ops.pallas_pool import segment_sum_pooling


def chained(fn, x, iters=20):
    c = jnp.zeros((), jnp.float32)
    step = jax.jit(lambda c: jnp.tanh(
        jnp.sum(fn(x + c.astype(x.dtype)))) * 1e-6)
    c = step(c)
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    _ = float(c)
    return (time.perf_counter() - t0) / iters


def main():
    # DHD-S scale: P = 6 cams * 44 D * 16 * 44 px, V = 16*200*200, C = 64
    p, v, c = 6 * 44 * 16 * 44, 16 * 200 * 200, 64
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(0, 1, (p, c)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, v, p).astype(np.int32))

    t = chained(lambda x: jax.ops.segment_sum(x, seg, num_segments=v + 1),
                vals)
    print(f"XLA segment_sum: {t * 1e3:.2f} ms", flush=True)

    t = chained(lambda x: segment_sum_pooling(x, seg, v), vals)
    print(f"Pallas (sort inside): {t * 1e3:.2f} ms", flush=True)

    order = jnp.argsort(seg)
    vals_s = jnp.take(vals, order, axis=0)
    seg_s = jnp.take(seg, order)
    from dhd_tpu.ops.pallas_pool import sorted_segment_sum_pallas
    t = chained(lambda x: sorted_segment_sum_pallas(x, seg_s, v), vals_s)
    print(f"Pallas (presorted): {t * 1e3:.2f} ms", flush=True)

    t = chained(lambda x: jax.ops.segment_sum(
        x, seg_s, num_segments=v + 1, indices_are_sorted=True), vals_s)
    print(f"XLA segment_sum (sorted hint): {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
