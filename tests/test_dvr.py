"""dvr.render parity: JAX differentiable renderer vs a scalar numpy oracle
that restates the CUDA kernel (lib/dvr/dvr.cu:391-648) literally."""
import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.ops import render, render_expected_depth


def _oracle_render(sigma, origin, points, tindex, loss_name):
    """Literal per-ray restatement of render_cuda_kernel (dvr.cu:391-640):
    DDA traversal, expected depth, hand-written capped gradient."""
    n_, t_, vz, vy, vx = sigma.shape
    m_ = points.shape[1]
    pred = -np.ones((n_, m_))
    gt = -np.ones((n_, m_))
    grad = np.zeros_like(sigma, dtype=np.float64)
    for n in range(n_):
        for c in range(m_):
            t = int(tindex[n, c])
            if t < 0:
                continue
            ts = 0 if t_ == 1 else t
            xo, yo, zo = (float(v) for v in origin[n, t])
            xe, ye, ze = (float(v) for v in points[n, c])
            vxi, vyi, vzi = int(xo), int(yo), int(zo)
            rx, ry, rz = xe - xo, ye - yo, ze - zo
            gt_d = np.sqrt(rx * rx + ry * ry + rz * rz)
            dx, dy, dz = rx / gt_d, ry / gt_d, rz / gt_d
            sx, sy, sz = (1 if dx >= 0 else -1), (1 if dy >= 0 else -1), \
                (1 if dz >= 0 else -1)
            nbx = vxi + (0 if sx < 0 else 1)
            nby = vyi + (0 if sy < 0 else 1)
            nbz = vzi + (0 if sz < 0 else 1)
            inf = float("inf")
            tmx = (nbx - xo) / dx if dx != 0 else inf
            tmy = (nby - yo) / dy if dy != 0 else inf
            tmz = (nbz - zo) / dz if dz != 0 else inf
            tdx = sx / dx if dx != 0 else inf
            tdy = sy / dy if dy != 0 else inf
            tdz = sz / dz if dz != 0 else inf
            path, csd, p, d, dt = [], [], [], [], []
            last_d, was_inside, step = 0.0, False, 0
            while True:
                inside = (0 <= vxi < vx and 0 <= vyi < vy and 0 <= vzi < vz)
                if inside:
                    was_inside = True
                    path.append((vxi, vyi, vzi))
                elif was_inside:
                    break
                elif last_d > gt_d:
                    break
                if tmx < tmy:
                    if tmx < tmz:
                        _d = tmx; vxi += sx; tmx += tdx
                    else:
                        _d = tmz; vzi += sz; tmz += tdz
                else:
                    if tmy < tmz:
                        _d = tmy; vyi += sy; tmy += tdy
                    else:
                        _d = tmz; vzi += sz; tmz += tdz
                if inside:
                    px, py, pz = path[-1]
                    s = float(sigma[n, ts, pz, py, px])
                    delta = max(0.0, _d - last_d)
                    sd = s * delta
                    if not csd:
                        csd.append(sd)
                        p.append(1 - np.exp(-sd))
                    else:
                        csd.append(csd[-1] + sd)
                        p.append(np.exp(-csd[-2]) - np.exp(-csd[-1]))
                    d.append(_d)
                    dt.append(delta)
                last_d = _d
                step += 1
                if step > 1000:
                    break
            count = len(path)
            if count == 0:
                continue
            exp_d = sum(pi * di for pi, di in zip(p, d))
            p_out = np.exp(-csd[-1])
            max_d = d[-1]
            exp_d += p_out * max_d
            gt_c = min(gt_d, max_d)
            pred[n, c] = exp_d
            gt[n, c] = gt_c
            dd = [0.0] * count
            for i in range(count - 1, -1, -1):
                if i == count - 1:
                    dd[i] = p_out * max_d
                else:
                    dd[i] = dd[i + 1] - np.exp(-csd[i]) * (d[i + 1] - d[i])
            for i in range(count):
                dd[i] = dd[i] * dt[i] - dt[i] * p_out * max_d
            if loss_name == "l1":
                dl = 1.0 if exp_d >= gt_c else -1.0
            elif loss_name == "l2":
                dl = exp_d - gt_c
            else:
                dl = (1.0 / gt_c) if exp_d >= gt_c else -(1.0 / gt_c)
            for i, (px, py, pz) in enumerate(path):
                grad[n, ts, pz, py, px] += dl * dd[i]
    return pred, gt, grad


def _fixture(seed=0, n=2, t=2, zyx=(4, 5, 6), m=40):
    rng = np.random.default_rng(seed)
    vz, vy, vx = zyx
    sigma = rng.uniform(0.05, 1.5, (n, t, vz, vy, vx)).astype(np.float32)
    origin = np.stack([rng.uniform(1, vx - 1, (n, t)),
                       rng.uniform(1, vy - 1, (n, t)),
                       rng.uniform(1, vz - 1, (n, t))], -1).astype(np.float32)
    points = np.stack([rng.uniform(-2, vx + 2, (n, m)),
                       rng.uniform(-2, vy + 2, (n, m)),
                       rng.uniform(-2, vz + 2, (n, m))], -1) \
        .astype(np.float32)
    tindex = rng.integers(-1, t, (n, m)).astype(np.int32)
    return sigma, origin, points, tindex


def test_render_forward_matches_cuda_oracle():
    sigma, origin, points, tindex = _fixture()
    pred, gt, _ = render(jnp.asarray(sigma), jnp.asarray(origin),
                         jnp.asarray(points), jnp.asarray(tindex), "l1",
                         64)
    epred, egt, _ = _oracle_render(sigma, origin, points, tindex, "l1")
    np.testing.assert_allclose(np.asarray(pred), epred, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gt), egt, rtol=2e-4, atol=2e-4)


def test_render_grad_matches_cuda_backward():
    """Autodiff grad == the CUDA hand-written 'option 2' gradient."""
    sigma, origin, points, tindex = _fixture(seed=3)
    for loss in ("l1", "l2", "absrel"):
        _, _, g = render(jnp.asarray(sigma), jnp.asarray(origin),
                         jnp.asarray(points), jnp.asarray(tindex), loss, 64)
        _, _, eg = _oracle_render(sigma, origin, points, tindex, loss)
        np.testing.assert_allclose(np.asarray(g), eg, rtol=2e-3, atol=2e-4)


def test_render_padded_and_miss_rays():
    sigma, origin, points, tindex = _fixture(seed=5)
    tindex[:] = -1
    pred, gt, grad = render(jnp.asarray(sigma), jnp.asarray(origin),
                            jnp.asarray(points), jnp.asarray(tindex), "l2",
                            64)
    assert np.all(np.asarray(pred) == -1.0)
    assert np.all(np.asarray(gt) == -1.0)
    assert np.all(np.asarray(grad) == 0.0)


def test_render_expected_depth_is_differentiable():
    sigma, origin, points, tindex = _fixture(seed=7, n=1, t=1, m=16)

    def f(s):
        pred, gt, valid = render_expected_depth(
            s, jnp.asarray(origin), jnp.asarray(points),
            jnp.asarray(tindex), 64)
        return jnp.sum(jnp.where(valid, (pred - gt) ** 2, 0.0))

    g = jax.grad(f)(jnp.asarray(sigma))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0
