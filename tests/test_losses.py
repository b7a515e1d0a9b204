"""Loss parity tests against independent torch/numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dhd_tpu.config import class_weights
from dhd_tpu.losses import (
    bce_distribution_loss, depth_height_labels, downsample_min_nonzero,
    geo_scal_loss, occ_ce_loss, occ_losses_fused, sem_scal_loss,
    shifted_onehot_labels)
from dhd_tpu.config import GridConfig


def _fake_occ(seed=0, v=500, n_cls=18):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, (v, n_cls)).astype(np.float32)
    labels = rng.integers(0, n_cls, (v,)).astype(np.int32)
    mask = (rng.random(v) < 0.7).astype(np.int32)
    return logits, labels, mask


def test_occ_ce_matches_torch():
    logits, labels, mask = _fake_occ()
    w = np.asarray(class_weights(), np.float32)
    ours = float(occ_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask), jnp.asarray(w)))
    # torch oracle replicating occ_head.loss: per-sample weighted CE,
    # weight=mask, avg_factor = sum of class weights over visible voxels.
    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(labels).long()
    tw = torch.from_numpy(w)
    ce = F.cross_entropy(tl, tt, weight=tw, reduction="none")
    tm = torch.from_numpy(mask.astype(np.float32))
    avg = sum((tt[tm.bool()] == i).sum() * tw[i] for i in range(18))
    expect = float((ce * tm).sum() / avg)
    assert np.isclose(ours, expect, rtol=1e-5)


def test_geo_scal_matches_oracle():
    logits, labels, mask = _fake_occ(seed=1)
    ours = float(geo_scal_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(mask), free_class=17))
    p = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    m = mask.astype(bool)
    empty_p = p[:, 17][m]
    nonempty_p = 1 - p[:, 17][m]
    nonempty_t = (labels[m] != 17).astype(np.float32)
    eps = 1e-5
    inter = (nonempty_t * nonempty_p).sum()
    precision = inter / (nonempty_p.sum() + eps)
    recall = inter / (nonempty_t.sum() + eps)
    spec = ((1 - nonempty_t) * empty_p).sum() / ((1 - nonempty_t).sum() + eps)
    expect = -sum(np.log(np.clip(x, 1e-5, 1 - 1e-5))
                  for x in (precision, recall, spec))
    assert np.isclose(ours, expect, rtol=1e-4)


def test_sem_scal_matches_oracle():
    logits, labels, mask = _fake_occ(seed=2)
    ours = float(sem_scal_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(mask)))
    p = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    m = mask.astype(bool)
    loss, count = 0.0, 0
    for i in range(17):
        pi = p[:, i][m]
        t = (labels[m] == i).astype(np.float32)
        if t.sum() > 0:
            count += 1
            nom = (pi * t).sum()
            lc = 0.0
            if pi.sum() > 0:
                lc += -np.log(np.clip(nom / (pi.sum() + 1e-5), 1e-5, 1 - 1e-5))
            if t.sum() > 0:
                lc += -np.log(np.clip(nom / (t.sum() + 1e-5), 1e-5, 1 - 1e-5))
            if (1 - t).sum() > 0:
                s = ((1 - pi) * (1 - t)).sum() / ((1 - t).sum() + 1e-5)
                lc += -np.log(np.clip(s, 1e-5, 1 - 1e-5))
            loss += lc
    expect = loss / count
    assert np.isclose(ours, expect, rtol=1e-4)


def test_fused_losses_match_separate():
    """occ_losses_fused == the three separate losses, values and grads."""
    import jax
    logits, labels, mask = _fake_occ(seed=5)
    w = jnp.asarray(class_weights(), jnp.float32)
    jl, jt, jm = jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)

    def sep(x):
        return (occ_ce_loss(x, jt, jm, w), geo_scal_loss(x, jt, jm, 17),
                sem_scal_loss(x, jt, jm))

    def fus(x):
        return occ_losses_fused(x, jt, jm, w, free_class=17)

    vs, vf = sep(jl), fus(jl)
    for a, b in zip(vs, vf):
        assert np.isclose(float(a), float(b), rtol=1e-5)
    gs = jax.grad(lambda x: sum(sep(x)))(jl)
    gf = jax.grad(lambda x: sum(fus(x)))(jl)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                               rtol=1e-4, atol=1e-6)


def test_downsample_min_nonzero():
    gt = np.zeros((1, 1, 4, 4), np.float32)
    gt[0, 0, 0, 0] = 5.0
    gt[0, 0, 1, 1] = 3.0
    gt[0, 0, 2, 3] = 7.0
    out = np.asarray(downsample_min_nonzero(jnp.asarray(gt), 2))
    assert out.shape == (1, 1, 2, 2)
    assert out[0, 0, 0, 0] == 3.0     # min nonzero of top-left block
    assert out[0, 0, 1, 1] == 7.0
    assert out[0, 0, 0, 1] == 1e5     # empty block


def test_shifted_onehot_depth_semantics():
    # depth flavour: idx = (d - (d0 - dt))/dt with d0=1, dt=0.5, D=44
    vals = jnp.asarray([[0.4, 1.0, 22.9, 23.0, 100.0]])
    oh = np.asarray(shifted_onehot_labels(vals, 1.0, 0.5, 44, True))
    assert oh.shape == (1, 5, 44)
    assert oh[0, 0].sum() == 0       # idx<1 -> dropped first column
    assert oh[0, 1].argmax() == 0 and oh[0, 1].sum() == 1   # d=1 -> bin 0
    assert oh[0, 2].sum() == 1       # d=22.9 -> last kept bin
    assert oh[0, 3].sum() == 0       # d=23 -> idx 45 >= D+1 -> zeroed
    assert oh[0, 4].sum() == 0


def test_bce_distribution_loss_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.random((2, 3, 4, 4, 10)).astype(np.float32) * 0.98 + 0.01
    labels = (rng.random((2, 3, 4, 4, 10)) < 0.1).astype(np.float32)
    fg = (rng.random((2, 3, 4, 4)) < 0.5)
    ours = float(bce_distribution_loss(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(fg)))
    tp = torch.from_numpy(pred[fg])
    tt = torch.from_numpy(labels[fg])
    expect = float(F.binary_cross_entropy(tp, tt, reduction="none").sum()
                   / max(1.0, fg.sum()))
    assert np.isclose(ours, expect, rtol=1e-5)


def test_depth_height_labels_pipeline():
    rng = np.random.default_rng(4)
    gt_d = np.where(rng.random((1, 2, 32, 32)) < 0.05,
                    rng.uniform(1, 40, (1, 2, 32, 32)), 0).astype(np.float32)
    gt_h = np.where(gt_d > 0,
                    rng.uniform(-1, 5, (1, 2, 32, 32)), 0).astype(np.float32)
    d_lab, h_lab, fg = depth_height_labels(
        jnp.asarray(gt_d), jnp.asarray(gt_h), 16,
        GridConfig(1.0, 45.0, 0.5), 44, -1.0, 0.1, 65)
    assert d_lab.shape == (1, 2, 2, 2, 44)
    assert h_lab.shape == (1, 2, 2, 2, 65)
    assert fg.shape == (1, 2, 2, 2)
    # every fg pixel has exactly one depth bin
    assert np.all(np.asarray(d_lab).sum(-1)[np.asarray(fg)] == 1.0)


def test_packed_fused_matches_unpacked():
    """occ_losses_fused_packed on (V, Dz*n_cls) == occ_losses_fused on the
    (V, Dz, n_cls) view — values and grads (the packed form keeps the train
    loss off the 128-lane-padded classes-minor tiles)."""
    import jax
    from dhd_tpu.losses import occ_losses_fused_packed
    rng = np.random.default_rng(9)
    v, dz, n_cls = 300, 4, 18
    flat = jnp.asarray(rng.normal(0, 2, (v, dz * n_cls)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, n_cls, (v, dz)).astype(np.int32))
    mask = jnp.asarray((rng.random((v, dz)) < 0.6).astype(np.float32))
    w = jnp.asarray(class_weights(), jnp.float32)

    def unpacked(x):
        return occ_losses_fused(x.reshape(v, dz, n_cls), labels, mask, w,
                                free_class=17)

    def packed(x):
        return occ_losses_fused_packed(x, labels, mask, w, n_cls,
                                       free_class=17)

    vu, vp = unpacked(flat), packed(flat)
    for a, b in zip(vu, vp):
        assert np.isclose(float(a), float(b), rtol=1e-5), (vu, vp)
    gu = jax.grad(lambda x: sum(unpacked(x)))(flat)
    gp = jax.grad(lambda x: sum(packed(x)))(flat)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gp),
                               rtol=1e-4, atol=1e-6)
