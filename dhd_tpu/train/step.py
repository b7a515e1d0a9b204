"""Training / eval steps.

One jitted function = the whole reference train iteration
(EpochBasedRunner.train -> DHD.forward_train -> backward -> DDP all-reduce ->
grad clip -> AdamW -> MEGVIIEMAHook; SURVEY.md §3.1).  Under a data-sharded
mesh the gradient all-reduce and SyncBN come from GSPMD; nothing here is
device-count specific.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dhd_tpu.config import ModelConfig, class_weights
from dhd_tpu.losses import (
    bce_distribution_loss, depth_height_labels, occ_losses_fused,
    occ_losses_fused_packed)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Any                      # EmaState or None
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def total_loss(cfg: ModelConfig, out: Dict[str, jnp.ndarray],
               batch: Dict[str, jnp.ndarray]
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Assemble the DHD loss dict (DHD_model.py:135-205, occ_head.py:102-139).

    losses = loss_height (+ loss_depth for stereo variants)
           + weight_ce * CE + weight_sem * sem_scal + weight_geo * geo_scal
    """
    lc = cfg.loss
    vt = cfg.vt
    d_labels, h_labels, fg = depth_height_labels(
        batch["gt_depth"], batch["gt_height"], vt.downsample, vt.gt_depth,
        vt.D, vt.height_min, vt.height_interval, vt.num_height_bins)

    losses = {}
    # checkpoint: recompute the clamped-log BCE terms in the backward
    # instead of saving their f32 (B,N,fH,fW,K) residuals (K=88 for the
    # stereo presets' depth flavour — ~60 MB each at B=4)
    bce = jax.checkpoint(bce_distribution_loss)
    losses["loss_height"] = lc.loss_height_weight * bce(
        out["height"], h_labels, fg)
    if cfg.depth_net == "full":
        losses["loss_depth"] = lc.loss_depth_weight * bce(
            out["depth"], d_labels, fg)

    sem = batch["voxel_semantics"]
    mask = batch["mask_camera"]
    cw = jnp.asarray(class_weights(lc.num_classes), jnp.float32)
    # one softmax pass serves all three losses (equal to the separate
    # occ_ce/sem_scal/geo_scal calls — tests/test_losses.py); prefer the
    # packed (..., Dz*n_cls) logits — the classes-minor view pads 18 lanes
    # to the 128-lane HBM tile, 7.1x the loss traffic, and the packed
    # variant keeps every elementwise pass in the (V, Dz*n_cls) layout
    # (the (V, Dz, n_cls) formulation made XLA materialize ~15 ms/step of
    # f32[160000,16,18] relayouts in the DHD-S B=4 train step; remat only
    # duplicated them — occ_loss.py documents the layout-true rewrite)
    if "occ_logits_flat" in out:
        l_ce, l_geo, l_sem = occ_losses_fused_packed(
            out["occ_logits_flat"], sem, mask, cw, lc.num_classes,
            free_class=lc.free_class)
    else:
        l_ce, l_geo, l_sem = occ_losses_fused(out["occ_logits"], sem, mask,
                                              cw, free_class=lc.free_class)
    losses["loss_occ"] = lc.weight_ce * l_ce
    losses["loss_voxel_sem_scal"] = lc.weight_sem * l_sem
    losses["loss_voxel_geo_scal"] = lc.weight_geo * l_geo

    total = sum(losses.values())
    losses["loss_total"] = total
    return total, losses


def create_train_state(model, cfg: ModelConfig, rng, batch,
                       tx: optax.GradientTransformation,
                       with_ema: bool = True,
                       jit_init: bool = False) -> TrainState:
    from dhd_tpu.train.ema import ema_init

    if jit_init:
        # one compiled program instead of thousands of eager op dispatches —
        # the dominant cost on slow-dispatch hosts (1-core CPU driver)
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False))(rng, batch)
    else:
        variables = model.init(rng, batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    ema = ema_init(params, batch_stats, cfg.optim.ema_init_updates) \
        if with_ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema,
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(cfg: ModelConfig, donate: bool = True,
                    with_prev: bool = True):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``with_prev=False`` builds the early-epoch variant of temporal models
    (SequentialControlHook semantics); ignored for single-frame models.
    """
    from dhd_tpu.train.ema import ema_update

    extra = {} if not cfg.temporal else {"with_prev": with_prev}

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, **extra)
            loss, metrics = total_loss(cfg, out, batch)
            return loss, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_update(ema, new_params, new_stats,
                             base_decay=cfg.optim.ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt, ema=ema)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: ModelConfig, use_ema: bool = False):
    """Jitted eval: (state, batch) -> predicted class grid (B, Dx, Dy, Dz)."""
    def eval_step(state: TrainState, batch):
        params = state.ema.params if (use_ema and state.ema is not None) \
            else state.params
        stats = state.ema.batch_stats if (use_ema and state.ema is not None) \
            else state.batch_stats
        out = state.apply_fn({"params": params, "batch_stats": stats},
                             batch, train=False)
        # softmax -> argmax -> uint8 (occ_head.get_occ, occ_head.py:141-153)
        return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    return jax.jit(eval_step)
