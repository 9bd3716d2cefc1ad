"""µP-AdamW optimizer chain and LR schedule.

Reproduces the reference optimizer semantics (train_encoder.py:193-201,316-318):
  * base LR = lr * sqrt(global_batch_size) / 32
  * mup.MuAdamW: matrix-like params get LR / width_mult (see omnibiote_tpu.mup);
    --force_lr uses plain AdamW (uniform LR)
  * weight decay follows mup's default decoupled_wd=False: matrix-like
    groups also get wd * width_mult, so after the per-group LR the torch-AdamW
    effective decay lr*wd is uniform across parameter classes
    (TrainConfig.mup_decoupled_wd=True switches to mup's decoupled variant)
  * LinearLR 1.0 -> 0.0 over total_iters: factor(i) = max(0, 1 - i/total)
  * global grad-norm clip 1.0 before the step

Improvement over the reference: on resume the schedule continues from the
true step count instead of the reference's rebuilt scheduler whose start
factor is `trained/budget` (train_encoder.py:220) — i.e. a resume at 90%
restarts at 90% of peak LR there; here it resumes where it left off.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import OmniBioTAConfig, TrainConfig
from ..mup import lr_mult_tree, wd_mult_tree


class ClipByGlobalNormState(NamedTuple):
    """Carries the pre-clip global grad norm so the training loop can log
    it without a second full pass over the gradient tree (~1 GB fp32 at
    omnibiote-small)."""
    grad_norm: jnp.ndarray


def clip_by_global_norm_logging(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics (g *= min(1, max/||g||)), with
    the computed norm stashed in the state."""

    def init_fn(params):
        del params
        return ClipByGlobalNormState(jnp.zeros([], jnp.float32))

    def update_fn(updates, state, params=None):
        del params, state
        # per-leaf square-sums accumulate in fp32 regardless of grad dtype
        # (bf16 grads on the A=1 path would otherwise sum squares in bf16),
        # and the scale multiply preserves each leaf's dtype instead of
        # promoting bf16*f32 -> f32 (which would materialize the full fp32
        # grad buffer the bf16 path exists to avoid)
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree.leaves(updates)))
        scale = max_norm / jnp.maximum(gnorm, max_norm)
        updates = jax.tree.map(
            lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype),
            updates)
        return updates, ClipByGlobalNormState(gnorm)

    return optax.GradientTransformation(init_fn, update_fn)


def scaled_lr(train_cfg: TrainConfig) -> float:
    """lr * sqrt(batch)/32 (train_encoder.py:195; default batch 1024 -> x1)."""
    return train_cfg.lr * (train_cfg.batch_size ** 0.5) / 32.0


def linear_decay(base_lr: float, total_iters: int) -> Callable:
    """torch LinearLR(start_factor=1.0, end_factor=0.0, total_iters)."""
    def sched(count):
        frac = jnp.minimum(count, total_iters) / jnp.maximum(total_iters, 1)
        return base_lr * (1.0 - frac)
    return sched


def _scale_by_mup_lr(schedule: Callable, mult_tree) -> optax.GradientTransformation:
    """Per-leaf LR: update = -lr(t) * mult_leaf * u (descent direction)."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lr = schedule(state.count)
        updates = jax.tree.map(
            lambda u, m: u * (-lr * m), updates, mult_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def _add_mup_decayed_weights(weight_decay: float,
                             wd_mults) -> optax.GradientTransformation:
    """updates += wd * wd_mult_leaf * p — per-leaf decay so matrix-like
    params regain mup's wd*width_mult (see mup.wd_mult_tree)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay requires params")
        updates = jax.tree.map(
            lambda u, p, m: u + weight_decay * m * p.astype(u.dtype),
            updates, params, wd_mults)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_adam_mixed(b1: float, b2: float, eps: float,
                        state_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam semantics with the carried moments stored in
    `state_dtype` (bf16 halves the optimizer's HBM footprint — the lever
    that fits 1.07B fp32-master training on one 16 GB chip). All arithmetic
    (moment EMA, bias correction, the update quotient) runs in fp32; only
    the state written back between steps is rounded. State is the stock
    optax.ScaleByAdamState so checkpoints keep the same tree structure."""
    state_dtype = jnp.dtype(state_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def moments(g, m, n):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            u = (m32 / c1) / (jnp.sqrt(n32 / c2) + eps)
            return u, m32.astype(state_dtype), n32.astype(state_dtype)

        out = jax.tree.map(moments, updates, state.mu, state.nu)
        treedef = jax.tree.structure(updates)
        leaves = treedef.flatten_up_to(out)
        new_updates = treedef.unflatten([l[0] for l in leaves])
        mu = treedef.unflatten([l[1] for l in leaves])
        nu = treedef.unflatten([l[2] for l in leaves])
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params,
    model_cfg: OmniBioTAConfig,
    train_cfg: TrainConfig,
    total_iters: int,
) -> optax.GradientTransformation:
    """clip(1.0) -> Adam moments -> +wd*wd_mult*p -> per-leaf -lr(t)*mult."""
    base_lr = scaled_lr(train_cfg)
    mults = lr_mult_tree(params, model_cfg, force_lr=train_cfg.force_lr)
    wd_mults = wd_mult_tree(params, model_cfg, force_lr=train_cfg.force_lr,
                            decoupled=train_cfg.mup_decoupled_wd)
    mdt = jnp.dtype(getattr(train_cfg, "moment_dtype", "float32"))
    if mdt == jnp.dtype(jnp.float32):
        adam = optax.scale_by_adam(
            b1=train_cfg.beta1, b2=train_cfg.beta2, eps=train_cfg.epsilon)
    else:
        adam = scale_by_adam_mixed(
            b1=train_cfg.beta1, b2=train_cfg.beta2, eps=train_cfg.epsilon,
            state_dtype=mdt)
    return optax.chain(
        clip_by_global_norm_logging(train_cfg.grad_clip),
        adam,
        _add_mup_decayed_weights(train_cfg.weight_decay, wd_mults),
        _scale_by_mup_lr(linear_decay(base_lr, total_iters), mults),
    )


def current_lr(opt_state, model_cfg, train_cfg, total_iters) -> float:
    """LR at the current step (for logging, cf. train_encoder.py:326-332)."""
    count = int(opt_state[-1].count)
    base_lr = scaled_lr(train_cfg)
    return float(linear_decay(base_lr, total_iters)(count))
