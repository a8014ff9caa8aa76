"""LR and teacher-forcing schedules (SURVEY.md §3 #18)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from semi_supervised_asr_tpu.config import ObjectiveConfig, TrainConfig


def learning_rate_schedule(cfg: TrainConfig) -> optax.Schedule:
    base = cfg.learning_rate
    floor = base * cfg.lr_min_ratio
    if cfg.lr_schedule == "constant":
        main = optax.constant_schedule(base)
    elif cfg.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(
            base, max(cfg.decay_steps, 1), alpha=cfg.lr_min_ratio
        )
    elif cfg.lr_schedule == "exponential":
        main = optax.exponential_decay(
            base, max(cfg.decay_steps, 1), decay_rate=cfg.lr_min_ratio,
            end_value=floor,
        )
    elif cfg.lr_schedule == "noam":
        # Inverse-sqrt with built-in linear warmup (Vaswani 2017 §5.3),
        # normalized so the PEAK equals cfg.learning_rate at
        # step == warmup_steps — the standard schedule for the
        # transformer/conformer recipes.  Self-warming: the generic
        # linear-warmup join below is bypassed.
        if cfg.warmup_steps <= 0:
            raise ValueError("lr_schedule=noam requires warmup_steps > 0")
        warm = float(cfg.warmup_steps)

        def noam(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            return base * jnp.sqrt(warm) * jnp.minimum(
                s ** -0.5, s * warm ** -1.5
            )

        return noam
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base, cfg.warmup_steps)
        return optax.join_schedules([warm, main], [cfg.warmup_steps])
    return main


def tf_rate_at(step, obj: ObjectiveConfig):
    """Linear teacher-forcing decay from tf_rate_start to tf_rate_end."""
    frac = jnp.clip(
        jnp.asarray(step, jnp.float32) / max(obj.tf_decay_steps, 1), 0.0, 1.0
    )
    return obj.tf_rate_start + (obj.tf_rate_end - obj.tf_rate_start) * frac


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    lr = learning_rate_schedule(cfg)
    if cfg.optimizer == "adam":
        opt = optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.optimizer == "adamw":
        # never weight-decay the frozen fusion LM (its grads are exactly 0
        # via stop_gradient, but adamw decay is grad-independent)
        def decay_mask(params):
            import jax

            return jax.tree_util.tree_map_with_path(
                lambda path, _: "fusion_lm" not in jax.tree_util.keystr(path),
                params,
            )

        opt = optax.adamw(
            lr, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay,
            mask=decay_mask,
        )
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.freeze:
        # fine-tuning: zero the GRADIENTS of any param whose tree path
        # contains a freeze token (e.g. "listener" freezes the encoder) —
        # BEFORE clipping and the optimizer, so frozen params neither
        # inflate the global clip norm (which would shrink the live
        # params' effective LR) nor accumulate Adam moments.
        tokens = tuple(cfg.freeze)

        def frozen_mask(params):
            import jax

            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    t in jax.tree_util.keystr(path) for t in tokens
                ),
                params,
            )

        if cfg.grad_clip_norm > 0:
            return optax.chain(
                optax.masked(optax.set_to_zero(), frozen_mask),
                optax.clip_by_global_norm(cfg.grad_clip_norm),
                opt,
            )
        return optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask), opt
        )
    if cfg.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                           opt)
    return opt
