"""Component timing of the fused train step on the attached chip.

Times each stage in isolation (fwd+bwd where relevant) with the bench's
flagship shapes, to direct kernel work at the real bottleneck.  Results
recorded in DESIGN.md's perf notes.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax_leaves_first(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = np.asarray(jax_leaves_first(out))
    return (time.perf_counter() - t0) / steps * 1000.0  # ms


def jax_leaves_first(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    return leaves[0].ravel()[:1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--tokens", type=int, default=48)
    p.add_argument("--lstm-backend", default=None,
                   help="LSTM backend (default pallas without --config); "
                        "with --config, giving it OVERRIDES the recipe's "
                        "model.lstm_backend, omitting it keeps the recipe's")
    p.add_argument("--platform", default=None)
    p.add_argument("--config", default=None,
                   help="profile a shipped recipe: take model/frontend/"
                        "train (remat, bf16 stream) from this YAML; "
                        "--batch/--frames/--tokens still set the shape")
    p.add_argument("--override", action="append", default=[],
                   help="with --config: section.key=value overrides "
                        "(repeatable)")
    args = p.parse_args()

    import jax

    if args.platform:
        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail
    import jax.numpy as jnp

    from semi_supervised_asr_tpu.config import (
        Config, FrontendConfig, ModelConfig, ObjectiveConfig, ParallelConfig,
        TrainConfig,
    )
    from semi_supervised_asr_tpu.models import seq2seq as M
    from semi_supervised_asr_tpu.objectives import losses as LO
    from semi_supervised_asr_tpu.training import schedules
    from semi_supervised_asr_tpu.training import train_step as TS

    if args.config:
        from semi_supervised_asr_tpu.config import load_config

        # --lstm-backend must not be silently ignored: apply it as an
        # override so A/Bing a recipe's backend measures what it says
        backend_ov = (
            [f"model.lstm_backend={args.lstm_backend}"]
            if args.lstm_backend else []
        )
        rcfg = load_config(
            args.config,
            ["model.vocab_size=65", *backend_ov, *args.override],
        )
        cfg = Config(
            frontend=rcfg.frontend, model=rcfg.model,
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=rcfg.train,
            parallel=ParallelConfig(donate_state=False),
        )
    else:
        cfg = Config(
            # matmul DFT matches bench.py's flagship default
            frontend=FrontendConfig(spec_augment=True, cmvn="global",
                                    fft_backend="matmul"),
            model=ModelConfig(
                n_mels=80, vocab_size=65, enc_hidden=256, enc_layers=3,
                enc_base_layers=1, attn_dim=128, attn_conv_channels=10,
                attn_conv_width=100, dec_hidden=512, dec_layers=1,
                embed_dim=256, compute_dtype="bfloat16",
                lstm_backend=args.lstm_backend or "pallas",
            ),
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=TrainConfig(learning_rate=1e-3),
            # timeit reuses the same state object every call — donation
            # would invalidate it after the first step
            parallel=ParallelConfig(donate_state=False),
        )
    rng = np.random.default_rng(0)
    b, f, u = args.batch, args.frames, args.tokens
    s = (f - 1) * cfg.frontend.hop_length
    audio = jax.device_put((rng.standard_normal((b, s)) * 0.1).astype(np.float32))
    audio_lens = jax.device_put(np.full((b,), s, np.int32))
    tokens = np.zeros((b, u), np.int32)
    tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
    tokens[:, u - 1] = 2
    tokens = jax.device_put(tokens)
    real = jax.device_put(np.ones((b,), bool))
    cmvn = (jax.device_put(np.zeros(80, np.float32)),
            jax.device_put(np.ones(80, np.float32)))

    state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # 1. full fused step
    step = TS.make_train_step(cfg)
    full = timeit(lambda: step(state, audio, audio_lens, tokens, real,
                               *cmvn)[1]["loss"])
    print(f"full fused step:            {full:7.2f} ms")

    # 2. frontend only (fwd; no grad flows into it)
    @jax.jit
    def frontend_only(audio, audio_lens):
        return TS.featurize(cfg, audio, audio_lens, cmvn,
                            jax.random.PRNGKey(0), True)[0]

    fe = timeit(lambda: frontend_only(audio, audio_lens))
    print(f"frontend fwd:               {fe:7.2f} ms")

    feats, flens = jax.jit(
        lambda a, al: TS.featurize(cfg, a, al, cmvn, None, False)
    )(audio, audio_lens)
    feats = jax.device_put(np.asarray(feats))

    # 3. encoder fwd+bwd.  The GRADS must be returned (not just the
    # value): returning value_and_grad(...)[0] lets XLA dead-code the
    # whole backward pass, silently timing forward-only.
    @jax.jit
    def enc_fb(params, feats, flens):
        def loss(p):
            enc, mask, keys = M.encode(p, feats, flens, cfg.model)
            return jnp.sum(enc * enc)
        return jax.value_and_grad(loss)(params)[1]

    ef = timeit(lambda: enc_fb(state.params, feats, flens))
    print(f"encoder fwd+bwd:            {ef:7.2f} ms")

    # 4. decoder+attention fwd+bwd (on precomputed encoder outputs)
    enc, mask, keys = jax.jit(
        lambda p: M.encode(p, feats, flens, cfg.model)
    )(state.params)
    enc = jax.device_put(np.asarray(enc))

    @jax.jit
    def dec_fb(params, enc, mask, tokens):
        def loss(p):
            from semi_supervised_asr_tpu.models import speller as S

            logits, _ = S.forward_teacher(
                p["speller"], cfg.model, enc, mask, tokens,
                tf_rate=1.0, rng=jax.random.PRNGKey(0))
            return LO.masked_ce(logits, tokens)[0]
        return jax.value_and_grad(loss)(params)[1]  # grads: no bwd DCE

    df = timeit(lambda: dec_fb(state.params, enc, mask, tokens))
    print(f"decoder+attn fwd+bwd:       {df:7.2f} ms")

    # 5. full loss fwd+bwd (frontend+enc+dec, no optimizer)
    @jax.jit
    def loss_fb(params):
        def loss(p):
            l, _ = LO.supervised_loss(
                p, cfg.model, cfg.objective, feats, flens, tokens, 1.0,
                jax.random.PRNGKey(0))
            return l
        return jax.value_and_grad(loss)(params)[1]  # grads: no bwd DCE

    lf = timeit(lambda: loss_fb(state.params))
    print(f"enc+dec loss fwd+bwd:       {lf:7.2f} ms")

    # 6. optimizer update only
    opt = schedules.make_optimizer(cfg.train)
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def opt_only(grads, opt_state, params):
        updates, new_state = opt.update(grads, opt_state, params)
        return jax.tree.leaves(updates)[0]

    oo = timeit(lambda: opt_only(grads, state.opt_state, state.params))
    print(f"optimizer update:           {oo:7.2f} ms")

    print(f"# sum of parts fe+loss+opt: {fe + lf + oo:7.2f} ms "
          f"(full step {full:.2f} ms)")


if __name__ == "__main__":
    main()
