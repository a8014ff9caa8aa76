"""Solver: the train/eval driver (SURVEY.md §3 #18, L3).

Mirrors the reference's ``Solver`` surface — ``train()``, ``validate()``,
``test()`` — rebuilt around the fused jit step:

* one compiled step per (frame_bucket, token_bucket) pair;
* semi-supervised mode zips the labeled stream with unlabeled audio/text
  streams (each padded to ONE static shape to bound compile count);
* periodic validation greedy-decodes the dev set and scores PER (phone) or
  CER/WER (char) via the native edit-distance kernel;
* orbax checkpoints every ``ckpt_every`` steps + best-metric retention;
* all device work stays on device — the host touches only raw batches and
  scalar metrics.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import Config
from semi_supervised_asr_tpu.data import registry
from semi_supervised_asr_tpu.data.bucketing import (
    make_batch_sizer,
    make_bucket_spec,
)
from semi_supervised_asr_tpu.data import pipeline as pipe
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.parallel import mesh as MESH
from semi_supervised_asr_tpu.training import train_step as TS
from semi_supervised_asr_tpu.training.checkpointing import Checkpointer
from semi_supervised_asr_tpu.utils import metrics as MET
from semi_supervised_asr_tpu.utils.logging import MetricsLogger


# re-captured on every image replacement: os.execv keeps the PID, so
# /proc starttime alone would charge an exec-restart generation with the
# whole previous generation's runtime
_IMPORT_T0 = time.perf_counter()


def _proc_age_s() -> float:
    """Seconds since THIS process image started.

    Used to attribute restart overhead: after an exec-restart boundary the
    fresh generation's time-to-first-step = dataset build + compile-cache
    deserialize + checkpoint restore.  Two clocks, take the min: the
    kernel's starttime covers interpreter bring-up but never resets across
    execv (same PID), while the module-import anchor resets on every image
    but misses exec→first-import.  min() is right in both regimes."""
    import_age = time.perf_counter() - _IMPORT_T0
    try:
        with open("/proc/self/stat") as f:
            fields = f.read().rsplit(") ", 1)[1].split()
        start_ticks = float(fields[19])  # starttime is field 22 overall
        with open("/proc/uptime") as f:
            uptime = float(f.read().split()[0])
        import os as _os
        proc_age = uptime - start_ticks / _os.sysconf("SC_CLK_TCK")
        return min(proc_age, import_age)
    except Exception:
        return import_age


# jax_compilation_cache_dir as configured BEFORE any Solver touched it
# (env JAX_COMPILATION_CACHE_DIR / caller's jax.config): recorded once so
# compile_cache_dir='auto' can respect a genuinely external setting while
# still re-pointing per-workdir when the knob was never externally set —
# a PREVIOUS Solver's own update must not masquerade as external config.
_EXTERNAL_COMPILE_CACHE: object = ...   # ... = not yet recorded


class Solver:
    def __init__(self, cfg: Config, workdir: str | Path, use_mesh: bool | None = None):
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)

        # persistent XLA compile cache: a restart/--resume at real dims
        # otherwise recompiles every bucket cell (tens of minutes after
        # a preemption); entries key on the HLO hash, so stale serves
        # are impossible.  Must be set before the first compile.
        cache = cfg.train.compile_cache_dir
        global _EXTERNAL_COMPILE_CACHE
        if _EXTERNAL_COMPILE_CACHE is ...:
            _EXTERNAL_COMPILE_CACHE = jax.config.jax_compilation_cache_dir
        if cache:
            # 'auto' must not clobber an EXTERNALLY configured cache dir
            # (JAX_COMPILATION_CACHE_DIR / jax.config set by the caller
            # before the first Solver); an explicit path in the YAML, by
            # contrast, is an explicit instruction and always wins
            current = jax.config.jax_compilation_cache_dir
            target = (cache if cache != "auto"
                      else (_EXTERNAL_COMPILE_CACHE
                            or str(self.workdir / "jit_cache")))
            if target != current:
                jax.config.update("jax_compilation_cache_dir", target)
                # jax's persistent-cache singleton initializes AT MOST
                # ONCE per process, bound to the dir configured at the
                # first eligible compile — after that, config updates are
                # silently ignored and entries keep landing in the OLD
                # dir.  Rebind it whenever this solver actually changes
                # the dir (second Solver in one process, test suites).
                try:
                    from jax._src import compilation_cache as _cc

                    _cc.reset_cache()
                except Exception:
                    pass   # private API; at worst the old binding stays
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )

        self.bundle = registry.build_datasets(cfg)
        self.vocab = self.bundle.vocab
        # finalize model config from data
        cfg = cfg.replace(
            model=__import__("dataclasses").replace(
                cfg.model,
                vocab_size=self.vocab.size,
                n_mels=cfg.frontend.n_mels,
                # joint CTC-attention: the head exists iff the loss uses it
                ctc_head=(cfg.model.ctc_head
                          or cfg.objective.lambda_ctc > 0.0),
            )
        )
        self.cfg = cfg
        self.semi = (
            cfg.objective.lambda_text_ae > 0.0
            or cfg.objective.lambda_pseudo > 0.0
        )
        self.from_features = cfg.data.use_feature_store
        if cfg.decode.use_ema:
            ema_live = (
                cfg.train.polyak_decay > 0.0
                or (cfg.objective.use_ema_teacher
                    and cfg.objective.lambda_pseudo > 0.0)
            )
            if not ema_live:
                raise ValueError(
                    "decode.use_ema needs a maintained EMA: set "
                    "train.polyak_decay > 0 (or train with the pseudo-label "
                    "EMA teacher) — otherwise ema_params is a frozen copy "
                    "of the INITIAL weights"
                )
            if cfg.decode.average_ckpts > 1:
                raise ValueError(
                    "decode.use_ema and decode.average_ckpts are mutually "
                    "exclusive — pick one weight-smoothing scheme"
                )
        if self.from_features and cfg.frontend.speed_perturb:
            raise ValueError(
                "frontend.speed_perturb is waveform-level and cannot apply "
                "to precomputed features (data.use_feature_store=true) — "
                "disable one of the two"
            )
        if self.from_features and cfg.frontend.noise_aug_prob > 0.0:
            raise ValueError(
                "frontend.noise_aug_prob is waveform-level and cannot apply "
                "to precomputed features (data.use_feature_store=true) — "
                "disable one of the two"
            )

        self.spec = make_bucket_spec(
            cfg.data, cfg.frontend, cfg.model.time_reduction
        )
        self.log = MetricsLogger(self.workdir)

        # global CMVN stats (cached).  Multi-host: every process computes
        # the same stats (deterministic over the full train set), but the
        # cache write is tmp+rename so concurrent hosts on a shared
        # filesystem can never interleave a partial npz.
        stats_path = self.workdir / "cmvn.npz"
        if stats_path.exists():
            z = np.load(stats_path)
            self.cmvn = (z["mean"], z["inv_std"])
        else:
            if self.from_features:
                mean, inv_std = pipe.compute_global_cmvn_features(
                    self.bundle.train
                )
            else:
                mean, inv_std = pipe.compute_global_cmvn(
                    self.bundle.train, cfg.frontend
                )
            import os as _os
            tmp = stats_path.with_suffix(
                f".{_os.getpid()}.{jax.process_index()}.tmp.npz"
            )
            np.savez(tmp, mean=mean, inv_std=inv_std)
            _os.replace(tmp, stats_path)
            self.cmvn = (mean, inv_std)

        # device mesh: data-parallel whenever >1 device is visible
        if use_mesh is None:
            use_mesh = len(jax.devices()) > 1
        self.mesh = MESH.make_mesh(cfg.parallel) if use_mesh else None
        if self.mesh is not None:
            n_data = self.mesh.devices.shape[0]
            assert cfg.train.batch_size % n_data == 0, (
                f"global batch_size {cfg.train.batch_size} must be divisible "
                f"by the data-axis size {n_data}; adjust train.batch_size or "
                f"run single-device (use_mesh=False)"
            )

        self.state = TS.init_train_state(
            cfg, jax.random.PRNGKey(cfg.train.seed)
        )
        if cfg.train.init_encoder_from:
            # BEST-RQ transfer: restore the pretrained listener subtree
            # over the fresh init (every family keeps its encoder under
            # params["listener"], so this covers LAS/transducer/CTC)
            from semi_supervised_asr_tpu.training.pretrain import (
                load_pretrained_encoder,
            )

            enc = load_pretrained_encoder(
                cfg.train.init_encoder_from, self.state.params["listener"]
            )
            params = dict(self.state.params, listener=enc)
            self.state = self.state._replace(
                params=params, ema_params=jax.tree.map(jnp.copy, params)
            )
            self.log.info(
                "encoder initialized from BEST-RQ pretraining at "
                f"{cfg.train.init_encoder_from}"
            )
        if cfg.model.lm_fusion != "none" and not cfg.model.lm_fusion_ckpt:
            self.log.info(
                f"WARNING: model.lm_fusion={cfg.model.lm_fusion!r} but "
                "model.lm_fusion_ckpt is empty — fusing a RANDOM untrained "
                "LM (train one with training/lm_trainer.py and point "
                "lm_fusion_ckpt at its workdir)"
            )
        if cfg.model.lm_fusion != "none" and cfg.model.lm_fusion_ckpt:
            # deep/cold fusion: graft the trained (frozen) LM into the
            # speller tree before any training/decoding
            from semi_supervised_asr_tpu.models.speller import attach_fusion_lm
            from semi_supervised_asr_tpu.training.lm_trainer import load_lm

            lm_params = load_lm(
                cfg.model.lm_fusion_ckpt, cfg, self.vocab.size,
                dims=(cfg.model.lm_fusion_embed, cfg.model.lm_fusion_hidden,
                      cfg.model.lm_fusion_layers),
            )
            params = dict(
                self.state.params,
                speller=attach_fusion_lm(
                    self.state.params["speller"], lm_params
                ),
            )
            self.state = self.state._replace(
                params=params, ema_params=jax.tree.map(jnp.copy, params)
            )
            self.log.info(
                f"{cfg.model.lm_fusion} fusion: frozen LM grafted from "
                f"{cfg.model.lm_fusion_ckpt}"
            )
        state_sh = None
        if self.mesh is not None and cfg.parallel.model_parallel > 1:
            # tensor parallelism: vocab-adjacent params live sharded over
            # the `model` axis (parallel/tp.py); shardings are taken from
            # the LIVE state so a grafted fusion LM is covered too
            from semi_supervised_asr_tpu.parallel import tp

            state_sh = tp.state_shardings(
                self.mesh, cfg.parallel, self.state
            )
            self.state = jax.device_put(self.state, state_sh)
        self.step_fn = TS.make_train_step(
            cfg, self.semi, self.mesh, from_features=self.from_features,
            state_shardings=state_sh,
        )
        self.ckpt = Checkpointer(
            self.workdir / cfg.train.ckpt_dir,
            max_to_keep=cfg.train.keep_ckpts,
            best_metric="dev_error",
            async_save=cfg.train.async_ckpt,
        )
        self._decode_fns: dict = {}
        self.data_pos = {"epoch": 0, "batch": 0}

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def _stream_shard(self) -> tuple[int, int, tuple[int, int, int] | None]:
        """(plan_shard, plan_nshards, row_shard) for the TRAINING streams.

        Multi-host mesh: every host iterates the SAME global plan —
        identical bucket shapes and launch counts per step are required
        for the processes' SPMD executables to agree (striding the plan
        per host, the old scheme, desyncs the moment two hosts draw
        different buckets at the same step) — and assembles only the rows
        its devices own on the data axis (``mesh.host_data_rows``).
        Cross-process TP thereby feeds hosts sharing a data row identical
        rows.  ``train.batch_size`` is GLOBAL in every configuration.

        Single host (or no mesh): the full plan, full rows."""
        if self.mesh is not None and jax.process_count() > 1:
            # (r0, r1, n_rows): the pipeline derives each batch's row
            # range from the batch's own length (constant-frames batching
            # makes B bucket-dependent — pipeline._slice_rows)
            return 0, 1, MESH.host_data_rows(self.mesh, self.cfg.parallel)
        return jax.process_index(), jax.process_count(), None

    def _train_batch_size(self):
        """int, or bucket_key->int under constant-frames batching
        (data.batch_frames) — labeled TRAINING stream only; eval and the
        unlabeled/text streams keep the fixed train.batch_size."""
        import math

        gran = 1
        if self.mesh is not None:
            gran = int(self.mesh.devices.shape[0])   # data-axis size
        # grad accumulation splits each batch into equal chunks — every
        # bucket's batch must divide by BOTH constraints
        gran = math.lcm(gran, max(self.cfg.train.grad_accum, 1))
        return make_batch_sizer(
            self.cfg.train.batch_size, self.cfg.data.batch_frames, gran
        )

    def _labeled_stream(self, start_epoch: int = 0, start_batch: int = 0):
        """Endless labeled stream yielding ``(epoch, batch_idx, batch)``;
        the train loop mirrors the position into ``self.data_pos`` AT
        CONSUME TIME (not here — the input prefetcher pulls ahead of the
        steps, and checkpoints must record the last batch a step actually
        consumed) so resume continues the EXACT stream: the first epoch
        fast-forwards past the ``start_batch`` already-consumed batches
        at plan cost (nothing is assembled or decoded for skipped
        entries)."""
        shard, n_shards, row_shard = self._stream_shard()
        bs = self._train_batch_size()

        def gen():
            epoch = start_epoch
            skip = start_batch
            while True:
                # SortaGrad warmup: ascending-length order for the first
                # data.sortagrad_epochs epochs, shuffled after
                sortagrad = epoch < self.cfg.data.sortagrad_epochs
                if self.from_features:
                    it = pipe.epoch_feature_batches(
                        self.bundle.train, self.spec,
                        bs, self.cfg.train.seed,
                        epoch, shard, n_shards,
                        self.cfg.data.drop_remainder,
                        sort_by_length=sortagrad, start_batch=skip,
                        row_shard=row_shard,
                    )
                elif self.cfg.data.grain_threads > 0:
                    from semi_supervised_asr_tpu.data.grain_pipeline import (
                        grain_epoch_batches,
                    )

                    it = grain_epoch_batches(
                        self.bundle.train, self.spec, self.cfg.frontend,
                        bs, self.cfg.train.seed,
                        epoch, shard, n_shards,
                        self.cfg.data.drop_remainder,
                        num_threads=self.cfg.data.grain_threads,
                        sort_by_length=sortagrad, start_batch=skip,
                        row_shard=row_shard,
                    )
                else:
                    it = pipe.epoch_batches(
                        self.bundle.train, self.spec, self.cfg.frontend,
                        bs, self.cfg.train.seed,
                        epoch, shard, n_shards,
                        self.cfg.data.drop_remainder,
                        sort_by_length=sortagrad, start_batch=skip,
                        row_shard=row_shard,
                    )
                n_yielded = 0
                for k, b in enumerate(it, start=skip):
                    yield epoch, k, b
                    n_yielded += 1
                if n_yielded == 0 and skip == 0:
                    # a FULL epoch produced no batches — without this the
                    # stream would rebuild epoch plans forever (a resume
                    # whose skip consumes the whole epoch rolls over
                    # legitimately, hence the skip==0 condition)
                    raise RuntimeError(
                        f"training epoch {epoch} produced ZERO batches: "
                        "every utterance exceeds the bucket grid "
                        "(data.frame_buckets/token_buckets) and/or fewer "
                        "eligible rows than train.batch_size remain with "
                        "data.drop_remainder=true — fix the bucket/batch "
                        "config for this corpus"
                    )
                epoch += 1
                skip = 0

        return gen()

    @staticmethod
    def _step_inputs(batch):
        """(array-ish x4) for the step, from either batch flavor."""
        if hasattr(batch, "audio"):
            return batch.audio, batch.audio_lens, batch.tokens, batch.real
        return batch.feats, batch.feat_lens, batch.tokens, batch.real

    def _unlabeled_streams(self, skip_batches: int = 0):
        """Unlabeled audio padded to the LARGEST frame bucket; text to the
        largest token bucket — one static shape each.

        ``skip_batches``: each semi step consumes exactly one batch per
        stream, so a resume fast-forwards both by the restored step count
        (plan-cost only) and the trajectory continues exactly."""
        shard, n_shards, row_shard = self._stream_shard()
        cfg = self.cfg
        ua = None
        if cfg.objective.lambda_pseudo > 0.0 and self.bundle.unlabeled_audio:
            import dataclasses as dc

            big = dc.replace(
                cfg.data,
                frame_buckets=(self.spec.frame_buckets[-1],),
                token_buckets=(self.spec.token_buckets[-1],),
            )
            big_spec = make_bucket_spec(
                big, cfg.frontend, cfg.model.time_reduction
            )
            if self.from_features:
                ua = pipe.repeating_feature_batches(
                    self.bundle.unlabeled_audio, big_spec,
                    cfg.train.batch_size, cfg.train.seed + 1,
                    shard_index=shard, num_shards=n_shards,
                    drop_remainder=False, skip_batches=skip_batches,
                    row_shard=row_shard,
                )
            else:
                ua = pipe.repeating_batches(
                    self.bundle.unlabeled_audio, big_spec, cfg.frontend,
                    cfg.train.batch_size, cfg.train.seed + 1,
                    shard_index=shard, num_shards=n_shards,
                    drop_remainder=False, skip_batches=skip_batches,
                    row_shard=row_shard,
                )
        ut = None
        if cfg.objective.lambda_text_ae > 0.0 and self.bundle.unlabeled_text:
            ut = pipe.text_batches(
                self.bundle.unlabeled_text, self.spec.token_buckets[-1],
                cfg.train.batch_size, cfg.train.seed + 2,
                shard_index=shard, num_shards=n_shards,
                skip_batches=skip_batches, row_shard=row_shard,
            )
        return ua, ut

    def _put(self, *arrays):
        if self.mesh is not None:
            return MESH.shard_batch_arrays(self.mesh, self.cfg.parallel, *arrays)
        return tuple(jnp.asarray(a) for a in arrays)

    def _acquire_workdir_lock(self) -> None:
        """Exclusive flock on <workdir>/.lock.p<process_index>.

        Two trainers on one workdir double-write metrics.jsonl and race
        orbax saves into the same tmp dirs — exactly the corruption that
        poisoned the r3 soak when a watchdog relaunch failed to kill the
        previous generation.  A second trainer must fail LOUDLY instead.
        The lock is per jax-process-index so legitimate multi-host DP
        trainers (distinct indices) coexist while a duplicate of the same
        rank collides.  flock is kernel-released on process death, so a
        crashed/killed trainer never wedges the workdir."""
        import fcntl

        if getattr(self, "_lock_fd", None) is not None:
            return   # this solver already holds it (train() re-entered)
        path = self.workdir / f".lock.p{jax.process_index()}"
        fd = open(path, "w")
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            fd.close()
            raise SystemExit(
                f"{self.workdir}: another trainer (process_index "
                f"{jax.process_index()}) already holds {path.name} — "
                "refusing to double-write metrics and race checkpoint "
                "saves on a shared workdir. Stop the other trainer or "
                "use a different --workdir."
            )
        fd.write(f"{__import__('os').getpid()}\n")
        fd.flush()
        # held while train() runs; python fds are CLOEXEC (PEP 446), so
        # an exec-restart releases the lock exactly at execv and the
        # successor process re-acquires it cleanly
        self._lock_fd = fd

    def _release_workdir_lock(self) -> None:
        """Close (= flock-release) the workdir lock fd.

        flock conflicts apply BETWEEN FDS, including two fds in one
        process — a lock held past train()'s return makes a second
        Solver resuming the same workdir in the same process die with
        SystemExit (advisor r4 high; reproduced by test_tp.py's
        train-then-resume).  The lock guards a LIVE training loop only,
        so train() releases it on every exit path."""
        fd, self._lock_fd = getattr(self, "_lock_fd", None), None
        if fd is not None:
            try:
                fd.close()
            except OSError:
                pass

    def train(self, resume: bool = False) -> dict:
        self._acquire_workdir_lock()
        try:
            # dead-save debris recovery belongs HERE, under the lock —
            # not in Checkpointer.__init__, where a read-only Solver
            # against a live workdir would rename the live trainer's
            # in-flight save (advisor r4 medium)
            self.ckpt.quarantine_stale_tmp()
            return self._train_locked(resume)
        finally:
            # exec-restart path included: main.py execv's AFTER this
            # returns, and the successor re-acquires cleanly; releasing
            # a moment before execv (vs the old CLOEXEC-at-execv) only
            # widens the unlocked window by microseconds
            self._release_workdir_lock()

    def _train_locked(self, resume: bool = False) -> dict:
        cfg = self.cfg
        # set at exec_restart_every boundaries; main.py os.execv's a
        # fresh process with --resume when it sees this
        self.restart_requested = False
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        start_batch = 0
        skip_unlab = 0
        if resume and self.ckpt.latest_step() is not None:
            self.state, self.data_pos, start = self.ckpt.restore(self.state)
            # exact mid-epoch resume: data_pos["batch"] was the index of
            # the LAST batch consumed before the save -> continue at +1;
            # unlabeled streams advance one batch per step -> fast-forward
            # by the restored step count (plan cost, nothing assembled)
            start_batch = self.data_pos["batch"] + 1
            skip_unlab = int(self.state.step)
            self.log.info(
                f"resumed from step {start} (epoch "
                f"{self.data_pos['epoch']}, next batch {start_batch})"
            )

        labeled = self._labeled_stream(self.data_pos["epoch"], start_batch)
        ua_stream, ut_stream = self._unlabeled_streams(skip_unlab)

        # data-coverage METRIC (not just a log line): utterances longer
        # than the largest (frame, token) bucket are skipped every epoch
        # — the r3 soak silently dropped ~0.5% of its corpus and nothing
        # in metrics.jsonl recorded it.  One "data" record per run makes
        # silent truncation visible to dashboards and the soak report.
        cov = {}
        for name, ds in (("train", self.bundle.train),
                         ("unlabeled", self.bundle.unlabeled_audio)):
            if ds is None or len(ds) == 0:
                continue
            if self.from_features:
                n_skip = sum(
                    1 for i in range(len(ds))
                    if self.spec.frame_bucket(ds.feat_len(i)) is None
                    or self.spec.token_bucket(ds.token_len(i)) is None
                )
            else:
                n_skip = sum(
                    1 for i in range(len(ds))
                    if self.spec.assign(ds.audio_len(i), ds.token_len(i))
                    is None
                )
            cov[f"{name}_utts"] = len(ds)
            cov[f"{name}_skipped"] = n_skip
            cov[f"{name}_skip_rate"] = n_skip / len(ds)
        if cov:
            self.log.log(int(self.state.step), cov, "data")

        t_last = time.perf_counter()
        frames_acc = 0
        last_eval = {}
        # restart/eval window accounting (the r4 soak's p10 throughput was
        # 42k vs median 136k and nothing attributed the gap): startup_wall
        # = exec→loop-entry (dataset build, cache init, restore); the
        # first-step wall (compile or cache deserialize) is logged with it
        # once step 1 of this process completes, under prefix "wall".
        startup_wall = _proc_age_s()
        first_step_t0: float | None = time.perf_counter()
        # early stopping: resume remembers the pre-crash best via the
        # checkpoint manager's per-step metrics (else a resumed plateau
        # would count its first eval as a fresh best and never stop)
        best_dev, evals_since_best = float("inf"), 0
        if resume and self.ckpt.best_step() is not None:
            try:
                m = self.ckpt.mgr.metrics(self.ckpt.best_step())
                if m and "dev_error" in m:
                    best_dev = float(m["dev_error"])
            except Exception:
                pass
        host_step = int(self.state.step)  # host-side mirror of state.step
        # Device-resident CMVN once, not a fresh transfer per step
        cmvn_dev = (jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1]))

        def input_stream():
            """(epoch, batch_idx, batch, full device-arg tuple) per step.

            Device transfers START here (``_put``), so wrapping this
            generator in ``_prefetch`` overlaps the NEXT step's H2D with
            the current step's compute — through a tunneled chip an
            implicit numpy->device transfer inside jit dispatch costs a
            round-trip handshake per argument (measured ~75ms/step at
            ls100 shapes vs ~3ms with device-resident args)."""
            for epoch, k, batch in labeled:
                args = self._put(*self._step_inputs(batch))
                if self.semi:
                    if ua_stream is not None:
                        ub = next(ua_stream)
                        ua_in = self._step_inputs(ub)
                        ua = self._put(ua_in[0], ua_in[1], ua_in[3])
                    else:  # text-AE only: feed zero-size-safe dummies
                        b_in = self._step_inputs(batch)
                        ua = self._put(
                            np.zeros_like(b_in[0]),
                            np.zeros_like(b_in[1]),
                            np.zeros_like(b_in[3]),
                        )
                    if ut_stream is not None:
                        toks, real = next(ut_stream)
                        ut = self._put(toks, real)
                    else:
                        ut = self._put(
                            np.zeros_like(batch.tokens),
                            np.zeros_like(batch.real),
                        )
                    args = (*args, ua[0], ua[1], ua[2], ut[0], ut[1])
                yield epoch, k, batch, args

        def _prefetch(it, depth=int(cfg.data.device_prefetch)):
            from collections import deque

            q = deque()
            for item in it:
                q.append(item)
                if len(q) >= max(depth, 1):
                    yield q.popleft()
            while q:
                yield q.popleft()

        inputs = _prefetch(input_stream())
        while host_step < cfg.train.total_steps:
            epoch, k, batch, args = next(inputs)
            # position mirrored at CONSUME time: a checkpoint after this
            # step must record THIS batch, not the prefetched ones
            self.data_pos["epoch"] = epoch
            self.data_pos["batch"] = k
            self.state, m = self.step_fn(self.state, *args, *cmvn_dev)

            # Never fetch device metrics per step: through the TPU tunnel a
            # scalar fetch costs ~2x the step itself.  Step and frame counts
            # come from the HOST; device scalars are fetched only at the
            # log boundary (steps in between pipeline freely).
            host_step += 1
            step = host_step
            if first_step_t0 is not None:
                # compile (or persistent-cache deserialize) of this
                # process's first bucket cell happens synchronously inside
                # the dispatch above — the dominant per-restart cost
                self.log.log(step, {
                    "startup_wall_s": startup_wall,
                    "first_step_wall_s": time.perf_counter() - first_step_t0,
                    "resumed": float(bool(resume)),
                }, "wall")
                first_step_t0 = None

            # profiling window (SURVEY.md §6 tracing): trace profile_steps
            # steps starting at profile_start into <workdir>/profile
            if cfg.train.profile_steps > 0:
                if step == cfg.train.profile_start:
                    jax.profiler.start_trace(str(self.workdir / "profile"))
                elif step == cfg.train.profile_start + cfg.train.profile_steps:
                    jax.tree.map(
                        lambda x: x.block_until_ready(), m["loss"]
                    )
                    jax.profiler.stop_trace()
                    self.log.info(
                        f"profile trace written to {self.workdir}/profile"
                    )
            if self.from_features:
                frames_acc += int(batch.feat_lens[batch.real].sum())
            else:
                frames_acc += (
                    int(batch.audio_lens[batch.real].sum())
                    // self.cfg.frontend.hop_length
                )
            if step % cfg.train.log_every == 0:
                dt = time.perf_counter() - t_last
                scalars = {k: float(v) for k, v in m.items()}
                scalars["frames_per_sec"] = frames_acc / max(dt, 1e-9)
                scalars["steps_per_sec"] = cfg.train.log_every / max(dt, 1e-9)
                self.log.log(step, scalars, "train")
                acc = (f"acc {scalars['acc']:.3f} " if "acc" in scalars
                       else "")  # the encoder-only families have no
                                 # token-accuracy metric
                self.log.info(
                    f"step {step} loss {scalars['loss']:.4f} "
                    f"{acc}fps {scalars['frames_per_sec']:.0f}"
                )
                t_last = time.perf_counter()
                frames_acc = 0

            if cfg.train.eval_every > 0 and step % cfg.train.eval_every == 0:
                t_ev = time.perf_counter()
                last_eval = self.validate()
                eval_wall = time.perf_counter() - t_ev
                t_ck = time.perf_counter()
                self.ckpt.save(
                    step, self.state, self.data_pos,
                    {"dev_error": last_eval["dev_error"]},
                )
                self.log.log(step, {
                    **last_eval,
                    "eval_wall_s": eval_wall,
                    "ckpt_wall_s": time.perf_counter() - t_ck,
                }, "dev")
                if last_eval["dev_error"] < best_dev - 1e-9:
                    best_dev, evals_since_best = last_eval["dev_error"], 0
                else:
                    evals_since_best += 1
                    patience = cfg.train.early_stop_patience
                    if patience > 0 and evals_since_best >= patience:
                        self.log.info(
                            f"early stop at step {step}: dev_error has not "
                            f"improved on {best_dev:.4f} for "
                            f"{evals_since_best} evals"
                        )
                        break
            elif cfg.train.ckpt_every > 0 and step % cfg.train.ckpt_every == 0:
                self.ckpt.save(step, self.state, self.data_pos,
                               {"dev_error": last_eval.get("dev_error", 1e9)})

            if (cfg.train.exec_restart_every > 0
                    and step % cfg.train.exec_restart_every == 0
                    and step < cfg.train.total_steps):
                # tunnel-leak mitigation (see TrainConfig): checkpoint,
                # then hand control back so main.py can os.execv a fresh
                # process image that resumes exactly here
                saved_now = (
                    (cfg.train.eval_every > 0
                     and step % cfg.train.eval_every == 0)
                    or (cfg.train.ckpt_every > 0
                        and step % cfg.train.ckpt_every == 0)
                )
                t_rs = time.perf_counter()
                if not saved_now:
                    self.ckpt.save(
                        step, self.state, self.data_pos,
                        {"dev_error": last_eval.get("dev_error", 1e9)},
                    )
                # PROVE the boundary save finalized before handing main.py
                # the go-ahead to execv: trusting an unfinalized save here
                # is what livelocked the r3 soak (three identical 900-step
                # cycles re-resuming from the same stale checkpoint)
                self.ckpt.verify_durable(step)
                self.log.log(step, {
                    "restart_save_wall_s": time.perf_counter() - t_rs,
                }, "wall")
                self.restart_requested = True
                self.log.info(
                    f"exec-restart boundary at step {step} "
                    f"(train.exec_restart_every="
                    f"{cfg.train.exec_restart_every})"
                )
                return last_eval

        # final save whenever the loop didn't just save (ckpt_every=0 =
        # periodic saves disabled -> the final save still happens)
        if (cfg.train.ckpt_every <= 0
                or int(self.state.step) % cfg.train.ckpt_every != 0):
            last_eval = self.validate()
            self.ckpt.save(int(self.state.step), self.state, self.data_pos,
                           {"dev_error": last_eval["dev_error"]})
        # drain async saves at exit AND prove the last one finalized
        self.ckpt.verify_durable(int(self.state.step))
        return last_eval

    # ------------------------------------------------------------------ #
    # evaluation
    # ------------------------------------------------------------------ #

    def _decode_mesh(self):
        """Mesh eval decode runs on.

        Single host: the training mesh.  Multi-host DP: a LOCAL mesh over
        this host's devices only — each host decodes its own shard of the
        eval batches with no cross-host launch-count coupling (shard batch
        counts may differ by one), and only the final error counters are
        reduced.  Multi-host TP (model axis spans processes) cannot be
        made host-local without gathering params, so it keeps the global
        mesh; every host then feeds identical batches (shard 0/1)."""
        if self.mesh is None:
            return None
        if (jax.process_count() > 1
                and self.cfg.parallel.model_parallel == 1):
            from jax.sharding import Mesh

            return Mesh(
                np.asarray(jax.local_devices()).reshape(-1, 1),
                (self.cfg.parallel.data_axis, self.cfg.parallel.model_axis),
            )
        return self.mesh

    def _eval_param_shardings(self, mesh=None):
        """Sharding pytree decode expects for params: replicated under
        plain DP, the TP layout under model_parallel > 1."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh if mesh is None else mesh
        if self.cfg.parallel.model_parallel > 1:
            from semi_supervised_asr_tpu.parallel import tp

            return tp.state_shardings(
                mesh, self.cfg.parallel, self.state.params
            )
        return NamedSharding(mesh, P())

    def _jit_decode(self, fn, extra_data_args: int = 0):
        """jit a decode fn; with a mesh, shard eval batches over the data
        axis so validation/test decode scales across chips like training
        does (C5).  Params: replicated under plain DP, `model`-sharded
        under TP (callers ``device_put`` them to the same layout —
        checkpoint-restored params arrive committed to one device and jit
        will not reshard committed args itself).

        Multi-host: runs on ``_decode_mesh()`` (host-local under DP).  In
        the multi-host-TP global-mesh case outputs are REPLICATED so the
        host can fetch them (data-sharded outputs would span
        non-addressable devices)."""
        mesh = self._decode_mesh()
        if mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from semi_supervised_asr_tpu.ops import kernel_mesh as KM

        axis = self.cfg.parallel.data_axis

        def fn_with_kernel_mesh(*args):
            # Pallas kernels (listener backend, fused frontend) partition
            # over the data axis via shard_map under this context
            # (ops/kernel_mesh.py) — eval decode shards like training does
            with KM.kernel_mesh(mesh, axis):
                return fn(*args)

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis))
        cross_host = mesh is self.mesh and jax.process_count() > 1
        return jax.jit(
            fn_with_kernel_mesh,
            in_shardings=(self._eval_param_shardings(mesh), data, data,
                          repl, repl, *([data] * extra_data_args)),
            out_shardings=repl if cross_host else data,
        )

    def _greedy_fn(self):
        if "greedy" not in self._decode_fns:
            cfg = self.cfg
            if cfg.decode.bias_phrases:
                self.log.info(
                    "WARNING: offline/eval greedy decode runs unbiased — "
                    "decode.bias_phrases applies to beam decode, and to "
                    "streaming greedy (transcribe --streaming, "
                    "frame-synchronous families)"
                )

            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)

            def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                feats, flens = feat_fn(
                    cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
                )
                max_u_of = lambda t: max(1, min(
                    cfg.data.token_buckets[-1],
                    cfg.decode.max_decode_len,
                    int(cfg.decode.max_decode_ratio * t)
                    if cfg.decode.max_decode_ratio > 0 else 10**9,
                ))
                if cfg.model.family == "transducer":
                    from semi_supervised_asr_tpu.decode.transducer_greedy \
                        import transducer_greedy_from_enc
                    from semi_supervised_asr_tpu.models import (
                        transducer as TD,
                    )

                    enc, enc_mask = TD.encode(
                        params, feats, flens, cfg.model
                    )
                    return transducer_greedy_from_enc(
                        params, cfg.model, enc, enc_mask,
                        max_u_of(enc.shape[1]),
                        max_symbols=cfg.decode.max_symbols,
                    )
                if cfg.model.family == "ctc":
                    from semi_supervised_asr_tpu.decode.ctc import (
                        ctc_greedy_from_enc,
                    )
                    from semi_supervised_asr_tpu.models import (
                        ctc_model as CM,
                    )

                    enc, enc_mask = CM.encode(
                        params, feats, flens, cfg.model
                    )
                    return ctc_greedy_from_enc(
                        params["ctc"], enc, enc_mask
                    )
                enc, enc_mask, keys = M.encode(params, feats, flens, cfg.model)
                return greedy_decode_from_enc(
                    params["speller"], cfg.model, enc, enc_mask, keys,
                    max_u_of(enc.shape[1]),
                )

            self._decode_fns["greedy"] = self._jit_decode(fn)
        return self._decode_fns["greedy"]

    def _ctc_fn(self):
        if self.cfg.model.family == "ctc":
            # the family's greedy IS CTC best-path decode
            return self._greedy_fn()
        if "ctc" not in self._decode_fns:
            cfg = self.cfg
            assert "ctc" in self.state.params, (
                "CTC decode needs a CTC head — train with "
                "objective.lambda_ctc > 0 (or model.ctc_head: true)"
            )
            from semi_supervised_asr_tpu.decode.ctc import ctc_greedy_from_enc

            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)

            def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                feats, flens = feat_fn(
                    cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
                )
                enc, enc_mask, _ = M.encode(params, feats, flens, cfg.model)
                return ctc_greedy_from_enc(params["ctc"], enc, enc_mask)

            self._decode_fns["ctc"] = self._jit_decode(fn)
        return self._decode_fns["ctc"]

    def _align_fn(self):
        """CTC Viterbi forced alignment (token timestamps): ``fn(params,
        audio, audio_lens, cmvn_mean, cmvn_std, tokens, token_lens) ->
        (starts, ends, path_logp)`` in ENCODER frames (ops/ctc_align.py).

        Needs frame posteriors, so: the ctc family's own head, or a
        LAS model trained with the joint-CTC head.  The transducer
        times its tokens in the greedy scan instead (``_times_fn``)."""
        if "align" not in self._decode_fns:
            cfg = self.cfg
            if cfg.model.family == "transducer":
                raise ValueError(
                    "forced alignment needs CTC frame posteriors; the "
                    "transducer gets timestamps from its greedy decode "
                    "(emission frames) — use _times_fn"
                )
            assert "ctc" in self.state.params, (
                "forced alignment needs a CTC head — the ctc family has "
                "one; LAS needs objective.lambda_ctc > 0 (or "
                "model.ctc_head: true) at train time"
            )
            from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits
            from semi_supervised_asr_tpu.ops.ctc_align import (
                ctc_viterbi_align,
            )

            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)

            def fn(params, audio, audio_lens, cmvn_mean, cmvn_std,
                   tokens, token_lens):
                feats, flens = feat_fn(
                    cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None,
                    False,
                )
                if cfg.model.family == "ctc":
                    from semi_supervised_asr_tpu.models import (
                        ctc_model as CM,
                    )

                    enc, enc_mask = CM.encode(params, feats, flens,
                                              cfg.model)
                else:
                    enc, enc_mask, _ = M.encode(params, feats, flens,
                                                cfg.model)
                logp = jax.nn.log_softmax(
                    ctc_head_logits(params["ctc"], enc), axis=-1
                )
                frame_lens = jnp.sum(
                    enc_mask.astype(jnp.int32), axis=1
                )
                return ctc_viterbi_align(
                    logp, frame_lens, tokens, token_lens
                )

            self._decode_fns["align"] = self._jit_decode(
                fn, extra_data_args=2
            )
        return self._decode_fns["align"]

    def _times_fn(self):
        """Transducer greedy decode that also returns each token's
        emission frame: ``fn(...) -> (tokens, score, frames)`` — the
        family's native timestamp (``transcribe --timestamps``)."""
        if "times" not in self._decode_fns:
            cfg = self.cfg
            assert cfg.model.family == "transducer", (
                "_times_fn is transducer-only; CTC/LAS timestamps come "
                "from forced alignment (_align_fn)"
            )
            from semi_supervised_asr_tpu.decode.transducer_greedy import (
                transducer_greedy_from_enc,
            )
            from semi_supervised_asr_tpu.models import transducer as TD

            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)

            def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                feats, flens = feat_fn(
                    cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None,
                    False,
                )
                enc, enc_mask = TD.encode(params, feats, flens, cfg.model)
                max_u = max(1, min(
                    cfg.data.token_buckets[-1], cfg.decode.max_decode_len,
                    int(cfg.decode.max_decode_ratio * enc.shape[1])
                    if cfg.decode.max_decode_ratio > 0 else 10**9,
                ))
                return transducer_greedy_from_enc(
                    params, cfg.model, enc, enc_mask, max_u,
                    max_symbols=cfg.decode.max_symbols,
                    track_frames=True,
                )

            self._decode_fns["times"] = self._jit_decode(fn)
        return self._decode_fns["times"]

    def _lm(self):
        """(lm_params, lm_step_fn) for shallow fusion, or (None, None)."""
        if "lm" not in self._decode_fns:
            lm_params, lm_step = None, None
            dcfg = self.cfg.decode
            if dcfg.lm_weight > 0.0 and not dcfg.lm_ckpt:
                self.log.info(
                    "WARNING: decode.lm_weight > 0 but decode.lm_ckpt is "
                    "empty — shallow fusion DISABLED (train an LM with "
                    "training/lm_trainer.py and set decode.lm_ckpt)"
                )
            if dcfg.lm_weight > 0.0 and dcfg.lm_ckpt:
                from semi_supervised_asr_tpu.models import lm as LMM
                from semi_supervised_asr_tpu.training.lm_trainer import load_lm

                lm_params = load_lm(dcfg.lm_ckpt, self.cfg, self.vocab.size)
                lm_step = LMM.lm_step
                if "blocks" in lm_params:  # transformer: KV cache bound
                    assert dcfg.max_decode_len <= self.cfg.lm.max_len, (
                        f"decode.max_decode_len {dcfg.max_decode_len} "
                        f"exceeds the transformer LM's lm.max_len "
                        f"{self.cfg.lm.max_len}"
                    )
                self.log.info(
                    f"shallow fusion: {self.cfg.lm.arch} LM from "
                    f"{dcfg.lm_ckpt} weight {dcfg.lm_weight}"
                )
            self._decode_fns["lm"] = (lm_params, lm_step)
        return self._decode_fns["lm"]

    def _bias(self):
        """Compiled contextual-biasing trie (decode/biasing.py), or None.

        ``decode.bias_phrases`` (hotword file) + ``decode.bias_bonus``;
        beam decode only — the greedy paths ignore it (a 1-wide lattice
        cannot keep a boosted-but-not-yet-acoustically-winning prefix
        alive, which is the mechanism biasing relies on)."""
        if "bias" not in self._decode_fns:
            trie = None
            dcfg = self.cfg.decode
            if bool(dcfg.bias_phrases) != (dcfg.bias_bonus != 0.0):
                self.log.info(
                    "WARNING: contextual biasing needs BOTH "
                    "decode.bias_phrases and a nonzero decode.bias_bonus "
                    "— biasing DISABLED"
                )
            elif dcfg.bias_phrases:
                from semi_supervised_asr_tpu.decode import biasing as BZ

                phrases = BZ.load_bias_phrases(
                    dcfg.bias_phrases, self.vocab
                )
                trie = BZ.build_bias_trie(
                    phrases, self.vocab.size, dcfg.bias_bonus
                )
                self.log.info(
                    f"contextual biasing: {len(phrases)} phrases from "
                    f"{dcfg.bias_phrases}, bonus {dcfg.bias_bonus} "
                    f"({trie.next_node.shape[0]} trie nodes)"
                )
            self._decode_fns["bias"] = trie
        return self._decode_fns["bias"]

    def _beam_fn(self, nbest: bool = False):
        """Jit beam decode; ``nbest`` returns all K lattices sorted by
        score (transcribe --nbest) instead of the single best."""
        key = "beam_nbest" if nbest else "beam"
        if key not in self._decode_fns:
            cfg = self.cfg
            lm_params, lm_step = self._lm()
            bias = self._bias()

            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)

            if cfg.model.family == "ctc":
                from semi_supervised_asr_tpu.decode.ctc_beam import (
                    ctc_beam_from_enc,
                )
                from semi_supervised_asr_tpu.models import ctc_model as CM

                if cfg.decode.ctc_weight > 0.0:
                    self.log.info(
                        "WARNING: decode.ctc_weight rescoring is LAS-only "
                        "— the CTC family's beam IS the CTC score"
                    )

                def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                    feats, flens = feat_fn(
                        cfg, audio, audio_lens, (cmvn_mean, cmvn_std),
                        None, False,
                    )
                    enc, enc_mask = CM.encode(
                        params, feats, flens, cfg.model
                    )
                    max_u = max(1, min(
                        cfg.data.token_buckets[-1],
                        cfg.decode.max_decode_len,
                        int(cfg.decode.max_decode_ratio * enc.shape[1])
                        if cfg.decode.max_decode_ratio > 0 else 10**9,
                    ))
                    return ctc_beam_from_enc(
                        params["ctc"], enc, enc_mask, max_u,
                        beam_size=cfg.decode.beam_size,
                        lm_params=lm_params, lm_step_fn=lm_step,
                        lm_weight=cfg.decode.lm_weight,
                        return_nbest=nbest, bias=bias,
                    )

                self._decode_fns[key] = self._jit_decode(fn)
                return self._decode_fns[key]

            if cfg.model.family == "transducer":
                from semi_supervised_asr_tpu.decode.transducer_beam import (
                    transducer_beam_from_enc,
                )
                from semi_supervised_asr_tpu.models import transducer as TD

                if cfg.decode.ctc_weight > 0.0:
                    self.log.info(
                        "WARNING: decode.ctc_weight > 0 is LAS-only — "
                        "ignored for the transducer beam"
                    )
                def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                    feats, flens = feat_fn(
                        cfg, audio, audio_lens, (cmvn_mean, cmvn_std),
                        None, False,
                    )
                    enc, enc_mask = TD.encode(
                        params, feats, flens, cfg.model
                    )
                    max_u = max(1, min(
                        cfg.data.token_buckets[-1],
                        cfg.decode.max_decode_len,
                        int(cfg.decode.max_decode_ratio * enc.shape[1])
                        if cfg.decode.max_decode_ratio > 0 else 10**9,
                    ))
                    return transducer_beam_from_enc(
                        params, cfg.model, enc, enc_mask, max_u,
                        beam_size=cfg.decode.beam_size,
                        max_symbols=cfg.decode.max_symbols,
                        lm_params=lm_params, lm_step_fn=lm_step,
                        lm_weight=cfg.decode.lm_weight,
                        ilm_weight=cfg.decode.ilm_weight,
                        return_nbest=nbest, bias=bias,
                    )

                self._decode_fns[key] = self._jit_decode(fn)
                return self._decode_fns[key]

            use_ctc = cfg.decode.ctc_weight > 0.0
            if use_ctc and "ctc" not in self.state.params:
                self.log.info(
                    "WARNING: decode.ctc_weight > 0 but the model has no "
                    "CTC head (train with objective.lambda_ctc > 0) — "
                    "CTC rescoring DISABLED"
                )
                use_ctc = False

            def fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
                feats, flens = feat_fn(
                    cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
                )
                enc, enc_mask, keys = M.encode(params, feats, flens, cfg.model)
                max_u = max(1, min(
                    cfg.data.token_buckets[-1],
                    cfg.decode.max_decode_len,
                    int(cfg.decode.max_decode_ratio * enc.shape[1])
                    if cfg.decode.max_decode_ratio > 0 else 10**9,
                ))
                return beam_decode_from_enc(
                    params["speller"], cfg.model, cfg.decode,
                    enc, enc_mask, keys, max_u,
                    lm_params=lm_params, lm_step_fn=lm_step,
                    ctc_params=params["ctc"] if use_ctc else None,
                    return_nbest=nbest, bias=bias,
                )

            self._decode_fns[key] = self._jit_decode(fn)
        return self._decode_fns[key]

    def _score_batches(
        self, dataset, params, mode: str, max_batches: int | None = None
    ) -> tuple[float, list, float | None]:
        """Decode a dataset -> (error rate, hypothesis records, WER).

        WER (word-level, from decoded text) is only meaningful for char
        units — LibriSpeech's headline metric (SURVEY.md §1.1 #7); None
        for phone units.

        Multi-host DP: each process decodes ONLY its shard of the eval
        batches on a host-local mesh (eval cost scales with hosts like
        training does), then the error/total counters allgather so every
        host reports the same GLOBAL rate — best-ckpt selection and early
        stopping stay coordinated.  ``records`` holds the local shard's
        hypotheses.  Multi-host TP keeps the global mesh: all hosts feed
        identical batches and no shard split happens (_decode_mesh).
        """
        if self.cfg.model.family == "transducer" and mode == "ctc":
            self.log.info(
                "decode mode 'ctc' is LAS-only — transducer decodes "
                "frame-synchronous greedy"
            )
            mode = "greedy"
        fn = {"greedy": self._greedy_fn, "ctc": self._ctc_fn}.get(
            mode, self._beam_fn)()
        if self.mesh is not None:
            # checkpoint-restored params arrive committed to one device;
            # place them in the layout the jitted decode declares
            dm = self._decode_mesh()
            if dm is not self.mesh:
                # host-local decode mesh: params sit committed to the
                # GLOBAL mesh and backends reject device-to-device
                # cross-host transfers — hop via host (params are
                # replicated under DP, so the local shard is the value)
                params = jax.tree.map(np.asarray, params)
            params = jax.device_put(params, self._eval_param_shardings(dm))
        er = MET.ErrorRate()
        wer = MET.ErrorRate()          # word-level (char units only)
        records = []
        # length-cap saturation telemetry (VERDICT r4 weak #4): an
        # EOS-terminated decode (LAS greedy/beam) whose hypothesis fills
        # max_decode_len WITHOUT emitting EOS was cut by the cap — the
        # r3 soak measured a truncation artifact for 2000 steps because
        # 512/512 capped hypotheses looked like a frozen-but-valid CER.
        # CTC/transducer hypotheses are frame/alignment-synchronous (no
        # EOS budget), so the counter only means something for LAS.
        from semi_supervised_asr_tpu.data.vocab import EOS

        track_cap = (self.cfg.model.family == "las" and mode != "ctc")
        cap_hits, n_scored = 0, 0
        shard, n_shards = 0, 1
        if (self.mesh is not None and jax.process_count() > 1
                and self.cfg.parallel.model_parallel == 1):
            shard, n_shards = jax.process_index(), jax.process_count()
        if self.from_features:
            batches = pipe.epoch_feature_batches(
                dataset, self.spec, self.cfg.train.batch_size,
                seed=0, epoch=0, drop_remainder=False,
                shard_index=shard, num_shards=n_shards,
            )
        else:
            batches = pipe.epoch_batches(
                dataset, self.spec, self.cfg.frontend,
                self.cfg.train.batch_size, seed=0, epoch=0,
                drop_remainder=False,
                shard_index=shard, num_shards=n_shards,
            )
        for bi, batch in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break    # diagnostics: a bounded slice is enough
            xin = self._step_inputs(batch)
            out = fn(params, jnp.asarray(xin[0]), jnp.asarray(xin[1]),
                     jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1]))
            hyps = np.asarray(out[0])
            refs = batch.tokens
            if self.cfg.data.unit == "phone":
                d, n = MET.per_batch(hyps, refs, self.vocab)
            else:
                d, n = MET.cer_batch(hyps, refs)
            er.update(d[batch.real], n[batch.real])
            for r in range(len(hyps)):
                if not batch.real[r]:
                    continue
                rec = {
                    "uid": batch.uids[r],
                    "ref": self.vocab.decode_text(refs[r]),
                    "hyp": self.vocab.decode_text(hyps[r]),
                    "errors": int(d[r]), "ref_len": int(n[r]),
                }
                n_scored += 1
                if track_cap and not bool((hyps[r] == EOS).any()):
                    cap_hits += 1
                    rec["no_eos"] = True   # ended AT the cap, truncated
                if self.cfg.data.unit in ("char", "bpe"):
                    we, nw = MET.wer_strings(rec["hyp"], rec["ref"])
                    wer.update(we, nw)
                    rec["word_errors"], rec["ref_words"] = we, nw
                records.append(rec)
        if n_shards > 1:
            # cross-host reduce of the counters (per-host shards cover
            # disjoint batches; the SUM is the full-set statistic)
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(
                np.asarray(
                    [er.errors, er.total, wer.errors, wer.total,
                     cap_hits, n_scored], np.int64
                )
            ).sum(axis=0)
            er = MET.ErrorRate(int(counts[0]), int(counts[1]))
            wer = MET.ErrorRate(int(counts[2]), int(counts[3]))
            cap_hits, n_scored = int(counts[4]), int(counts[5])
        wrate = (wer.rate if self.cfg.data.unit in ("char", "bpe")
                 else None)
        # side-channel (the 3-tuple is unpacked at 30+ call sites):
        # validate()/test()/transcribe read and surface these
        self._last_decode_stats = {
            "tracked": track_cap, "cap_hits": cap_hits,
            "n_scored": n_scored,
            "cap_hit_rate": cap_hits / max(n_scored, 1),
            "cap": int(self.cfg.decode.max_decode_len),
        }
        if track_cap and n_scored and cap_hits / n_scored > 0.01:
            self.log.warning(
                f"LENGTH-CAP SATURATION: {cap_hits}/{n_scored} "
                f"hypotheses filled decode.max_decode_len="
                f"{self.cfg.decode.max_decode_len} without emitting EOS "
                "— the error metric is partly measuring TRUNCATION, not "
                "recognition (the r3 soak's frozen-CER artifact). Raise "
                "max_decode_len (or check for a model that cannot "
                "terminate)."
            )
        return er.rate, records, wrate

    def _live_eval_params(self):
        """Params validate() scores mid-training: the Polyak-EMA weights
        when decode.use_ema, else the live params."""
        if self.cfg.decode.use_ema:
            return self.state.ema_params
        return self.state.params

    def validate(self) -> dict:
        rate, _, wrate = self._score_batches(
            self.bundle.dev, self._live_eval_params(), "greedy"
        )
        self._log_alignment()
        out = {"dev_error": rate}
        if wrate is not None:
            out["dev_wer"] = wrate
        stats = getattr(self, "_last_decode_stats", {})
        if stats.get("tracked"):
            # in metrics.jsonl every eval: dashboards and the soak
            # report see saturation the round it starts, not two rounds
            # later in a post-mortem
            out["dev_cap_hit_rate"] = stats["cap_hit_rate"]
        return out

    def _log_alignment(self) -> None:
        """Teacher-forced attention heatmap of one dev utterance ->
        tensorboard image (reference parity: SURVEY.md §6 'maybe attention
        plots'). Best-effort; skipped when tensorboard is unavailable."""
        if self.log._tb is None:
            return
        if self.cfg.model.family != "las":
            return     # no attention alignments in the transducer family
        try:
            batch = next(iter(
                pipe.epoch_feature_batches(
                    self.bundle.dev, self.spec, self.cfg.train.batch_size,
                    seed=0, epoch=0, drop_remainder=False)
                if self.from_features else
                pipe.epoch_batches(
                    self.bundle.dev, self.spec, self.cfg.frontend,
                    self.cfg.train.batch_size, seed=0, epoch=0,
                    drop_remainder=False)
            ))
            xin = self._step_inputs(batch)
            feat_fn = (TS.featurize_precomputed if self.from_features
                       else TS.featurize)
            feats, flens = feat_fn(
                self.cfg, jnp.asarray(xin[0]), jnp.asarray(xin[1]),
                (jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1])),
                None, False,
            )
            from semi_supervised_asr_tpu.objectives.losses import shift_targets

            tokens_in, _ = shift_targets(jnp.asarray(batch.tokens))
            _, alphas = M.forward_teacher(
                self.state.params, self.cfg.model, feats, flens, tokens_in,
                tf_rate=1.0, rng=jax.random.PRNGKey(0),
            )
            a = np.asarray(alphas[0])            # [U, T']
            u = int(batch.token_lens[0])
            img = a[:u] / max(a[:u].max(), 1e-6)
            self.log.log_image(
                int(self.state.step), "attention/dev0", img
            )
        except Exception as e:  # never fail training over a plot
            self.log.info(f"alignment plot skipped: {e}")

    def eval_params(self, require_ckpt: bool = False):
        """The params decode-time consumers should use: checkpoint-averaged
        (decode.average_ckpts) or best/latest restored — the SAME logic for
        --test and transcribe so serving matches measured eval quality."""
        if self.ckpt.latest_step() is None:
            if require_ckpt:
                raise SystemExit(
                    f"{self.workdir}: no checkpoint found — decoding with "
                    "untrained params would produce garbage (check the "
                    "--load-dir path / train first)"
                )
            return self._live_eval_params()
        if self.cfg.decode.average_ckpts > 1:
            params, steps = self.ckpt.average_params(
                self.state, self.cfg.decode.average_ckpts
            )
            self.log.info(f"decoding with params averaged over steps {steps}")
            return params
        step = self.ckpt.best_step() or self.ckpt.latest_step()
        state, _, _ = self.ckpt.restore(self.state, step)
        if self.cfg.decode.use_ema:
            self.log.info("decoding with Polyak-EMA weights")
            return state.ema_params
        return state.params

    def test(
        self, mode: str = "beam", restore_best: bool = True,
        out_path: str | Path | None = None,
    ) -> dict:
        params = self.eval_params() if restore_best else self.state.params
        eval_ds = self.bundle.test if self.bundle.test is not None else self.bundle.dev
        if self.cfg.model.family == "transducer" and mode == "ctc":
            mode = "greedy"    # reported mode matches what actually ran
        rate, records, wrate = self._score_batches(eval_ds, params, mode)
        n_utts = len(records)
        sharded_eval = (
            self.mesh is not None and jax.process_count() > 1
            and self.cfg.parallel.model_parallel == 1
        )
        if out_path is not None:
            import json

            if sharded_eval:
                # each host holds only its shard's hypotheses — write
                # per-host parts instead of clobbering one shared path
                out_path = f"{out_path}.part{jax.process_index()}"
            with open(out_path, "w") as f:
                for rec in records:
                    f.write(json.dumps(rec) + "\n")
            if records:
                # S/I/D + confusion-pair report beside the hypotheses
                # (sharded eval: per-host parts analyze their own shard)
                from semi_supervised_asr_tpu.utils import error_analysis as EA

                analysis = EA.analyze_records(
                    records, self.vocab, self.cfg.data.unit
                )
                Path(f"{out_path}.analysis.json").write_text(
                    json.dumps(analysis, indent=1)
                )
                self.log.info(EA.summary_line(analysis))
        if sharded_eval:
            from jax.experimental import multihost_utils

            n_utts = int(multihost_utils.process_allgather(
                np.asarray([n_utts], np.int64)
            ).sum())
        metric = {"phone": "per", "char": "cer"}.get(
            self.cfg.data.unit, "ter")
        out = {metric: rate, "n_utts": n_utts, "mode": mode}
        if wrate is not None:
            out["wer"] = wrate
        stats = getattr(self, "_last_decode_stats", {})
        if stats.get("tracked"):
            out["cap_hit_rate"] = stats["cap_hit_rate"]
        return out
