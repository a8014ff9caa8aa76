"""Hyperparameter configuration: YAML -> frozen dataclasses, CLI overrides.

Mirrors the reference's single-hyperparameter-YAML surface (BASELINE.json:5
"match the reference's ... hyperparameter yaml"): one file holds frontend,
model, objective, schedule, decode and parallelism knobs; ``key=value`` CLI
overrides use dotted paths (``model.enc_hidden=512``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


@dataclass(frozen=True)
class FrontendConfig:
    """Audio frontend (STFT -> mel -> log -> CMVN -> SpecAugment)."""

    sample_rate: int = 16000
    win_ms: float = 25.0          # analysis window length
    hop_ms: float = 10.0          # frame shift
    n_fft: int = 512
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None     # None -> sample_rate / 2
    mel_scale: str = "slaney"     # "slaney" (librosa default) or "htk"
    center: bool = True           # librosa-style reflect-centered frames
    log_floor: float = 1e-10
    preemphasis: float = 0.0      # 0 disables (librosa convention)
    # "xla" = jnp.fft.rfft (VPU-bound on TPU); "matmul" = real-DFT as two
    # fp32 MXU matmuls — ~10x faster frontend on TPU, parity ~1e-5
    fft_backend: str = "xla"
    # CMVN
    cmvn: str = "global"          # "global" | "utterance" | "none"
    # SpecAugment (Park et al. 2019, arXiv:1904.08779)
    spec_augment: bool = True
    freq_mask_param: int = 27     # F
    n_freq_masks: int = 2         # mF
    time_mask_param: int = 40     # T
    n_time_masks: int = 2         # mT
    time_mask_max_ratio: float = 0.2  # p: cap T at ratio*utt_len
    time_warp_param: int = 0          # W: SpecAugment time warp (0 = off)
    # Speed perturbation (Ko et al. 2015, Interspeech): per-utterance
    # on-device waveform resampling by a factor drawn uniformly from this
    # set (tempo+pitch, the sox-speed convention Kaldi/ESPnet recipes
    # triple the corpus with offline).  () = off.  Train-only, supervised
    # branch only (the pseudo-label views share one frame grid).
    speed_perturb: tuple[float, ...] = ()
    # Additive noise augmentation: per-utterance Bernoulli(prob) mixes
    # noise into the waveform at an SNR drawn uniformly from
    # noise_snr_db, on-device inside the step (ops/frontend.noise_augment).
    # Sources drawn uniformly per row: "white" (Gaussian) and/or "babble"
    # (a 3-speaker sum of OTHER rows in the batch — in-batch MUSAN-babble
    # analog, no noise corpus needed).  Unlike speed_perturb this keeps
    # the frame grid, so it also rides the pseudo-label student view.
    noise_aug_prob: float = 0.0   # 0 = off
    noise_snr_db: tuple[float, float] = (5.0, 20.0)
    noise_sources: tuple[str, ...] = ("white", "babble")
    fused_pallas: bool = True     # use the fused Pallas post-FFT kernel on TPU

    @property
    def win_length(self) -> int:
        return int(round(self.sample_rate * self.win_ms / 1000.0))

    @property
    def hop_length(self) -> int:
        return int(round(self.sample_rate * self.hop_ms / 1000.0))

    @property
    def fmax_hz(self) -> float:
        return self.sample_rate / 2.0 if self.fmax is None else self.fmax


@dataclass(frozen=True)
class ModelConfig:
    """Listener (pyramidal BiLSTM) + location-aware-attention Speller."""

    n_mels: int = 80
    vocab_size: int = 64          # overwritten from the tokenizer at build time
    # Listener architecture: "blstm" = pyramidal BiLSTM (reference parity,
    # SURVEY.md §3 #8); "transformer" = conv-subsampled self-attention
    # encoder (models/transformer_listener.py) — MXU-dense, no serial
    # scan chain; "conformer" = convolution-augmented transformer
    # (models/conformer_listener.py, Gulati 2020).  For both attention
    # archs d_model = 2*enc_hidden and reduction = 2**conv_subsample
    encoder_arch: str = "blstm"
    enc_heads: int = 4            # transformer/conformer: attention heads
    enc_ff_dim: int = 1024        # transformer/conformer: FFN width
    enc_blocks: int = 12          # transformer/conformer: number of blocks
    conformer_conv_width: int = 15  # conformer: depthwise conv kernel
    # Chunk-causal ("streaming") conformer, the WeNet-U2 / streaming
    # conformer-transducer configuration: >0 restricts self-attention to
    # static chunks of this many ENCODER frames — every frame attends
    # within its own chunk plus enc_attn_left_chunks previous chunks
    # (full attention inside a chunk, none ahead of it) — and makes the
    # depthwise conv causal (left context only).  The encoder then
    # streams EXACTLY with a fixed per-block cache
    # (conformer_listener.conformer_listener_apply_stream): per-chunk
    # inference is the same function as the offline forward.  0 = full
    # context (offline conformer).  conformer-only; needs
    # attn_backend=xla (the flash kernel's segment ids cannot express a
    # sliding left-context window).
    enc_attn_chunk: int = 0
    # past chunks visible when enc_attn_chunk > 0: -1 = unlimited
    # (offline-evaluable but NOT streamable — the cache would grow
    # without bound); >= 0 bounds the streaming cache to exactly
    # left_chunks * chunk frames per block
    enc_attn_left_chunks: int = -1
    enc_hidden: int = 256         # per-direction LSTM hidden size
    enc_layers: int = 3           # pyramid layers AFTER the base BiLSTM
    enc_base_layers: int = 1      # full-rate BiLSTM layers before the pyramid
    enc_dropout: float = 0.0
    # each pyramid layer folds 2 frames -> total reduction 2**enc_layers
    # Conv subsampler stem (ESPnet-style Conv2dSubsampling): N stride-2
    # 3x3 conv blocks over (time, freq) BEFORE the LSTMs.  Each block
    # halves the scan length the latency-bound BiLSTMs must walk — the
    # measured lever for encoder step time (DESIGN.md perf decisions) —
    # and multiplies total time reduction by 2**N.
    conv_subsample: int = 0
    conv_channels: int = 32
    # Attention
    attn_type: str = "location"   # "location" | "additive" | "dot"
    attn_dim: int = 128
    attn_conv_channels: int = 10  # location-feature conv channels
    attn_conv_width: int = 100    # conv kernel width over previous alignment
    attn_sharpening: float = 1.0  # softmax temperature (1/gamma)
    # Model family: "las" = attention seq2seq (reference parity) —
    # listener + location-aware speller; "transducer" = RNN-T (Graves
    # 2012, models/transducer.py) — same listener, frame-synchronous
    # blank/emit decode, no attention.  Supervised loss is the
    # transducer NLL; pseudo-label + internal-LM text terms via
    # objectives/transducer_semi.py; MWER/CTC-aux/scheduled sampling
    # are LAS-only.  "ctc" = encoder-only CTC (Graves 2006,
    # models/ctc_model.py) — listener + one linear head, blank=PAD;
    # best-path greedy + jit prefix beam search (decode/ctc_beam.py)
    # with shallow LM fusion; pseudo-label term via
    # objectives/ctc_semi.py (no text term: there is no decoder —
    # unlabeled text goes into an external fusion LM instead).
    family: str = "las"
    # Transducer: prediction network + joint dims
    pred_hidden: int = 512
    pred_layers: int = 1
    joint_dim: int = 256
    # >0: compute the loss's lattice terms this many encoder frames at a
    # time instead of materializing the [B, T', U+1, V] joint grid —
    # required at BPE-scale vocabs (models/transducer.joint_lattice_terms)
    joint_chunk_frames: int = 0
    # Speller
    dec_hidden: int = 512
    dec_layers: int = 1
    embed_dim: int = 256
    dec_dropout: float = 0.0
    # Decoder architecture (LAS family): "lstm" = location-aware attention
    # LSTM speller (reference parity, SURVEY.md §3 #10); "transformer" =
    # pre-LN causal transformer decoder with per-layer cross-attention
    # (models/transformer_speller.py) — teacher-forced training is ONE
    # parallel MXU-dense pass (no serial scan), decode steps a KV cache
    # the beam gather-reorders like any state leaf.  d_model = dec_hidden;
    # requires teacher forcing (tf_rate 1.0) and lm_fusion none
    # (shallow fusion at decode time works for both archs).
    decoder_arch: str = "lstm"
    dec_blocks: int = 4           # transformer speller: number of blocks
    dec_heads: int = 4            # transformer speller: attention heads
    dec_ff_dim: int = 1024        # transformer speller: FFN width
    dec_max_len: int = 256        # transformer speller: learned-position /
                                  # KV-cache cap — train target length and
                                  # decode step count must both fit
    tie_embedding: bool = False   # tie output projection to input embedding
    # BiLSTM execution strategy: True = one direction-batched scan
    # (faster at small batch), False = two scans (faster at large batch) —
    # see ops/recurrent.bilstm for measurements
    fuse_bilstm: bool = False
    # False: forward-only LSTM listener (enc_out_dim = enc_hidden) — the
    # STREAMING encoder (pair with family=transducer; per-frame lookahead
    # = the pyramid fold's pairing + 1 frame per conv_subsample block).
    # blstm arch only; the attention listeners are inherently full-context
    enc_bidirectional: bool = True
    scan_unroll: int = 1          # lax.scan unroll factor for encoder scans
    speller_unroll: int = 1       # unroll factor for the teacher-forced
                                  # decoder scans (train/AE; decode loops
                                  # stay at 1 — their step is while-like)
    # "xla" = lax.scan LSTMs; "pallas" = hand-written Pallas scan kernel
    # (ops/pallas_lstm.py) for the encoder — needs B%8==0 and H%128==0,
    # falls back to xla otherwise
    lstm_backend: str = "xla"
    # "xla" = materialized-scores einsum MHSA in the attention listeners;
    # "flash" = jax's Pallas TPU flash-attention kernel via
    # ops/flash_mhsa.py ([B,H,T',T'] scores never hit HBM, fwd or bwd;
    # pad-key masking via segment ids; off-TPU it falls back to the
    # einsum path).  BLSTM listeners and the decoder ignore it.
    attn_backend: str = "xla"
    lstm_block_t: int = 1         # Pallas kernel: timesteps per grid step
                                  # (measured: no win at b128 — the scan is
                                  # latency-bound on the serial h->h dep,
                                  # not grid overhead; >4 risks VMEM OOM)
    # joint CTC-attention: linear CTC head on the encoder (enabled
    # automatically when objective.lambda_ctc > 0)
    ctc_head: bool = False
    # LM fusion into the decoder (deep: Gulcehre et al. 2015; cold:
    # Sriram et al. 2017 — the Toshniwal 2018 comparison, PAPERS.md).
    # The fused LM is a frozen lm_trainer checkpoint stepped in lockstep
    # with the speller; "shallow" fusion lives in decode.lm_weight instead.
    lm_fusion: str = "none"       # "none" | "deep" | "cold"
    lm_fusion_dim: int = 64       # cold: DNN width over LM logits
    lm_fusion_ckpt: str = ""      # lm_trainer workdir to graft (frozen)
    # architecture of the fused LM (must match the trained checkpoint;
    # defaults mirror LMConfig)
    lm_fusion_embed: int = 128
    lm_fusion_hidden: int = 512
    lm_fusion_layers: int = 1
    # Speller backward strategy.  "scan" = plain lax.scan autodiff: the
    # reverse scan CARRIES the decoder dW accumulators (~38MB at ls960
    # dims) plus the d(enc) accumulator through all U steps — pure HBM
    # round-trip traffic.  "stacked" = custom-VJP scan
    # (models/speller.py): the big weights are held constant inside the
    # scan, the backward emits per-step gate/context cotangents STACKED,
    # and dW/d(enc) are reconstructed as single MXU contractions —
    # measured ~10% off the ls960_dp step (DESIGN.md).  Gradients are
    # mathematically identical (contraction-order differences only;
    # parity-tested in tests/test_stacked_grad.py).
    speller_grad: str = "scan"    # "scan" | "stacked"
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"  # MXU-friendly; carries stay fp32

    @property
    def time_reduction(self) -> int:
        if self.encoder_arch in ("transformer", "conformer"):
            return 2 ** self.conv_subsample     # no pyramid
        return 2 ** (self.enc_layers + self.conv_subsample)

    @property
    def enc_out_dim(self) -> int:
        return (2 if self.enc_bidirectional else 1) * self.enc_hidden


@dataclass(frozen=True)
class ObjectiveConfig:
    """Supervised CE + semi-supervised terms (BASELINE.json:5,10)."""

    label_smoothing: float = 0.0
    # teacher forcing / scheduled sampling
    tf_rate_start: float = 1.0
    tf_rate_end: float = 0.8
    tf_decay_steps: int = 50000
    # semi-supervised weights
    lambda_text_ae: float = 0.0       # text autoencoder weight
    lambda_ctc: float = 0.0           # joint CTC-attention aux weight
                                      # (Kim et al. 2017; enables the
                                      # encoder CTC head)
    lambda_pseudo: float = 0.0        # pseudo-label consistency weight
    pseudo_warmup_steps: int = 0      # enable the pseudo term only after N
                                      # supervised steps (teacher must be
                                      # better than noise first)
    pseudo_confidence: float = 0.0    # min mean prob filter in (0,1); 0=all
    ema_decay: float = 0.999          # EMA teacher for pseudo-labels
    use_ema_teacher: bool = True
    # sequence-level expected-risk (MWER) fine-tuning, arXiv:1712.01818:
    # jit beam proposes n-best inside the step, jit edit distance scores
    # the risks, loss = n-best expected (risk - mean risk)
    lambda_mwer: float = 0.0
    mwer_beam: int = 4                # n-best size for the risk expectation
    mwer_warmup_steps: int = 0        # CE-only steps before MWER kicks in


@dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "adam"
    learning_rate: float = 5e-4
    lr_schedule: str = "constant"     # "constant" | "cosine" | "exponential"
                                      # | "noam" (inverse-sqrt, peak=lr at
                                      #   warmup_steps; transformer standard)
    warmup_steps: int = 0
    decay_steps: int = 100000
    lr_min_ratio: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip_norm: float = 5.0
    weight_decay: float = 0.0
    # Polyak/EMA weight averaging maintained EVERY step (Izmailov-style
    # eval smoothing, standard in conformer-era recipes): >0 keeps
    # state.ema_params = d*ema + (1-d)*params each step; decode with it
    # via decode.use_ema.  When the pseudo-label EMA teacher is also
    # active, this decay REPLACES objective.ema_decay (one EMA buffer).
    polyak_decay: float = 0.0
    freeze: tuple[str, ...] = ()      # fine-tuning: param-path substrings
                                      # whose updates are zeroed (e.g.
                                      # ["listener"] freezes the encoder)
    # workdir of a BEST-RQ pretraining run (training/pretrain.py): the
    # listener subtree is restored over the fresh init before training
    # (all families — LAS/transducer/CTC share params["listener"]).
    # Dims must match; combine with train.freeze=["listener"] to probe.
    init_encoder_from: str = ""
    total_steps: int = 100000
    batch_size: int = 32              # global batch size (all chips)
    grad_accum: int = 1               # microbatches per optimizer update
                                      # (batch_size must divide evenly)
    eval_every: int = 1000
    early_stop_patience: int = 0      # stop after N evals without a new
                                      # best dev_error (0 = off)
    log_every: int = 100
    ckpt_every: int = 1000
    keep_ckpts: int = 3
    async_ckpt: bool = False          # orbax background saves (steps keep
                                      # pipelining during the write)
    seed: int = 0
    ckpt_dir: str = "checkpoints"
    remat_encoder: bool = False       # jax.checkpoint the listener
    # Cast every float32 param to bf16 ONCE at the top of the loss (fp32
    # master weights stay in the train state / optimizer / checkpoints).
    # XLA does not hoist the per-use casts out of the decoder scan, so the
    # fp32 tree is otherwise re-streamed from HBM every scan step; the
    # one-time cast halves that traffic AND the scan-transpose dW
    # accumulator round-trips (measured: decoder fwd+bwd 22.9->17.2 ms at
    # ls960 dims, DESIGN.md).  Costs bf16 rounding of the weights and
    # bf16 dW accumulation across scan steps — equal-budget quality check
    # in experiments/README.md.
    bf16_weight_stream: bool = False
    # Save a checkpoint and RE-EXEC the training process every N steps
    # (0 = off).  Exists because long runs through a tunneled TPU client
    # leak host memory on every transfer (~the payload size per H2D,
    # measured 2026-08-20: a 12k-step ls100 soak OOM-killed a 125GB host
    # at step ~1700, ~70MB/step; the leak reproduces with bare
    # jax.device_put in isolation, so it is the client runtime, not this
    # repo).  os.execv replaces the process image — all leaked memory is
    # returned — and exact mid-epoch resume + the persistent compile
    # cache make the segmented trajectory equal to the continuous one
    # (tests/test_exact_resume.py) at a few seconds' restart cost.
    exec_restart_every: int = 0
    # Persistent XLA compilation cache: "auto" -> <workdir>/jit_cache,
    # "" disables, else an explicit directory (shareable across runs of
    # the same recipe).  A restart/--resume at real dims otherwise
    # re-compiles every (frame bucket x token bucket) cell from scratch
    # — tens of minutes of dead time after a preemption; entries key on
    # the HLO hash so code/shape changes can never serve a stale build.
    compile_cache_dir: str = "auto"
    # observability (SURVEY.md §6): trace N steps with jax.profiler
    profile_steps: int = 0            # 0 disables
    profile_start: int = 10
    debug_nans: bool = False          # jax_debug_nans for repro sessions
    # checkify debug harness: "" off, else comma list of
    # nan|index|div|all — functionalized runtime checks in the train step
    # (single-device debug runs only)
    checkify_errors: str = ""


@dataclass(frozen=True)
class DecodeConfig:
    beam_size: int = 5
    # OPT-IN output-length cap: max output len = ratio * enc frames of the
    # BUCKET (static shape under jit — the real per-utterance length is
    # not available at trace time).  0 (default) disables: the old 0.5
    # default silently truncated char-unit eval hypotheses — at 10ms hop
    # and 8x pyramid an enc frame is 80ms, and normal speech exceeds 0.5
    # chars per 80ms, so every dev decode of the r3 soak was cut at
    # 0.5*(400/8)=25 chars, freezing dev CER at the constant truncation
    # floor for 2000 steps.  Set it only when the unit rate is known
    # (e.g. word/BPE units, or long-audio serving where the scan-length
    # saving matters); max_decode_len stays the runaway bound.
    max_decode_ratio: float = 0.0
    max_decode_len: int = 256         # hard cap (static shape under jit)
    length_penalty: float = 1.0       # score / len**penalty
    lm_weight: float = 0.0            # shallow-fusion LM weight
    lm_ckpt: str = ""                 # workdir of a trained LM (lm_trainer)
    ilm_weight: float = 0.0           # transducer fusion: SUBTRACT the
                                      # internal LM (HAT density ratio)
    coverage_weight: float = 0.0
    ctc_weight: float = 0.0           # joint CTC-attention decoding weight
                                      # (needs a CTC head): n-best rescoring
                                      # by default, in-beam prefix scores
                                      # with ctc_one_pass
    ctc_one_pass: bool = False        # true = ONE-PASS joint decoding: CTC
                                      # prefix scores steer every beam step
                                      # (decode/ctc_prefix.py, Watanabe
                                      # 2017) instead of rescoring the
                                      # finished n-best
    max_symbols: int = 4              # transducer: max label emissions per
                                      # encoder frame (greedy + beam)
    average_ckpts: int = 0            # >1: decode with the mean of the last
                                      # k retained checkpoints' params
    use_ema: bool = False             # decode/validate with the Polyak-EMA
                                      # weights (train.polyak_decay > 0, or
                                      # the pseudo-label EMA teacher);
                                      # mutually exclusive w/ average_ckpts
    bias_phrases: str = ""            # contextual biasing: path to a hotword
                                      # file (one phrase per line, encoded
                                      # with the run's vocab/BPE tokenizer);
                                      # beam decode only (decode/biasing.py)
    bias_bonus: float = 0.0           # per-matched-token log-prob boost for
                                      # bias phrases; partial matches retract
                                      # on failure/EOS so only completed
                                      # phrases keep the bonus


@dataclass(frozen=True)
class LMConfig:
    """External LM for shallow fusion (models/lm.py, lm_trainer.py)."""

    arch: str = "lstm"                # "lstm" | "transformer"
    embed_dim: int = 128              # lstm embed / transformer d_model
    hidden: int = 512                 # lstm hidden per layer
    layers: int = 1
    # transformer-only
    heads: int = 4
    ff_dim: int = 512
    max_len: int = 256                # KV-cache length; must cover
                                      # decode.max_decode_len for fusion
    learning_rate: float = 1e-3
    total_steps: int = 5000
    batch_size: int = 64
    log_every: int = 200


@dataclass(frozen=True)
class PretrainConfig:
    """BEST-RQ self-supervised encoder pretraining (arXiv:2202.01855;
    objectives/best_rq.py, training/pretrain.py).

    A separate STAGE, not a loss term: ``python -m
    semi_supervised_asr_tpu.training.pretrain`` trains the configured
    listener on the unlabeled-audio stream (falling back to the labeled
    audio, transcripts unused) with masked codebook prediction, then any
    family's training run starts from it via
    ``train.init_encoder_from=<pretrain workdir>``.  Optimizer/LR/batch
    knobs come from ``train.*``; these are the objective's own knobs.
    """

    codebook_size: int = 512      # frozen random codebook rows
    codebook_dim: int = 16        # projection dim (paper: 16)
    mask_prob: float = 0.01       # per-frame span-start probability
    mask_span: int = 20           # frames per masked span (200ms @ 10ms)
    mask_noise_std: float = 0.1   # N(0, std) replaces masked frames
    quantizer_seed: int = 7       # regenerates the frozen quantizer
    total_steps: int = 10000
    log_every: int = 100
    ckpt_every: int = 0           # 0: save at the end only; >0: also
                                  # every N steps — the driver resumes
                                  # from the latest save with the EXACT
                                  # stream position (bitwise trajectory)


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"        # "synthetic" | "timit" | "librispeech"
    data_dir: str = ""
    unit: str = "phone"               # "phone" (TIMIT) | "char" | "bpe"
    timit_fold48: bool = False        # train on the 48-class fold
                                      # (61->48, Lee & Hon); score 39 always
    sortagrad_epochs: int = 0         # first N epochs ascending by length
                                      # (SortaGrad warmup), shuffled after
    # length bucketing: static (frames, tokens) buckets -> jit-stable shapes
    frame_buckets: tuple[int, ...] = (200, 400, 800, 1600)
    token_buckets: tuple[int, ...] = (32, 64, 128, 256)
    # Constant-FRAMES batching for the labeled training stream: when >0,
    # each frame bucket's batch size becomes ~batch_frames // bucket
    # (rounded down to the mesh's data-axis granule, min one granule) so
    # short-utterance batches grow to keep the device's frames/step flat
    # instead of leaving the MXU underfed at small buckets.  Compiled
    # variants stay bounded by the bucket grid (B is a function of the
    # frame bucket).  0 = fixed train.batch_size everywhere; eval and the
    # unlabeled/text streams always use train.batch_size.
    batch_frames: int = 0
    # semi-supervised streams
    labeled_split: str = "train"
    test_split: str = ""              # scored by --test; empty -> dev
    bpe_path: str = ""                # unit=bpe: trained bpe.json
                                      # (preprocess --bpe N); empty -> a
                                      # merge-free char-piece fallback
    unlabeled_audio_split: str = ""
    unlabeled_text_split: str = ""
    num_synthetic_utts: int = 128
    synthetic_seed: int = 1234
    # >0: synthetic token sequences follow a sparse first-order Markov
    # grammar with this many allowed successors per token (instead of
    # iid-uniform) — gives text-AE/pseudo-label terms linguistic structure
    # to exploit (experiments/structured_semi.py)
    synthetic_grammar: int = 0
    # >0: hard-mode synthetic acoustics with a CALIBRATED nonzero error
    # floor (confusable signature groups + per-utterance speaker warp /
    # rate jitter / channel tilt + SNR tied to this knob) — the r4 soak
    # corpus was solved to dev WER 0.0000, so at-scale quality claims
    # need this.  See data/synthetic.py hard_params() for the mapping
    # and experiments/README for the measured difficulty→WER curve.
    synthetic_difficulty: float = 0.0
    drop_remainder: bool = True
    # train from precomputed HDF5 log-mel features (<data_dir>/<split>.h5,
    # written by preprocess --features) instead of raw audio + on-device
    # frontend.  Reference-parity path; the raw-audio path is preferred (C2).
    use_feature_store: bool = False
    # >0: assemble batches through grain with this many read-ahead threads
    # (host work overlaps device steps); 0 = plain in-line pipeline
    grain_threads: int = 0
    # Input batches held in flight on the device: transfers for the next
    # N batches start while the current step computes, hiding H2D time
    # (and, through a tunneled chip, the per-dispatch transfer handshake
    # — measured ~75ms/step hidden at ls100 shapes).  1 = no overlap.
    device_prefetch: int = 2
    # Ship batch audio to the device as int16 (half the host->device
    # bytes; the train/eval step upcasts to f32*1/32768 on-device as its
    # first op).  LOSSLESS for 16-bit PCM sources (TIMIT/LibriSpeech —
    # the f32 values are exactly int/32768, so the round trip is exact;
    # tests/test_i16_transfer.py); float sources (.npy, synthetic) are
    # clipped+rounded to the int16 grid, so leave this off for them.
    audio_i16_transfer: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh layout (BASELINE.json:11).

    ``model_parallel > 1`` enables Megatron-style tensor parallelism over
    the ``model`` axis: vocab-adjacent params (embedding rows, output
    projection columns, CTC head) live sharded; everything else replicates
    (parallel/tp.py).  Worth it for large BPE vocabularies; DP alone is
    optimal at phone/char vocab sizes.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1
    donate_state: bool = True


@dataclass(frozen=True)
class Config:
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    lm: LMConfig = field(default_factory=LMConfig)
    pretrain: PretrainConfig = field(default_factory=PretrainConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    objective: ObjectiveConfig = field(default_factory=ObjectiveConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    data: DataConfig = field(default_factory=DataConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    name: str = "default"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


_SECTIONS = {
    "frontend": FrontendConfig,
    "lm": LMConfig,
    "pretrain": PretrainConfig,
    "model": ModelConfig,
    "objective": ObjectiveConfig,
    "train": TrainConfig,
    "decode": DecodeConfig,
    "data": DataConfig,
    "parallel": ParallelConfig,
}


def _coerce(cls, raw: dict[str, Any]):
    """Build a dataclass from a dict, with type checking on field names."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in raw.items():
        if k not in fields:
            raise KeyError(f"unknown config key {cls.__name__}.{k}")
        if isinstance(v, list):
            v = tuple(v)
        kw[k] = v
    return cls(**kw)


def config_from_dict(d: dict[str, Any]) -> Config:
    kw: dict[str, Any] = {}
    for section, cls in _SECTIONS.items():
        if section in d:
            kw[section] = _coerce(cls, d[section] or {})
    if "name" in d:
        kw["name"] = d["name"]
    unknown = set(d) - set(_SECTIONS) - {"name"}
    if unknown:
        raise KeyError(f"unknown config sections: {sorted(unknown)}")
    return Config(**kw)


def load_config(path: str | Path, overrides: list[str] | None = None) -> Config:
    """Load a YAML config file and apply ``section.key=value`` overrides."""
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        parts = key.split(".")
        if len(parts) != 2:
            raise ValueError(f"override key must be section.field, got {key!r}")
        sec, fld = parts
        d.setdefault(sec, {})
        d[sec][fld] = yaml.safe_load(val)  # parses ints/floats/bools/lists
    return config_from_dict(d)


def save_config(cfg: Config, path: str | Path) -> None:
    Path(path).write_text(cfg.to_yaml())


def config_fingerprint(cfg: Config) -> str:
    """Stable hash of the config, logged alongside checkpoints."""
    import hashlib

    blob = json.dumps(cfg.to_dict(), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]
