"""semi_supervised_asr_tpu: a TPU-native semi-supervised seq2seq ASR framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
``jjery2243542/semi-supervised-ASR`` (see /root/repo/SURVEY.md; the reference
mount was empty, so the functional contract is BASELINE.json's north-star):

* fused audio frontend (STFT -> mel -> log -> CMVN -> SpecAugment) as
  XLA + Pallas kernels emitting HBM-resident bucketed feature batches,
* pyramidal-BiLSTM listener and location-aware-attention speller compiled
  to ``lax.scan`` loops with jit-stable padded shapes,
* one fused jit train step covering supervised CE plus the semi-supervised
  terms (text autoencoder, pseudo-label consistency),
* batched, jit-compiled attention beam search with cached encoder states,
* data-parallel gradient allreduce over ICI via ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
