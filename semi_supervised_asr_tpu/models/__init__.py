from semi_supervised_asr_tpu.models.seq2seq import (  # noqa: F401
    init_model,
    forward_teacher,
    encode,
)
