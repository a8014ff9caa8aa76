from semi_supervised_asr_tpu.decode.greedy import greedy_decode  # noqa: F401
from semi_supervised_asr_tpu.decode.beam import beam_decode  # noqa: F401
