from xbitops_tpu.engine.engine import Completion, Engine, Request  # noqa: F401
from xbitops_tpu.engine.sampling import sample_tokens  # noqa: F401
