from xbitops_tpu.io.gptq_loader import load_autogptq  # noqa: F401
from xbitops_tpu.io.checkpoint import load_packed, save_packed  # noqa: F401
