from xbitops_tpu.ops.dequant import dequant, dequant_qtensor  # noqa: F401
from xbitops_tpu.ops.dense import dense_matmul  # noqa: F401
from xbitops_tpu.ops.qmatmul import gemv, qmatmul  # noqa: F401
from xbitops_tpu.ops.quantize import quantize_array  # noqa: F401
