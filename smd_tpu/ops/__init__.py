from smd_tpu.ops import flash_attention  # noqa: F401
from smd_tpu.ops import quant  # noqa: F401
