from smd_tpu.models import blocks, ddpm, autoregressive  # noqa: F401
from smd_tpu.models.registry import get_model, MODEL_REGISTRY  # noqa: F401
