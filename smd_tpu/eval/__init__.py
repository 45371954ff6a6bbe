from smd_tpu.eval import metrics  # noqa: F401
