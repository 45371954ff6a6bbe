from smd_tpu.data import pipeline, records, synthetic, transforms  # noqa: F401
