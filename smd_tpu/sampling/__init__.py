from smd_tpu.sampling import mdn_decode  # noqa: F401
