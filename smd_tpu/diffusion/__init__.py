from smd_tpu.diffusion import schedules, losses, samplers  # noqa: F401
