from audiogpt_tpu.models.diffusion.unet import UNetModel, UNetConfig  # noqa: F401
from audiogpt_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig  # noqa: F401
from audiogpt_tpu.models.diffusion.samplers import (  # noqa: F401
    DiffusionSchedule,
    ddim_sample,
    ddpm_sample,
    dpmpp_sample,
    plms_sample,
)
