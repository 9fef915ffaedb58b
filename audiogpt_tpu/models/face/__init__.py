from audiogpt_tpu.models.face.audio2motion import (  # noqa: F401
    Audio2MotionConfig,
    Audio2MotionVAE,
    energy_articulation,
    kl_gauss,
)
from audiogpt_tpu.models.face.renderer import (  # noqa: F401
    LandmarkWarper,
    default_portrait,
    template_landmarks,
)
