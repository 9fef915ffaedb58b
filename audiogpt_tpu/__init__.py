"""audiogpt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-AI framework.

One framework with the capabilities of AudioGPT (AIGC-Audio/AudioGPT): TTS,
singing-voice synthesis, ASR, text/image-to-audio latent diffusion + inpainting,
audio captioning, sound-event / target-sound detection, language-queried source
extraction, speech enhancement/separation, and mono-to-binaural rendering —
orchestrated by an LLM agent, served by jit-compiled engines.

Design stance (vs. the reference's 18 vendored PyTorch repos glued by one file):
  * one shared DSP frontend (STFT / log-mel / iSTFT / resample) replaces ~6
    scattered librosa/torchlibrosa implementations,
  * one generic latent-diffusion engine with a fused `lax.scan` sampler serves
    T2A / I2A / inpaint / DiffSinger,
  * models are functional (flax.linen) with static shapes, bf16-friendly,
  * parallelism is a `jax.sharding.Mesh` + NamedSharding (DP/TP over ICI),
    not NCCL process groups.
"""

__version__ = "0.1.0"
