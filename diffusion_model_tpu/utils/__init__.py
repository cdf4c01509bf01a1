from diffusion_model_tpu.utils.logging import RunLogger

__all__ = ["RunLogger"]
