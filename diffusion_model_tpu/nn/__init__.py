from diffusion_model_tpu.nn.egnn import EGCL, EquivariantGNN
from diffusion_model_tpu.nn.compressor import SpectrumCompressor
from diffusion_model_tpu.nn.gamma import GammaNetwork, PositiveLinear
from diffusion_model_tpu.nn.denoiser import DiffusionDenoiser
from diffusion_model_tpu.nn.cn_mlp import CNPredictor

__all__ = [
    "EGCL",
    "EquivariantGNN",
    "SpectrumCompressor",
    "GammaNetwork",
    "PositiveLinear",
    "DiffusionDenoiser",
    "CNPredictor",
]
