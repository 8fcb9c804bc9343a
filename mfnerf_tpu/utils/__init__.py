from .ckpt import save_ckpt, load_ckpt, slim_ckpt, extract_model_state
from .metrics import mse, psnr, ssim

__all__ = ["save_ckpt", "load_ckpt", "slim_ckpt", "extract_model_state",
           "mse", "psnr", "ssim"]
