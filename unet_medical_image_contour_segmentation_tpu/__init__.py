"""TPU-native medical-image contour segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Florescence/UNet-Medical-Image-Contour-Segmentation`` (a PyTorch UNet fork
for contour segmentation of 16-bit RAW medical scans): the UNet model family,
the compound CE/BCE + Dice + boundary loss, the training/eval engine, the
predict CLI, and the 5-stage RAW -> contour-JSON pipeline — all built
TPU-first (NHWC, bf16 MXU compute, jitted train step, data-parallel sharding
over a device mesh).
"""

from .models.unet import UNet, get_model, unet, unet_s, unet_sa, unet_t

__version__ = "0.1.0"

__all__ = ["UNet", "get_model", "unet", "unet_s", "unet_sa", "unet_t", "__version__"]
