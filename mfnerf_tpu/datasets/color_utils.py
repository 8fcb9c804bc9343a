"""Image reading and color-space helpers (NumPy/cv2/imageio, torch-free).

Parity with reference datasets/color_utils.py: uint8 -> float, optional
alpha blend-to-white (blend_a=False drops alpha onto black, used by the
COLMAP loader), cv2 resize, flatten to (H*W, C).
"""
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in this image
    cv2 = None
try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    img = np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img)
    img[img > 1] = 1  # "clamp" tonemapper
    return img


def read_image(img_path, img_wh, blend_a=True):
    """Read an image to a flattened (H*W, 3) float32 array in [0,1].

    Uses the C++ native loader (csrc/nativeloader.cc: libpng/libjpeg decode +
    alpha blend + bilinear resize) when built; falls back to imageio+cv2.
    """
    from .. import native
    if native.available() and img_path.lower().endswith(
            (".png", ".jpg", ".jpeg")):
        try:
            return native.load_images([img_path], img_wh, blend_a=blend_a)[0]
        except IOError:
            pass  # odd subformat — fall through to imageio
    img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[2] == 4:  # blend alpha to RGB
        if blend_a:
            img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        else:
            img = img[..., :3] * img[..., -1:]
    if (img.shape[1], img.shape[0]) != tuple(img_wh):
        if cv2 is not None:
            img = cv2.resize(img, tuple(img_wh))
        else:
            from PIL import Image
            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    tuple(img_wh))).astype(np.float32) / 255.0
    return img.reshape(-1, img.shape[-1]).astype(np.float32)
