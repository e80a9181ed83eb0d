"""Image preprocessing for the Sentibank featurizer.

Reference semantics (featurizer/sbpycaffe_img_featurizer.py:41-50,103-134):
load RGB -> lanczos resize to 256x256 (as uint8, 0..255) -> central 227x227
crop -> RGB->BGR channel swap -> subtract the (cropped) mean image; pixels
stay in 0..255 scale.

Split TPU-first: the variable-size lanczos resize runs on the host via PIL
(the same Lanczos kernel scipy.misc.imresize wrapped in the reference), and
everything from the fixed-size 256x256 stack onward — crop, channel swap,
mean subtraction — is one fused jitted op feeding the conv stack, so batches
cross PCIe once as uint8.
"""


import jax
import jax.numpy as jnp
import numpy as np

TARGET = 256
CROP = 227
# Central crop offsets (reference lines 72-76): (256 - 227) // 2.
OFF = (TARGET - CROP) // 2

# Caffe ImageNet per-channel means (BGR); used when the original mean-image
# file is not supplied. ``load_mean_npy`` gives exact parity when it is.
IMAGENET_BGR_MEAN = (104.00698793, 116.66876762, 122.67891434)


def default_mean_image():
    """[227, 227, 3] BGR mean in 0..255 scale."""
    mean = np.zeros((CROP, CROP, 3), dtype=np.float32)
    mean[...] = IMAGENET_BGR_MEAN
    return mean


def load_mean_npy(path):
    """Load a Caffe mean .npy ([3, 256, 256] CHW BGR) and central-crop it
    (reference: sbpycaffe_img_featurizer.py:69-80)."""
    m = np.load(path)
    if m.ndim == 3 and m.shape[0] == 3:
        m = np.transpose(m, (1, 2, 0))  # -> HWC BGR
    return m[OFF:OFF + CROP, OFF:OFF + CROP, :].astype(np.float32)


def resize_host(img):
    """Host-side lanczos resize of one RGB uint8 image to 256x256.

    Uses PIL's Lanczos — the same resampler scipy.misc.imresize delegated to
    in the reference (resize_type='lanczos', sbpycaffe_img_featurizer.py:47).
    """
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 2:  # grayscale -> RGB (reference BW fix)
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 4:  # RGBA -> RGB
        img = img[:, :, :3]
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((TARGET, TARGET), Image.LANCZOS))


@jax.jit
def preprocess_device(x_uint8, mean):
    """Fused crop + BGR swap + mean subtraction.

    :param x_uint8: [N, 256, 256, 3] uint8 RGB
    :param mean: [227, 227, 3] float32 BGR mean (0..255 scale)
    :returns: [N, 227, 227, 3] float32 BGR, mean-subtracted
    """
    x = x_uint8[:, OFF:OFF + CROP, OFF:OFF + CROP, :].astype(jnp.float32)
    x = x[..., ::-1]  # RGB -> BGR
    return x - mean[None]


def preprocess_batch(imgs, mean):
    """Host resize (parallel PIL) + device crop/swap/mean-sub.

    :param imgs: iterable of HxWx3 uint8 RGB arrays (any sizes)
    :returns: [N, 227, 227, 3] float32 device array ready for the net
    """
    stack = np.stack([resize_host(im) for im in imgs])
    return preprocess_device(stack, jnp.asarray(mean))


def preprocess_buffers(buffers, mean, n_threads: int = 0,
                       dct_scale: bool = True):
    """Encoded buffers -> net input via the native decode+resize pipeline
    (native/imgpipe.cpp; PIL fallback inside).

    ``dct_scale`` decodes JPEGs at a DCT-reduced resolution before the
    Lanczos pass (2-4x faster per host core); pass False for the
    bit-exact full-resolution decode path.

    :returns: ([N, 227, 227, 3] float32 device array, status [N] int32 —
        0 = ok, nonzero rows are zero images)
    """
    from columbiaimagesearch_tpu.native import decode_resize_batch

    stack, status = decode_resize_batch(buffers, TARGET, n_threads=n_threads,
                                        dct_scale=dct_scale)
    return preprocess_device(stack, jnp.asarray(mean)), status
