"""Host-side image transforms (PIL/numpy): resize, flip, color jitter, BEV GT.

Replaces the torchvision transforms the reference composes per sample
(`mono_dataset.py:70-79,130-171,417-431`): LANCZOS resize to the working
resolutions, 50% horizontal flip, 50% ColorJitter(brightness/contrast/
saturation 0.8-1.2, hue +/-0.1), BEV binarization to `height // 4`.
All outputs are float32 NHWC in [0, 1].
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance

ANTIALIAS = Image.LANCZOS


def resize_image(img: Image.Image, height: int, width: int) -> Image.Image:
    return img.resize((width, height), ANTIALIAS)


def to_array(img: Image.Image) -> np.ndarray:
    """8-bit PIL image -> float32 in [0, 1].

    INVARIANT (load-bearing for TPU perf): every value this produces is
    exactly k/255 for integer k — `batch["color"]` (the un-jittered warp
    SOURCES) keeps this property all the way to the photometric gather,
    which is why `warp_tap_dtype="auto"`=uint8 on TPU can re-quantize the
    taps losslessly (round(color*255) recovers k; `ops/sampling.py`).
    `color_aug` (the network INPUT) may be jittered to arbitrary floats —
    that's fine, it is never gathered. If a future pipeline change feeds
    non-8-bit-exact values into `color`, set `warp_tap_dtype` to
    "bfloat16"/"float32" or the TPU path will silently clip+quantize the
    warp taps. `losses/multitask.py` asserts this invariant under
    JPERCEIVER_DEBUG_U8=1.
    """
    return np.asarray(img, np.float32) / 255.0


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1)) -> Image.Image:
    """torchvision-ColorJitter-style augmentation with a shuffled op order.

    Exact torchvision parity is impossible without it installed; the
    distributional behaviour (uniform factors, random order, shared params
    across the 3 frames — the caller draws params once) is preserved.
    """
    b = rng.uniform(*brightness)
    c = rng.uniform(*contrast)
    s = rng.uniform(*saturation)
    h = rng.uniform(*hue)
    order = rng.permutation(4)
    return apply_color_jitter(img, b, c, s, h, order)


def apply_color_jitter(img: Image.Image, b: float, c: float, s: float,
                       h: float, order) -> Image.Image:
    for op in order:
        if op == 0:
            img = ImageEnhance.Brightness(img).enhance(b)
        elif op == 1:
            img = ImageEnhance.Contrast(img).enhance(c)
        elif op == 2:
            img = ImageEnhance.Color(img).enhance(s)
        elif op == 3 and abs(h) > 1e-8:
            hsv = np.asarray(img.convert("HSV"), np.uint8).copy()
            # modulo keeps tiny negative h from producing uint8(256)
            shift = np.uint8(int(h * 255) % 256)
            hsv[..., 0] = hsv[..., 0] + shift  # uint8 wraparound
            img = Image.fromarray(hsv, "HSV").convert("RGB")
    return img


def process_topview(img: Image.Image, size: int, flip: bool) -> np.ndarray:
    """BEV label PNG -> (size, size) {0,1} float (`mono_dataset.py:417-424`).

    Reference chain: convert('1') -> NEAREST resize -> 'L' -> ==255.
    """
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    tv = img.convert("1").resize((size, size), Image.NEAREST).convert("L")
    arr = np.asarray(tv)
    return (arr == 255).astype(np.float32)


def process_topview_both(img: Image.Image, size: int, flip: bool) -> np.ndarray:
    """`both_dynamic` label: plain NEAREST resize then ==255 (`:425-431`)."""
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    tv = img.resize((size, size), Image.NEAREST)
    arr = np.asarray(tv)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return (arr == 255).astype(np.float32)
