"""Color-space conversions and packing helpers.

Parity with the reference's color mixins: XYZITU2002.glsl:3-30 (RGB↔XYZ↔xyY),
YUVBT601.glsl / YUVBT709.glsl (RGB↔YUV), hue.glsl:3-10 (scalar→rainbow), and
the float↔RGBA8 packers (floatToRgba.glsl / rgbaToFloat.glsl) used for
non-float render targets.  All functions are elementwise over (..., 3)/(..., 4)
float32 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_RGB2XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=np.float32)

_XYZ2RGB = np.array([
    [3.240481, -1.537152, -0.498536],
    [-0.969255, 1.875990, 0.041556],
    [0.055647, -0.204041, 1.057311],
], dtype=np.float32)

_RGB2YUV_601 = np.array([
    [0.29900, 0.58700, 0.11400],
    [-0.14713, -0.28886, 0.43600],
    [0.61500, -0.51499, -0.10001],
], dtype=np.float32)

_YUV2RGB_601 = np.array([
    [1.0, 0.0, 1.13983],
    [1.0, -0.39465, -0.58060],
    [1.0, 2.03211, 0.0],
], dtype=np.float32)

_RGB2YUV_709 = np.array([
    [0.21260, 0.71520, 0.07220],
    [-0.09991, -0.33609, 0.43600],
    [0.61500, -0.55861, -0.05639],
], dtype=np.float32)

_YUV2RGB_709 = np.array([
    [1.0, 0.0, 1.28033],
    [1.0, -0.21482, -0.38059],
    [1.0, 2.12798, 0.0],
], dtype=np.float32)


def rgb2xyz(rgb):
    return jnp.matmul(rgb, _RGB2XYZ.T, precision=jax.lax.Precision.HIGHEST)


def xyz2rgb(xyz):
    return jnp.matmul(xyz, _XYZ2RGB.T, precision=jax.lax.Precision.HIGHEST)


def xyz2xyY(xyz):
    s = xyz[..., 0] + xyz[..., 1] + xyz[..., 2]
    return jnp.stack([xyz[..., 0] / s, xyz[..., 1] / s, xyz[..., 1]], axis=-1)


def xyY2xyz(xyY):
    x, y, Y = xyY[..., 0], xyY[..., 1], xyY[..., 2]
    scale = Y / y
    return jnp.stack([x * scale, y * scale, (1.0 - x - y) * scale], axis=-1)


def rgb2yuv(rgb, standard="bt601"):
    m = _RGB2YUV_601 if standard == "bt601" else _RGB2YUV_709
    return jnp.matmul(rgb, m.T, precision=jax.lax.Precision.HIGHEST)


def yuv2rgb(yuv, standard="bt601"):
    m = _YUV2RGB_601 if standard == "bt601" else _YUV2RGB_709
    return jnp.matmul(yuv, m.T, precision=jax.lax.Precision.HIGHEST)


from .utils import smoothstep  # noqa: E402 — single shared implementation


def hue(x):
    """Scalar → rainbow RGBA (mixins/hue.glsl:3-10)."""
    part = 1.0 / 6.0
    x = jnp.asarray(x, jnp.float32)
    r = smoothstep(1 * part, 2 * part, x) - smoothstep(4 * part, 5 * part, x)
    g = smoothstep(0 * part, 1 * part, x) - smoothstep(3 * part, 4 * part, x)
    b = smoothstep(2 * part, 3 * part, x) - smoothstep(5 * part, 6 * part, x)
    return jnp.stack([1.0 - r, g, b, jnp.ones_like(x)], axis=-1)


def float_to_rgba(x):
    """Pack a [0,1) float into 4 × 8-bit channels (mixins/floatToRgba.glsl)."""
    encoder = jnp.array([1.0, 255.0, 255.0 ** 2, 255.0 ** 3], jnp.float32)
    corrector = jnp.array([1 / 255.0, 1 / 255.0, 1 / 255.0, 0.0], jnp.float32)
    enc = jnp.mod(jnp.asarray(x, jnp.float32)[..., None] * encoder, 1.0)
    shifted = jnp.concatenate([enc[..., 1:], enc[..., 3:4]], axis=-1)
    return enc - shifted * corrector


def rgba_to_float(rgba):
    """Inverse of :func:`float_to_rgba` (mixins/rgbaToFloat.glsl)."""
    decoder = 1.0 / jnp.array([1.0, 255.0, 255.0 ** 2, 255.0 ** 3], jnp.float32)
    return jnp.sum(rgba * decoder, axis=-1)


def encode_float(x):
    """Pack an arbitrary float32 into 4 × 8-bit channels as its IEEE-754
    bytes, little-endian, each scaled to [0, 1] (mixins/encodeFloat.glsl —
    the reference reconstructs sign/exponent/mantissa arithmetically; here
    the equivalent exact bit pattern comes from a bitcast)."""
    import jax.lax as lax

    bits = lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.uint32)
    bytes_ = jnp.stack([
        (bits >> jnp.uint32(0)) & jnp.uint32(0xFF),
        (bits >> jnp.uint32(8)) & jnp.uint32(0xFF),
        (bits >> jnp.uint32(16)) & jnp.uint32(0xFF),
        (bits >> jnp.uint32(24)) & jnp.uint32(0xFF),
    ], axis=-1)
    return bytes_.astype(jnp.float32) / 255.0


def decode_float(rgba):
    """Inverse of :func:`encode_float`."""
    import jax.lax as lax

    b = (jnp.asarray(rgba, jnp.float32) * 255.0 + 0.5).astype(jnp.uint32)
    bits = (b[..., 0] | (b[..., 1] << jnp.uint32(8))
            | (b[..., 2] << jnp.uint32(16)) | (b[..., 3] << jnp.uint32(24)))
    return lax.bitcast_convert_type(bits, jnp.float32)
