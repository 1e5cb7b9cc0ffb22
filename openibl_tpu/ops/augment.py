"""On-device color augmentation (train-time ColorJitter).

The reference jitters on host CPU workers through PIL
(/root/reference/ibl/utils/data/__init__.py:30-32 — ColorJitter(0.7, 0.7,
0.7, 0.5) before resize/normalize), which on few-core TPU hosts becomes the
training bottleneck long before the chip does. This module is the TPU-native
alternative: the host pipeline only decodes + resizes to uint8, and the
jitter runs inside the jitted train step as fused element-wise VPU work —
per-image factors and op order drawn from a jax PRNG key, so augmentation is
deterministic given (seed, epoch, subset, step) and bit-reproducible across
resumes.

Semantics follow torchvision/PIL ColorJitter (the reference's): factors
uniform in [max(0, 1-x), 1+x] (hue in [-hue, hue]), the four ops applied in
a uniformly random order per image:

  brightness(x, f) = f * x
  contrast(x, f)   = mean(L(x)) + f * (x - mean(L(x)))
  saturation(x, f) = L(x) + f * (x - L(x))
  hue(x, s)        = hsv -> h + s (mod 1) -> rgb

with L the ITU-R 601 luma PIL uses. Deviation (documented): PIL quantizes to
uint8 between ops; here the chain stays float32 with a [0, 255] clip after
each op, i.e. ≤1/255-per-stage rounding differences — immaterial for a
random augmentation and strictly less information loss.

Images are (N, H, W, 3) float32 at 0..255 scale (pre-mean-subtraction).
"""

import jax
import jax.numpy as jnp
import numpy as np

# PIL's RGB->L luma weights (ITU-R 601, Pillow ImageOps/convert("L")).
# numpy (not jnp) on purpose: a module-level jnp constant would become a
# tracer if this module is first imported inside a jit trace (the trainers
# import it lazily) and leak out as a global.
_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def _clip(x):
    return jnp.clip(x, 0.0, 255.0)


def _brightness(x, f):
    return _clip(x * f)


def _contrast(x, f):
    mean = jnp.mean(x @ _LUMA)
    return _clip(mean + f * (x - mean))


def _saturation(x, f):
    l = (x @ _LUMA)[..., None]
    return _clip(l + f * (x - l))


def _rgb_to_hsv(x):
    """x (H, W, 3) in [0, 1] → (h, s, v) each (H, W)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    lo = jnp.min(x, axis=-1)
    c = v - lo
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _hue(x, shift):
    h, s, v = _rgb_to_hsv(x / 255.0)
    return _clip(_hsv_to_rgb((h + shift) % 1.0, s, v) * 255.0)


def color_jitter_image(x, key, brightness=0.7, contrast=0.7, saturation=0.7,
                       hue=0.5):
    """Jitter one (H, W, 3) float32 image at 0..255 scale.

    Zero-range ops are skipped at TRACE time (the ranges are static), exactly
    like torchvision skips disabled ops — a factor-1 contrast or shift-0 hue
    is NOT bit-identity (float reassociation, HSV round-trip), so running
    them would break the module's bit-reproducibility contract for users who
    disable ops. The key is always split the same way, so enabling one op
    never changes another op's random factors."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    branches = []
    if brightness > 0:
        fb = jax.random.uniform(kb, minval=max(0.0, 1 - brightness),
                                maxval=1 + brightness)
        branches.append(lambda x, f=fb: _brightness(x, f))
    if contrast > 0:
        fc = jax.random.uniform(kc, minval=max(0.0, 1 - contrast),
                                maxval=1 + contrast)
        branches.append(lambda x, f=fc: _contrast(x, f))
    if saturation > 0:
        fs = jax.random.uniform(ks, minval=max(0.0, 1 - saturation),
                                maxval=1 + saturation)
        branches.append(lambda x, f=fs: _saturation(x, f))
    if hue > 0:
        fh = jax.random.uniform(kh, minval=-hue, maxval=hue)
        branches.append(lambda x, f=fh: _hue(x, f))
    if not branches:
        return jnp.asarray(x, jnp.float32)  # all disabled: exact identity
    # NB: under vmap the batched switch index makes every slot evaluate all
    # enabled branches and select (16 elementwise passes per image at the
    # default four, 4 of them HSV round-trips). That is the cost of
    # per-image random op ORDER with one compiled program; it totals <1% of
    # a VGG16 forward on the same pixels, so clarity wins over a
    # gather-based reformulation.
    order = jax.random.permutation(kp, len(branches))
    for slot in range(len(branches)):
        x = jax.lax.switch(order[slot], branches, x)
    return x


def color_jitter_batch(images, key, brightness=0.7, contrast=0.7,
                       saturation=0.7, hue=0.5):
    """Jitter (N, H, W, 3) images (uint8 or float32, 0..255 scale) with
    independent per-image factors and op order. Returns float32.

    Zero-range ops are skipped at trace time (see color_jitter_image);
    all four at zero is an exact float32 identity.
    """
    images = jnp.asarray(images, jnp.float32)
    keys = jax.random.split(key, images.shape[0])
    fn = lambda img, k: color_jitter_image(
        img, k, brightness=brightness, contrast=contrast,
        saturation=saturation, hue=hue,
    )
    return jax.vmap(fn)(images, keys)
