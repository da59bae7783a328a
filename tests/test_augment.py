"""Property tests for the on-device augmentation stack.

The reference relies on torchvision's implementations; torchvision is not
available here, so these tests check the documented sampler properties and
invariants instead of bit-exactness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touhouimageclassification_tpu.config import AugmentConfig
from touhouimageclassification_tpu.ops import augment as A
from touhouimageclassification_tpu.ops.mixup import cutmix_or_mixup

KEY = jax.random.key(0)


def _imgs(b=4, h=64, w=64, seed=0):
    return jax.random.uniform(jax.random.key(seed), (b, h, w, 3))


def test_resize_shape_and_range():
    out = A.resize(_imgs(), (32, 48))
    assert out.shape == (4, 32, 48, 3)
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1 + 1e-3


def test_rrc_shape_static_and_varies():
    imgs = _imgs()
    out1 = A.random_resized_crop(jax.random.key(1), imgs, (32, 32))
    out2 = A.random_resized_crop(jax.random.key(2), imgs, (32, 32))
    assert out1.shape == (4, 32, 32, 3)
    assert not np.allclose(out1, out2)


def test_rrc_full_crop_is_resize():
    """With scale=ratio=(1,1) RRC degenerates to a plain resize."""
    imgs = _imgs(b=2, h=32, w=32)
    out = A.random_resized_crop(
        jax.random.key(0), imgs, (16, 16), scale=(1.0, 1.0), ratio=(1.0, 1.0)
    )
    ref = A.resize(imgs, (16, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_hflip_prob_extremes():
    imgs = _imgs()
    never = A.random_hflip(KEY, imgs, p=0.0)
    always = A.random_hflip(KEY, imgs, p=1.0)
    np.testing.assert_array_equal(np.asarray(never), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(always), np.asarray(imgs[:, :, ::-1, :]))


def test_grayscale_channels_equal():
    out = A.random_grayscale(KEY, _imgs(), p=1.0)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(out[..., 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(out[..., 2]), atol=1e-6)


def test_grayscale_luma_weights():
    imgs = _imgs(b=1)
    out = A.random_grayscale(KEY, imgs, p=1.0)
    expect = 0.299 * imgs[..., 0] + 0.587 * imgs[..., 1] + 0.114 * imgs[..., 2]
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(expect), atol=1e-6)


def test_hue_roundtrip():
    """Zero-magnitude jitter is the identity (up to clipping)."""
    imgs = _imgs()
    out = A.color_jitter(KEY, imgs, brightness=0, contrast=0, saturation=0, hue=1e-9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)


def test_hsv_roundtrip_exact():
    imgs = _imgs(b=2)
    back = A._hsv_to_rgb(A._rgb_to_hsv(imgs))
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-5)


def test_color_jitter_changes_image_within_range():
    imgs = _imgs()
    out = A.color_jitter(jax.random.key(3), imgs)
    assert out.shape == imgs.shape
    assert not np.allclose(out, imgs)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_erasing_zeroes_a_plausible_area():
    imgs = jnp.ones((8, 64, 64, 3))
    out = A.random_erasing(jax.random.key(4), imgs, p=1.0)
    frac = 1.0 - np.asarray(out).mean(axis=(1, 2, 3))
    # every image has an erased box within the clipped scale range
    assert (frac > 0.005).all() and (frac < 0.4).all()


def test_erasing_off():
    imgs = _imgs()
    out = A.random_erasing(KEY, imgs, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_normalize():
    imgs = jnp.full((1, 2, 2, 3), 0.5)
    out = A.normalize(imgs, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("name,cfg", [
    ("full", AugmentConfig()),
    ("grey", AugmentConfig(only_grey_augmentation=True)),
    ("div_only", AugmentConfig(enable_generalization=False)),
    ("gen_only", AugmentConfig(enable_diversity=False)),
    ("none", AugmentConfig(enable_augmentation=False)),
])
def test_recipes_jit_and_shape(name, cfg):
    fn = jax.jit(A.build_augment_fn(cfg, (32, 32)))
    out = fn(jax.random.key(0), _imgs(h=48, w=48))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_invalid_recipe_rejected():
    with pytest.raises(ValueError, match="diversity or generalization"):
        AugmentConfig(enable_diversity=False, enable_generalization=False)


def test_mixup_soft_labels_sum_to_one():
    imgs = _imgs(b=6)
    labels = jax.nn.one_hot(jnp.array([0, 1, 2, 3, 4, 5]), 10)
    fn = jax.jit(cutmix_or_mixup)
    for seed in range(4):
        mixed, soft = fn(jax.random.key(seed), imgs, labels)
        assert mixed.shape == imgs.shape
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)
        # soft labels involve at most the sample's own class and its roll-partner
        assert int((np.asarray(soft) > 1e-6).sum(axis=1).max()) <= 2


def test_mixup_pixel_mass_conserved_under_mixup_branch():
    """Under MixUp the batch mean is invariant (rolled convex combination)."""
    imgs = _imgs(b=6)
    labels = jax.nn.one_hot(jnp.arange(6), 6)
    fn = jax.jit(cutmix_or_mixup)
    seen_mixup = False
    for seed in range(8):
        mixed, _ = fn(jax.random.key(seed), imgs, labels)
        if np.allclose(np.asarray(mixed).mean(), np.asarray(imgs).mean(), atol=1e-5):
            seen_mixup = True
    assert seen_mixup
