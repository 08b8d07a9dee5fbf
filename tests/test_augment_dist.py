"""Distribution audit of the on-device augmentation parameters vs the
albumentations semantics they replace (VERDICT r1 item 8; reference
pipeline train_bce_dice.py:164-181: Rotate(limit=20, p=0.5),
RandomScale(0.12, p=0.5); finetune_for_224.py:88-109:
ShiftScaleRotate(0.02, 0.12, 5, p=0.20)).

albumentations draws each op's parameters per IMAGE: applied w.p. p,
parameter ~ U(-limit, limit). We verify by KS test that
draw_warp_params reproduces (a) the Bernoulli(p) application rate and
(b) the conditional U(-limit, limit) marginal, and that
per_sample_warp=True restores the exact independent per-image JOINT
(distinct within-batch values), while the batch-shared default matches
the same marginal at batch granularity."""

import numpy as np
from scipy import stats

import jax
import jax.numpy as jnp

from cartseg_tpu.data import AugmentConfig, draw_warp_params


def _draws(cfg, shape, n=4000, seed=0):
    out = {"angle": [], "scale": [], "ty": [], "tx": []}
    H = W = 224

    @jax.jit
    def one(key):
        k = {name: jax.random.fold_in(key, i) for i, name in enumerate(
            ["flip", "rot", "zoom", "ssr", "bc", "hsv", "cj", "noise",
             "blur"])}
        return draw_warp_params(k, cfg, shape, H, W)

    keys = jax.random.split(jax.random.key(seed), n)
    a, s, ty, tx = jax.vmap(one)(keys)
    return (np.asarray(a).ravel(), np.asarray(s).ravel(),
            np.asarray(ty).ravel(), np.asarray(tx).ravel())


def _check_mixture(vals, p, lo, hi, ident):
    """vals ~ ident w.p. (1-p), else U(lo,hi): check the application
    rate (binomial 4-sigma) and KS of the conditional uniform."""
    applied = vals[vals != ident]
    n = len(vals)
    rate = len(applied) / n
    sigma = np.sqrt(p * (1 - p) / n)
    assert abs(rate - p) < 4 * sigma, f"rate {rate} vs p={p}"
    ks = stats.kstest(applied, stats.uniform(loc=lo, scale=hi - lo).cdf)
    assert ks.pvalue > 1e-3, f"KS reject: {ks}"


def test_rotate_marginal_per_sample():
    cfg = AugmentConfig.train_512()  # Rotate(20, p=.5), zoom(.12, p=.5)
    a, s, _, _ = _draws(cfg, (8,), n=1000)
    _check_mixture(a, cfg.rotate_p, -20.0, 20.0, 0.0)
    _check_mixture(s, cfg.scale_p, 1.0 - 0.12, 1.0 + 0.12, 1.0)


def test_rotate_marginal_batch_shared():
    # one draw per batch: same marginal at batch granularity
    cfg = AugmentConfig.train_512()
    a, s, _, _ = _draws(cfg, (), n=8000)
    _check_mixture(a, cfg.rotate_p, -20.0, 20.0, 0.0)
    _check_mixture(s, cfg.scale_p, 1.0 - 0.12, 1.0 + 0.12, 1.0)


def test_ssr_marginals_224():
    cfg = AugmentConfig.train_224()  # SSR(p=.2, shift .02, scale .12, rot 5)
    a, s, ty, tx = _draws(cfg, (8,), n=2000)
    _check_mixture(a, cfg.shift_scale_rotate_p, -5.0, 5.0, 0.0)
    _check_mixture(s, cfg.shift_scale_rotate_p, 0.88, 1.12, 1.0)
    _check_mixture(ty, cfg.shift_scale_rotate_p,
                   -0.02 * 224, 0.02 * 224, 0.0)
    _check_mixture(tx, cfg.shift_scale_rotate_p,
                   -0.02 * 224, 0.02 * 224, 0.0)


def test_per_sample_within_batch_independence():
    """per_sample_warp=True must give independent per-image parameters
    (albumentations' joint); the batch-shared default is constant
    within a batch by construction."""
    cfg = AugmentConfig.train_512()
    H = W = 224
    k = {name: jax.random.fold_in(jax.random.key(3), i)
         for i, name in enumerate(
             ["flip", "rot", "zoom", "ssr", "bc", "hsv", "cj", "noise",
              "blur"])}
    a, s, _, _ = draw_warp_params(k, cfg, (64,), H, W)
    a = np.asarray(a)
    applied = a[a != 0.0]
    assert len(np.unique(applied)) == len(applied) > 10
    # lag-1 autocorrelation of applied angles ~ 0 (independent draws)
    if len(applied) > 20:
        r = np.corrcoef(applied[:-1], applied[1:])[0, 1]
        assert abs(r) < 0.35
