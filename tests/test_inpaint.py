"""Occlusion-aware completion (vpt_tpu/inpaint.py).

Pins the two mathematical contracts the module rests on — the CG solve
reproduces the exact biharmonic continuation (quadratic fields in linear
space, Gaussian cores in log space), and the visibility proxy's
monotonic geometry — plus the end-to-end claim on the config-3 scene
family: damaged occluded cores recover from measured-visible material
alone."""

import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu import inpaint, volume


def _ball_mask(n, c=0.5, r=0.18):
    g = (np.arange(n) + 0.5) / n
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return jnp.asarray((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
                       < r * r)


def test_quadratic_fill_is_exact():
    # Delta^2 of any quadratic is 0, so the biharmonic fill must
    # reproduce a quadratic field exactly from its complement.
    n = 48
    g = (np.arange(n) + 0.5) / n
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    quad = jnp.asarray(0.3 + 0.5 * x - 0.2 * y + 0.8 * z * z
                       - 0.4 * x * y, jnp.float32)
    mask = _ball_mask(n)
    damaged = jnp.where(mask, 0.0, quad)
    filled = inpaint.biharmonic_fill(damaged, mask, log_space=False,
                                     cg_iters=300, clip=False)
    err = np.abs(np.asarray(filled - quad))[np.asarray(mask)]
    assert err.max() < 2e-3, err.max()


def test_gaussian_core_recovers_in_log_space():
    # A Gaussian is quadratic in log space: log-domain completion
    # rebuilds the peak from the visible skirt; linear-domain biharmonic
    # (a quadratic cap on the clipped profile) is measurably worse.
    n = 64
    g = (np.arange(n) + 0.5) / n
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
    truth = jnp.asarray(0.9 * np.exp(-r2 / (2 * 0.12 ** 2)), jnp.float32)
    mask = _ball_mask(n, r=0.12)
    damaged = jnp.where(mask, 0.4 * truth, truth)
    log_fill = inpaint.biharmonic_fill(damaged, mask, log_space=True)
    lin_fill = inpaint.biharmonic_fill(damaged, mask, log_space=False)
    m = np.asarray(mask)
    mse = lambda v: float(np.mean((np.asarray(v) - np.asarray(truth))[m] ** 2))
    assert mse(log_fill) < 1e-4, mse(log_fill)
    assert mse(log_fill) < 0.5 * mse(lin_fill) + 1e-6
    # untouched outside the mask
    np.testing.assert_array_equal(np.asarray(log_fill)[~m],
                                  np.asarray(truth)[~m])


def test_unobserved_mask_geometry():
    # Uniform ball: the unobserved set is centered, grows with
    # extinction, shrinks with tau, and is empty for a thin volume.
    n = 64
    rho = _ball_mask(n, r=0.3).astype(jnp.float32)
    m_lo = inpaint.unobserved_mask(rho, extinction=5.0, tau=3.0)
    m_hi = inpaint.unobserved_mask(rho, extinction=25.0, tau=3.0)
    assert int(m_hi.sum()) > int(m_lo.sum())
    assert not bool(inpaint.unobserved_mask(rho, 0.5, tau=3.0).any())
    # monotone in tau
    m_t5 = inpaint.unobserved_mask(rho, extinction=25.0, tau=5.0)
    assert bool(jnp.all(~m_t5 | m_hi))
    # the detected set sits inside the ball, around its center
    assert bool(jnp.all(~m_hi | (rho > 0)))
    c = np.argwhere(np.asarray(m_hi)).mean(0)
    np.testing.assert_allclose(c, [n / 2 - 0.5] * 3, atol=2.0)


@pytest.mark.parametrize("tau", [2.0, 3.0])
def test_blobs_core_completion(tau):
    # End-to-end on the config-3 scene family at 64^3: damage every
    # occluded voxel the way the measured fits leave them (blurred,
    # dimmed), complete from the visible material only, and require the
    # core bucket to recover most of the damage.
    truth = volume.blobs_volume(64, seed=3, count=6).data[..., 0]
    mask = inpaint.unobserved_mask(truth, extinction=25.0, tau=tau)
    assert 0.0 < float(mask.mean()) < 0.2
    damaged = jnp.where(mask, 0.45 * truth, truth)
    filled, m2 = inpaint.complete_occluded(damaged, extinction=25.0,
                                           tau=tau)
    # m2 is recomputed on the damaged volume: damage only lowers density,
    # optical depth is monotone in density, so the recomputed unseen set
    # must be a subset of the truth-derived one (m2 ⊆ mask) — and the
    # damage pattern must still be detectable (m2 nonempty).
    assert bool(jnp.all(~m2 | mask))
    assert bool(m2.any())
    mn = np.asarray(mask)
    tr = np.asarray(truth)
    mse0 = float(np.mean((np.asarray(damaged) - tr)[mn] ** 2))
    mse1 = float(np.mean((np.asarray(filled) - tr)[mn] ** 2))
    assert mse1 < 0.25 * mse0, (mse0, mse1)
