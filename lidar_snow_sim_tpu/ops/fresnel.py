"""Fresnel optics for wet-ground reflectance (device).

JAX port of the reference's power-coefficient chain
(`tools/wet_ground/phy_equations.py:12-108`): Snell refraction air->water,
power reflection/transmission at each interface, and the two-interface
multiple-internal-reflection series t * rho * t' / (1 - rho * r').
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_amplitude(ain, nair: float = 1.0003, nw: float = 1.33):
    """Amplitude coefficients rs, ts, rp, tp and refracted angle aout."""
    aout = jnp.arcsin(jnp.clip(jnp.sin(ain) * nair / nw, -1.0, 1.0))
    ci, co = jnp.cos(ain), jnp.cos(aout)
    rs = (nair * ci - nw * co) / (nair * ci + nw * co)
    ts = 2 * nair * ci / (nair * ci + nw * co)
    rp = (nw * ci - nair * co) / (nw * ci + nair * co)
    tp = 2 * nair * ci / (nw * ci + nair * co)
    return rs, ts, rp, tp, aout


def fresnel_power(ain, nair: float = 1.0003, nw: float = 1.33):
    """Power coefficients Rs, Ts, Rp, Tp and refracted angle."""
    rs, ts, rp, tp, aout = fresnel_amplitude(ain, nair, nw)
    power_frac = jnp.cos(ain) * nair / nw / jnp.cos(aout)
    return rs**2, ts**2 / power_frac, rp**2, tp**2 / power_frac, aout


def bathymetric_scattering(
    ain,
    depth: float = 0.002,
    nair: float = 1.0003,
    nw: float = 1.33,
    beta: float = 0.001,
):
    """Water-column absorption factor for a thin bathymetric layer.

    Reference `tools/wet_ground/phy_equations.py:111-126`
    (`baryometric_sattering`): two-way Beer-Lambert absorption along the
    refracted path through a water layer of the given depth, weighted by the
    cos^2 incidence falloff.
    """
    aout = jnp.arcsin(jnp.clip(jnp.sin(ain) * nair / nw, -1.0, 1.0))
    return jnp.exp(-2.0 * beta * depth / jnp.cos(aout)) * jnp.cos(ain) ** 2


def lidar_measurement(
    distances, height: float = 1.55, i_out: float = 1.0, rho: float = 0.12,
    natm: float = 1.0, c: float = 1.0,
):
    """Flat-earth received-intensity model (phy_equations.py:250-268):
    I_rec = I_out * cos(arctan(d / h)) * rho * natm * C."""
    angles = jnp.arctan(jnp.asarray(distances) / height)
    return i_out * jnp.cos(angles) * rho * natm * c


def total_transmittance_from_ground(
    ain, nair: float = 1.0003, nw: float = 1.33, rho=0.9
):
    """Round-trip power transmittance off wet ground (both polarizations).

    air -> water (transmit) -> ground reflect (rho) -> water -> air, summing
    the geometric series of internal water-air reflections.
    Returns Rs, Ts, Rp, Tp, refracted angle.
    """
    ras, tas, rap, tap, aaout = fresnel_power(ain, nair=nair, nw=nw)
    rws, tws, rwp, twp, _ = fresnel_power(aaout, nair=nw, nw=nair)
    ts = tas * rho * tws / (1 - rho * rws)
    tp = tap * rho * twp / (1 - rho * rwp)
    return ras, ts, rap, tp, aaout
