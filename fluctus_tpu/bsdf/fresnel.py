"""Dielectric Fresnel terms, vectorized port of src/fresnel.cl."""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_th_i, eta_i, eta_t):
    """Exact unpolarized dielectric Fresnel (fresnel.cl:5-32).

    Returns reflectance; 1.0 under total internal reflection.
    """
    f, _ = fresnel_dielectric_cos_t(cos_th_i, eta_i, eta_t)
    return f


def fresnel_dielectric_cos_t(cos_th_i, eta_i, eta_t):
    """Variant also returning cosThetaT (fresnel.cl:35-62)."""
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th_i * cos_th_i))
    sin_t = eta_i / eta_t * sin_i
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))

    etat_cosi = eta_t * cos_th_i
    etai_cost = eta_i * cos_t
    parl = (etat_cosi - etai_cost) / jnp.where(
        etat_cosi + etai_cost == 0.0, 1.0, etat_cosi + etai_cost)
    etai_cosi = eta_i * cos_th_i
    etat_cost = eta_t * cos_t
    perp = (etai_cosi - etat_cost) / jnp.where(
        etai_cosi + etat_cost == 0.0, 1.0, etai_cosi + etat_cost)

    f = 0.5 * (parl * parl + perp * perp)
    return jnp.where(sin_t >= 1.0, 1.0, f), cos_t


def schlick_dielectric(cos_th_i, eta_i, eta_t):
    """Schlick approximation (fresnel.cl:66-77)."""
    eta = eta_i / eta_t
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th_i * cos_th_i))
    r0 = ((1.0 - eta) ** 2) / ((1.0 + eta) ** 2)
    c = 1.0 - jnp.abs(cos_th_i)
    f = r0 + (1.0 - r0) * c ** 5
    return jnp.where(eta * sin_i >= 1.0, 1.0, f)
