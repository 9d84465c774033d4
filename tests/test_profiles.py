"""Validate the generated exp/deV MoG profile tables against the analytic
profiles (SURVEY.md §4 item 2 — the constants are fitted, not transcribed,
so these tests are the provenance guarantee)."""

import numpy as np

from celeste_tpu.model._profile_tables import DEV_AMPS, DEV_VARS, EXP_AMPS, EXP_VARS

A_EXP = 1.6783469900166605


def mog_radial(r, amps, vars_):
    r2 = r[:, None] ** 2
    return np.sum(amps / (2 * np.pi * vars_) * np.exp(-0.5 * r2 / vars_), axis=1)


def mog_enclosed(r, amps, vars_):
    return np.sum(amps * (1 - np.exp(-(r**2) / (2 * vars_))))


def test_unit_flux():
    assert abs(EXP_AMPS.sum() - 1.0) < 1e-8
    assert abs(DEV_AMPS.sum() - 1.0) < 1e-8


def test_half_light_radius():
    for amps, vars_ in [(EXP_AMPS, EXP_VARS), (DEV_AMPS, DEV_VARS)]:
        assert abs(mog_enclosed(1.0, amps, vars_) - 0.5) < 1e-6


def test_exp_profile_accuracy():
    r = np.geomspace(0.05, 4.0, 200)
    target = A_EXP**2 / (2 * np.pi) * np.exp(-A_EXP * r)
    model = mog_radial(r, EXP_AMPS, EXP_VARS)
    assert np.max(np.abs(model - target) / target) < 0.03


def test_dev_profile_reasonable():
    """deV is fitted against the SDSS-style truncated profile; against the
    RAW r^{1/4} profile we only demand ballpark agreement over the body."""
    import math

    b = 7.669249443633085
    r = np.geomspace(0.1, 2.0, 100)
    target = b**8 / (8 * np.pi * math.factorial(7)) * np.exp(-b * r**0.25)
    model = mog_radial(r, DEV_AMPS, DEV_VARS)
    # truncation moves flux/normalization ~7%; allow 20% pointwise here
    assert np.max(np.abs(model - target) / target) < 0.20


def test_component_counts():
    assert len(EXP_AMPS) == 6 and len(DEV_AMPS) == 10
