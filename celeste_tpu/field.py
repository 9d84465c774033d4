"""Field-scale catalog pipeline: full survey frames -> posterior catalogs.

The stamp pipeline (celeste_tpu.pipeline) holds every candidate's fit on
the WHOLE image and samples the full scene jointly — right for cutouts,
quadratic waste for frames: a 1489x2048 SDSS frame with hundreds of
sources would render every source over 3M pixels and sample one enormous
joint vector.  This module is the production path the reference ran as
per-stamp scripts (SURVEY.md C17/§3.2 — its experiments cut stamps around
photoObj entries by hand; here the framework does the cutting, grouping
and scaling itself):

  1. detect  — bulk matched-filter peaks + BATCHED cutout star MAPs, a few
               CLEAN rounds (subtract all fits, re-detect on the residual).
               Cost O(N_src * CUT^2) per round, independent of frame area.
  2. group   — union-find on detections: sources closer than
               ``link_radius_px`` must be sampled jointly (their Poisson
               likelihoods share pixels); distant sources factorize.
  3. classify— the stamp pipeline's Jacobi conditional sweeps (star vs
               galaxy vs absent Laplace evidence + merge + prune), on
               per-candidate cutouts with leave-one-out effective skies;
               one vmapped device call per sweep for ALL candidates.
               Ambiguous candidates get the exact Carlin-Chib type sampler
               (inference/type_switch), same as the stamp pipeline.
  4. sample  — the TPU-native core: EVERY fit group sampled in ONE device
               program.  Groups are padded to a rectangular
               [G, S_max, GAL_D] state with traced star/alive flags
               (kernels.mog_field.mixed_field_planes), each group owns a
               disjoint pixel set (nearest-candidate ownership — no pixel
               is double-counted across groups), neighbor groups' MAP
               lambdas fold into the effective sky, and a whitened
               ChEES-HMC run (per-group dense metric, per-group adapted
               (eps, T) as traced data) executes as
               vmap over groups x chains.  Wall time scales with the
               LARGEST group, not the number of groups.
  5. catalog — per-source posterior summaries in physical units, global
               arcsec offsets (no cutout-frame bookkeeping: positions are
               offsets from the scene reference everywhere).

Approximation (documented, tested): the joint posterior factorizes across
fit groups EXACTLY only when no pixel receives flux from two groups.
Groups are linked at ``link_radius_px`` (default = the tile-map support
radius), so cross-group leakage is below the same truncation threshold the
tiled kernels already accept (SURVEY.md §5.7); the residual coupling is
carried by the neighbor-MAP effective sky, not dropped.
``tests/test_field.py`` gates the group-factorized posterior against the
full-field joint dense posterior.

Pixel coordinates stay GLOBAL throughout: a cutout is just a gathered
subset of the frame's pixel grid, so the frame's one WCS affine serves
every stage (no per-cutout Stamp objects, no wcs_p0 shifting).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.inference.chees import (
    ChEESAdaptState,
    ChEESInfo,
    ChEESState,
    chees_warmup,
    chees_warmup_finish,
    chees_warmup_init,
    chees_warmup_window,
    run_chees_ensemble,
)
from celeste_tpu.inference.diagnostics import summarize
from celeste_tpu.inference.map_fit import detect_peaks, map_fit
from celeste_tpu.inference.model_select import laplace_evidence
from celeste_tpu.inference.whiten import ensemble_covariance, whiten_logdensity
from celeste_tpu.kernels.mog_field import (
    _field_planes,
    _loglik_jnp,
    mixed_field_planes,
)
from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.model.priors import SourcePriors
from celeste_tpu.model.stamp import Stamp
from celeste_tpu.mog import eval_grid
from celeste_tpu.pipeline import CatalogEntry
from celeste_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from celeste_tpu.utils.metrics import MetricsLogger

STAR_D = lambda b: 2 + b      # noqa: E731 — mirrors parallel.crowded
GAL_D = lambda b: 6 + b       # noqa: E731


@dataclass
class FieldConfig:
    """Knobs for the field pipeline.  Defaults sized for SDSS-like frames
    (0.396''/px, ~1.4'' PSF FWHM)."""

    # -- detection ---------------------------------------------------------
    cut: int = 24                      # candidate cutout side (px)
    detect_band_index: int = 0         # which frame drives peak finding
    detection_snr_min: float = 5.0
    detection_min_separation: int = 5
    detection_rounds: int = 3          # CLEAN rounds (detect-fit-subtract)
    max_per_round: int = 64            # matched-filter peaks per round
    max_candidates: int = 256
    # -- grouping ----------------------------------------------------------
    link_radius_px: float = 12.0       # sources closer than this share a group
    group_margin_px: int = 12          # group cutout margin around the bbox
    group_cut: int = 48                # minimum group cutout side (px)
    # -- classification (same semantics as pipeline.PipelineConfig) --------
    classify: bool = True
    # max sweeps; the loop stops early once kinds/alive are stable.  The
    # serialized pruning retires at most one duplicate per neighborhood per
    # sweep, so the bound is the worst blend multiplicity, not 2.
    classify_sweeps: int = 5
    prune_min_evidence: float = 5.0
    # two candidates whose FITTED centers land within this of each other are
    # one source: under Jacobi conditional refits a duplicate pair settles
    # into a stable 50/50 flux split where BOTH keep large leave-one-out
    # evidence (measured on the smoke field: CLEAN-ripple re-detections of a
    # bright star each held half its flux forever) — evidence-gain pruning
    # cannot kill that fixed point, position proximity can.  Default ~= the
    # PSF FWHM: closer pairs are unresolvable point sources anyway.
    dedup_radius_arcsec: float = 1.2
    galaxy_margin_nats: float = 10.0
    galaxy_sigma_min_arcsec: float = 0.4
    merge_sigma_factor: float = 1.5
    type_switch: bool = True
    type_switch_chains: int = 8
    type_switch_steps: int = 300
    map_steps: int = 200
    # -- group sampling ----------------------------------------------------
    sample: bool = True                # False -> MAP-only catalog (fast scan)
    n_chains: int = 32
    probe_warmup: int = 80             # raw-space ChEES warmup iters
    probe_steps: int = 48              # raw-space probe draws (pool the metric)
    n_warmup: int = 100                # whitened-space ChEES warmup iters
    n_steps: int = 300
    max_leapfrog: int = 64
    init_step_size: float = 0.02
    init_jitter: float = 0.01
    # -- segmented execution -------------------------------------------------
    # Steps per device call for the group-sampling stage (None = one
    # monolithic jit).  The axon tunnel kills device calls in the 60-120 s
    # band (DESIGN.md §3); a survey-scale field's monolithic sampling call
    # crosses that long before the science does.  Segments run the exact
    # key/Halton streams of the monolithic program (pre-split key slices +
    # start_iter offsets, bitwise at the kernel level — tests/test_chees.py);
    # whole-pipeline equality is gated at posterior level because XLA
    # program-boundary fusion differs in the last ulp (tests/test_field.py).
    sample_segment: Optional[int] = None
    warmup_window: Optional[int] = None  # warmup iters per call (default: seg)
    # Checkpoint file for the segmented sampling stage (requires
    # sample_segment).  Saved atomically at every window/segment boundary;
    # re-running the pipeline with the same path resumes the sampling
    # exactly where it stopped (detection/classification recompute — they
    # are deterministic and cheap next to survey-scale sampling).  The
    # resumed run is bitwise the uninterrupted segmented run.
    checkpoint_path: Optional[str] = None
    seed: int = 0


# ---------------------------------------------------------------------------
# cutout gathering (host; pixel coordinates stay global)
# ---------------------------------------------------------------------------

def _cut_origin(cx, cy, cut, h, w):
    """Integer cutout origin, clipped so the window stays inside the frame."""
    ox = int(np.clip(round(cx - cut / 2), 0, max(w - cut, 0)))
    oy = int(np.clip(round(cy - cut / 2), 0, max(h - cut, 0)))
    return ox, oy


def _gather_cutouts(origins, cut, counts, sky, mask):
    """origins [N, 2] int (ox, oy) -> per-candidate [N, cut*cut] pixel data
    (px, py, counts, sky, mask) with px/py in GLOBAL frame coordinates."""
    origins = np.asarray(origins, np.int64).reshape(-1, 2)
    n = origins.shape[0]
    dx = np.arange(cut)
    xs = origins[:, 0][:, None, None] + dx[None, None, :]      # [N, 1, cut]
    ys = origins[:, 1][:, None, None] + dx[None, :, None]      # [N, cut, 1]
    px = np.broadcast_to(xs, (n, cut, cut)).reshape(n, -1).astype(np.float32)
    py = np.broadcast_to(ys, (n, cut, cut)).reshape(n, -1).astype(np.float32)
    iy = np.broadcast_to(ys, (n, cut, cut))
    ix = np.broadcast_to(xs, (n, cut, cut))
    cts = counts[iy, ix].reshape(n, -1).astype(np.float32)
    sk = sky[iy, ix].reshape(n, -1).astype(np.float32)
    mk = mask[iy, ix].reshape(n, -1).astype(np.float32)
    return (jnp.asarray(px), jnp.asarray(py), jnp.asarray(cts),
            jnp.asarray(sk), jnp.asarray(mk))


# ---------------------------------------------------------------------------
# fit groups
# ---------------------------------------------------------------------------

def union_groups(positions_px, link_radius_px: float):
    """Connected components of the overlap graph: i ~ j when their pixel
    positions are within ``link_radius_px``.  Returns int labels [N]
    (0..n_groups-1, ordered by first member).  Host NumPy union-find over
    a GRID HASH: candidates bucket into cells of side ``link_radius_px``,
    so only same-cell + forward-neighbor-cell pairs are distance-tested —
    near-linear in N for survey frames (the all-pairs double loop was the
    one quadratic stage of the field pipeline, VERDICT r3 Weak #7) and
    identical labels by construction (every pair within the radius shares
    a cell or adjacent cells; the extra pairs tested just fail the radius
    check)."""
    pos = np.asarray(positions_px, np.float64).reshape(-1, 2)
    n = pos.shape[0]
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    r = float(link_radius_px)
    r2 = r * r
    cell = max(r, 1e-9)      # r<=0 still links coincident points
    keys = np.floor(pos / cell).astype(np.int64)
    buckets: dict = {}
    for i, kxy in enumerate(map(tuple, keys)):
        buckets.setdefault(kxy, []).append(i)
    # forward half-neighborhood covers each cell pair exactly once;
    # (0, 0) restricts to j > i within the cell
    offsets = ((0, 0), (1, 0), (0, 1), (1, 1), (1, -1))
    for (kx, ky), members in buckets.items():
        for dx, dy in offsets:
            other = members if dx == 0 and dy == 0 else buckets.get(
                (kx + dx, ky + dy))
            if not other:
                continue
            for i in members:
                pi = pos[i]
                for j in other:
                    if (dx or dy or j > i) and (
                            (pi[0] - pos[j][0]) ** 2
                            + (pi[1] - pos[j][1]) ** 2 <= r2):
                        ri, rj = find(i), find(j)
                        if ri != rj:
                            parent[max(ri, rj)] = min(ri, rj)
    roots = [find(i) for i in range(n)]
    order: dict = {}
    return np.asarray([order.setdefault(r_, len(order)) for r_ in roots],
                      np.int32)


# ---------------------------------------------------------------------------
# traced-flag rectangular prior (both branches evaluated under jnp.where)
# ---------------------------------------------------------------------------

def _mixed_rect_logprior(rect, flags, alive, priors: SourcePriors,
                         n_bands: int):
    """Prior + log|det J| for a rectangular [S, GAL_D] state where the
    star/galaxy kind is a TRACED flag per row (the group sampler's kind
    pattern is data, not Python structure — same reason as
    ``mixed_field_planes``).  Dead rows (alive=0, group padding) get a
    standard-normal anchor on every slot so the joint stays proper.

    Both branches are computed for every row; the galaxy branch clamps the
    shape slots exactly like ``mixed_field_planes`` so a star row's
    free-floating padding cannot overflow exp() and poison the other
    branch's gradients through 0 * inf."""
    sd, gd = STAR_D(n_bands), GAL_D(n_bands)
    head = rect[..., :sd]
    p_s = StarParams.from_vector(head, n_bands)
    lp_star = (priors.star_logpdf(p_s)
               + StarParams.log_det_jacobian(head, n_bands)
               - 0.5 * jnp.sum(rect[..., sd:gd] ** 2, axis=-1))
    v_gal = jnp.concatenate([head, jnp.clip(rect[..., sd:gd], -12.0, 12.0)],
                            axis=-1)
    p_g = GalaxyParams.from_vector(v_gal, n_bands)
    lp_gal = (priors.galaxy_logpdf(p_g)
              + GalaxyParams.log_det_jacobian(v_gal, n_bands))
    lp_row = jnp.where(flags, lp_star, lp_gal)
    anchor = -0.5 * jnp.sum(rect * rect, axis=-1)
    return jnp.sum(jnp.where(alive, lp_row, anchor), axis=-1)


# ---------------------------------------------------------------------------
# sampling-stage checkpoint (SURVEY.md §5.4 at field scale)
# ---------------------------------------------------------------------------

def _fp_equal(a: dict, b: dict) -> bool:
    """Fingerprint-dict equality with float tolerance (values round-trip
    through JSON; 1e-6 relative covers repr noise, not real changes)."""
    if set(a) != set(b):
        return False
    for k, va in a.items():
        vb = b[k]
        if isinstance(va, float) or isinstance(vb, float):
            if abs(float(va) - float(vb)) > 1e-6 * max(1.0, abs(float(vb))):
                return False
        elif va != vb:
            return False
    return True


class _SegCkpt:
    """Phase-aware checkpoint for the segmented group sampler: ONE file,
    overwritten atomically at every window/segment boundary, holding the
    phase name, the intra-phase offset, and the phase carry (a plain
    pytree — utils/checkpoint.py validates treedef + leaf shapes/dtypes on
    load, and a fingerprint of the initial chain states rejects a stale
    file from a different field/seed).  Each phase's carry contains
    everything later phases need, so a resume skips completed phases
    entirely and replays none of the device work.  ``path=None`` makes
    every method a no-op (the non-checkpointed segmented path)."""

    ORDER = ("raw_warmup", "probe", "z_warmup", "run")

    def __init__(self, path: Optional[str], fingerprint: dict):
        # fingerprint: JSON dict of everything that shapes the sampling
        # STREAM — initial chain states AND the stream-affecting config
        # knobs + prior hyperparams (a shape-preserving knob change like
        # max_leapfrog would otherwise resume silently into a mixed-config
        # run and void the bitwise-resume guarantee)
        self.path, self.fp = path, dict(fingerprint)
        self.phase: Optional[str] = None
        self.off = 0
        if path and os.path.exists(path):
            data = np.load(path, allow_pickle=False)
            meta = json.loads(str(data["__meta__"]))
            ex = meta.get("extra", {})
            fp = ex.get("fp")
            # a file missing the fingerprint or phase was written by a
            # DIFFERENT producer (e.g. a plain save_checkpoint caller
            # sharing the path) — treat it as foreign, same as a mismatch
            if (not isinstance(fp, dict) or "phase" not in ex
                    or not _fp_equal(fp, self.fp)):
                raise ValueError(
                    f"field checkpoint {path} belongs to a different run "
                    f"(fingerprint {fp!r} != {self.fp!r}): same path, "
                    "different frame/seed/config/priors — delete it or "
                    "point cfg.checkpoint_path elsewhere")
            self.phase, self.off = ex["phase"], int(meta["step"])

    def past(self, phase: str) -> bool:
        return (self.phase is not None
                and self.ORDER.index(self.phase) > self.ORDER.index(phase))

    def at(self, phase: str) -> bool:
        return self.phase == phase

    def load(self, like):
        state, step, _ = load_checkpoint(self.path, like)
        return state, int(step)

    def save(self, phase: str, carry, off: int) -> None:
        if not self.path:
            return
        save_checkpoint(self.path, carry, step=off,
                        extra={"phase": phase, "fp": self.fp})
        self.phase, self.off = phase, off


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------

def run_field_pipeline(stamp, band=0, n_bands: Optional[int] = None,
                       cfg: FieldConfig = FieldConfig(),
                       priors: Optional[SourcePriors] = None,
                       logger: Optional[MetricsLogger] = None,
                       mesh=None):
    """Frame pixels -> posterior catalog at field scale.

    ``stamp``: one frame ``Stamp`` or a list of per-band frames (each with
    its own WCS/PSF/calibration — frames need not be pixel-registered);
    ``band``: the flux slot per frame (int, or a list matching ``stamp``);
    ``n_bands`` defaults to the number of frames.  With several frames the
    likelihood is the joint product over bands at every stage (detection
    MAPs, classification evidences, group sampling), peaks are found on
    ``cfg.detect_band_index``'s frame, and grouping/pixel-ownership
    geometry lives in that frame's pixel grid (each frame's cutouts follow
    its own WCS).

    ``mesh``: optional 1-D :class:`jax.sharding.Mesh` — fit groups are data
    parallel (disjoint pixels, no cross-group collectives), so the group
    batch shards over its first axis and the sampling stage scales linearly
    with chips.  The group count is padded to a mesh multiple with dead
    groups (mask 0, alive 0 — their likelihood is exactly 0 and their state
    samples the standard-normal anchor); real groups keep the exact same
    per-group keys/x0 as the single-chip path, so results are unchanged.

    Returns ``(catalog, artifacts)``: a list of
    :class:`celeste_tpu.pipeline.CatalogEntry` (``extras['group']`` carries
    the fit-group id) and artifacts with per-group samples/diagnostics.
    """
    # 0 would select the segmented path and then die deep inside on a
    # zero range step; negatives would mis-slice silently (ADVICE r3) —
    # fail before any detection work
    if cfg.sample_segment is not None and cfg.sample_segment < 1:
        raise ValueError(
            f"cfg.sample_segment must be >= 1 (got {cfg.sample_segment}); "
            "use None for the monolithic jit")
    if cfg.warmup_window is not None and cfg.warmup_window < 1:
        raise ValueError(
            f"cfg.warmup_window must be >= 1 (got {cfg.warmup_window}); "
            "use None to default to sample_segment")
    priors = priors or SourcePriors()
    logger = logger or MetricsLogger()
    key = jax.random.key(cfg.seed)
    frames = list(stamp) if isinstance(stamp, (list, tuple)) else [stamp]
    bands = (list(band) if isinstance(band, (list, tuple))
             else [band] * len(frames))
    n_bands = (n_bands if n_bands is not None
               else max(len(frames), max(bands) + 1))
    nf = len(frames)
    di = cfg.detect_band_index
    counts_l = [np.asarray(st.counts, np.float64) for st in frames]
    sky_l = [np.asarray(st.sky, np.float64) for st in frames]
    mask_l = [np.asarray(st.mask, np.float64) for st in frames]
    hw_l = [c.shape for c in counts_l]
    cut = int(min([cfg.cut] + [min(s) for s in hw_l]))
    ds, gd = STAR_D(n_bands), GAL_D(n_bands)
    a_l = [np.asarray(st.wcs_A, np.float64) for st in frames]
    a_inv_l = [np.linalg.inv(a) for a in a_l]
    p0_l = [np.asarray(st.wcs_p0, np.float64) for st in frames]
    psf_peak = float(eval_grid(frames[di].psf, jnp.zeros(()), jnp.zeros(())))
    iota = float(np.asarray(frames[di].iota))
    gal_shape_init = np.array([0.0, 0.0, 0.0, 0.5], np.float32)

    def _frame_origins(du_list):
        """Candidate arcsec offsets -> per-frame integer cutout origins
        [nf][N, 2] (each frame's own WCS; windows clipped inside)."""
        outs = []
        for f in range(nf):
            h_f, w_f = hw_l[f]
            pos = np.asarray([p0_l[f] + a_l[f] @ np.asarray(du, np.float64)
                              for du in du_list])
            outs.append(np.asarray([_cut_origin(cx, cy, cut, h_f, w_f)
                                    for cx, cy in pos]))
        return outs

    def _gather_all(origins_l, cut_, data_l):
        """Per-frame cutout gathers -> [N, nf, P] stacked jnp arrays
        (px, py, counts, sky, mask); vmap batch axis leads."""
        per_f = [_gather_cutouts(origins_l[f], cut_, *data_l[f])
                 for f in range(nf)]
        return tuple(jnp.stack([per_f[f][k] for f in range(nf)], axis=1)
                     for k in range(5))

    # ---- jitted batch programs (compiled once per run) --------------------

    def _lam_cut(planes, px, py):
        """Per-component planes [C] -> sky-free lambda on cutout pixels."""
        amp, mx, my, pa, pb, pc = planes
        dx = px[None, :] - mx[:, None]
        dy = py[None, :] - my[:, None]
        quad = (pa[:, None] * dx * dx + 2.0 * pb[:, None] * dx * dy
                + pc[:, None] * dy * dy)
        return jnp.sum(amp[:, None] * jnp.exp(-0.5 * quad), axis=0)

    def _ll_all_frames(x, kind, pxi, pyi, c, eff, m):
        """Joint Poisson log-likelihood of one candidate over every frame
        (static unroll over nf; pxi/... are [nf, P])."""
        ll = 0.0
        for f in range(nf):
            planes = _field_planes(x, frames[f], bands[f], kind, n_bands)
            ll += _loglik_jnp(*(p[None] for p in planes), pxi[f][None],
                              pyi[f][None], c[f][None], eff[f][None],
                              m[f][None])[0]
        return ll

    @jax.jit
    def det_fit_batch(x0s, px, py, cts, sk, mk):
        """Batched detection-stage star MAPs on residual-count cutouts.
        Returns (x_maps [N, ds], sky-free fit lambdas [N, nf, cut*cut])."""
        def one(x0, pxi, pyi, c, s, m):
            def logd(x):
                ll = _ll_all_frames(x, "star", pxi, pyi, c, s, m)
                p = StarParams.from_vector(x, n_bands)
                return (ll + priors.star_logpdf(p)
                        + StarParams.log_det_jacobian(x, n_bands))
            xm, _ = map_fit(logd, x0, n_steps=cfg.map_steps)
            lam = jnp.stack([
                _lam_cut(_field_planes(xm, frames[f], bands[f], "star",
                                       n_bands), pxi[f], pyi[f])
                for f in range(nf)])
            return xm, lam
        return jax.vmap(one)(x0s, px, py, cts, sk, mk)

    def _cond_logd(kind):
        """Conditional log density of one candidate on its cutouts, with the
        effective sky (sky + everyone else's lambda) as traced data."""
        def logd(x, pxi, pyi, c, eff, m):
            ll = _ll_all_frames(x, kind, pxi, pyi, c, eff, m)
            if kind == "star":
                p = StarParams.from_vector(x, n_bands)
                return (ll + priors.star_logpdf(p)
                        + StarParams.log_det_jacobian(x, n_bands))
            p = GalaxyParams.from_vector(x, n_bands)
            return (ll + priors.galaxy_logpdf(p)
                    + GalaxyParams.log_det_jacobian(x, n_bands))
        return logd

    _logd_s, _logd_g = _cond_logd("star"), _cond_logd("galaxy")

    @jax.jit
    def classify_batch(rects, px, py, cts, eff, mk):
        """One Jacobi sweep: per-candidate star fit/evidence, galaxy
        fit/evidence, source-free evidence, and the CURRENT-state lambda
        (for the next sweep's effective skies)."""
        def per_cand(rect, pxi, pyi, c, e, m):
            xs, _ = map_fit(lambda x: _logd_s(x, pxi, pyi, c, e, m),
                            rect[:ds], n_steps=cfg.map_steps)
            lz_s = laplace_evidence(
                lambda x: _logd_s(x, pxi, pyi, c, e, m), xs)
            if cfg.classify:
                xg, _ = map_fit(lambda x: _logd_g(x, pxi, pyi, c, e, m),
                                rect, n_steps=cfg.map_steps)
                lz_g = laplace_evidence(
                    lambda x: _logd_g(x, pxi, pyi, c, e, m), xg)
            else:
                xg, lz_g = jnp.zeros(gd, rect.dtype), -jnp.inf
            lz_0 = jnp.sum((c * jnp.log(e) - e) * m)
            return xs, lz_s, xg, lz_g, lz_0
        return jax.vmap(per_cand)(rects, px, py, cts, eff, mk)

    @jax.jit
    def cand_lams(rects, flags, px, py):
        """Per-candidate sky-free lambdas on their cutouts from the current
        rect states (traced kinds); returns [N, nf, P]."""
        def one(rect, flag, pxi, pyi):
            return jnp.stack([
                _lam_cut(mixed_field_planes(rect, frames[f], bands[f],
                                            n_bands, flag), pxi[f], pyi[f])
                for f in range(nf)])
        return jax.vmap(one)(rects, flags, px, py)

    # ---- 1. detect: bulk matched filter + batched MAPs, CLEAN rounds ------
    work_l = [c.copy() for c in counts_l]
    det = frames[di]
    cand_pos: list = []          # detect-frame pixel (x, y)
    cand_x: list = []            # star MAP vectors [ds]
    snr_log: list = []
    for rnd in range(cfg.detection_rounds):
        det_stamp = Stamp(jnp.asarray(work_l[di], jnp.float32), det.sky,
                          det.iota, det.mask, det.psf, det.wcs_A,
                          det.wcs_p0, det.band)
        peaks, snrs = detect_peaks(det_stamp, n_peaks=cfg.max_per_round,
                                   min_separation=cfg.detection_min_separation)
        sel = []
        for (pxk, pyk), s in zip(peaks, snrs):
            if s < cfg.detection_snr_min:
                break
            if any(np.hypot(pxk - q[0], pyk - q[1])
                   < cfg.detection_min_separation for q in cand_pos):
                continue        # residual ripple of an already-fit source
            # same-round peaks must not share cutout pixels: two fits of
            # the SAME flux would each absorb it and the batch subtraction
            # would remove it twice (measured: a 5-source smoke field went
            # strongly negative under 30 simultaneous wing fits).  Coupled
            # peaks simply wait for the next CLEAN round, after the
            # brighter one's fit is subtracted.
            if any(np.hypot(pxk - t[0], pyk - t[1]) < cut for t in sel):
                continue
            if len(cand_pos) + len(sel) >= cfg.max_candidates:
                break
            sel.append((pxk, pyk, s))
        if not sel:
            break
        du_sel, x0s = [], []
        for px_, py_, _ in sel:
            du0 = a_inv_l[di] @ (np.array([px_, py_]) - p0_l[di])
            du_sel.append(du0)
            peak = max(float(work_l[di][int(py_), int(px_)]
                             - sky_l[di][int(py_), int(px_)]), 1.0)
            x0s.append(np.concatenate(
                [du0, np.full(n_bands, np.log(peak / (iota * psf_peak)))]))
        origins_l = _frame_origins(du_sel)
        pd_cut = _gather_all(origins_l, cut,
                             [(work_l[f], sky_l[f], mask_l[f])
                              for f in range(nf)])
        x_maps, lams = jax.tree_util.tree_map(np.asarray, det_fit_batch(
            jnp.asarray(np.stack(x0s), jnp.float32), *pd_cut))
        for k in range(len(sel)):
            for f in range(nf):
                ox, oy = origins_l[f][k]
                work_l[f][oy:oy + cut, ox:ox + cut] -= (
                    lams[k, f].reshape(cut, cut))
            cand_pos.append((sel[k][0], sel[k][1]))
            cand_x.append(x_maps[k])
            snr_log.append(sel[k][2])
        logger.log("detect_round", round=rnd, found=len(sel),
                   total=len(cand_pos))
    n_cand = len(cand_pos)
    logger.log("detect", n_candidates=n_cand,
               snrs=np.round(snr_log, 1).tolist())
    if n_cand == 0:
        return [], {"n_sources": 0, "n_groups": 0}

    # cutout origins tied to the FITTED positions (stable across sweeps)
    origins_l = _frame_origins([np.asarray(x[:2], np.float64)
                                for x in cand_x])
    pd_cut = _gather_all(origins_l, cut,
                         [(counts_l[f], sky_l[f], mask_l[f])
                          for f in range(nf)])
    cpx, cpy = pd_cut[0], pd_cut[1]

    # ---- 2+3. classify: Jacobi sweeps with leave-one-out effective skies --
    cand = [{"kind": "star", "x": np.asarray(x, np.float32), "p": 1.0,
             "alive": True} for x in cand_x]

    def _rect_of(c):
        r = np.zeros(gd, np.float32)
        if c["kind"] == "star":
            r[:ds] = c["x"][:ds]
            r[ds:] = gal_shape_init
        else:
            r[:] = c["x"]
        return r

    def _scatter_total(lams_np, alive_np):
        """Scatter alive candidates' cutout lambdas ([N, nf, P]) into one
        canvas per frame."""
        canvas_l = [np.zeros(hw_l[f], np.float64) for f in range(nf)]
        for f in range(nf):
            for i, (ox, oy) in enumerate(origins_l[f]):
                if alive_np[i]:
                    canvas_l[f][oy:oy + cut, ox:ox + cut] += (
                        lams_np[i, f].reshape(cut, cut))
        return canvas_l

    def _gather_eff(canvas_l, lams_np):
        """Per-candidate effective sky on its cutouts: sky + total - own,
        per frame -> [N, nf, P]."""
        eff = np.empty((n_cand, nf, cut * cut), np.float32)
        for f in range(nf):
            for i, (ox, oy) in enumerate(origins_l[f]):
                tot = canvas_l[f][oy:oy + cut, ox:ox + cut].reshape(-1)
                eff[i, f] = np.maximum(
                    sky_l[f][oy:oy + cut, ox:ox + cut].reshape(-1)
                    + tot - lams_np[i, f], 1e-6)
        return jnp.asarray(eff)

    lz_s_b = lz_g_b = None
    lams_np = np.zeros((n_cand, nf, cut * cut), np.float64)
    state_prev = None
    for sweep in range(cfg.classify_sweeps):
        rects = jnp.asarray(np.stack([_rect_of(c) for c in cand]))
        flags = jnp.asarray([c["kind"] == "star" for c in cand])
        alive_np = np.asarray([c["alive"] for c in cand])
        lams_np = np.asarray(cand_lams(rects, flags, cpx, cpy), np.float64)
        lams_np[~alive_np] = 0.0
        eff = _gather_eff(_scatter_total(lams_np, alive_np), lams_np)
        xs_b, lz_s_b, xg_b, lz_g_b, lz_0_b = jax.tree_util.tree_map(
            np.asarray,
            classify_batch(rects, cpx, cpy, pd_cut[2], eff, pd_cut[4]))
        # pruning is neighborhood-SERIALIZED: under Jacobi sweeps two
        # candidates splitting one source's flux each look redundant given
        # the other and a naive threshold prunes BOTH (mutual explaining-
        # away — observed killing real sources on the smoke field).  Per
        # sweep, prune the weakest candidate of each cutout-sized
        # neighborhood only; its neighbors get re-judged next sweep against
        # the updated scene.
        below = []
        for i, ci in enumerate(cand):
            if not ci["alive"]:
                continue
            lz_s, lz_g = float(lz_s_b[i]), float(lz_g_b[i])
            if not cfg.classify:
                lz_g = -np.inf
            gain = max(lz_s, lz_g) - float(lz_0_b[i])
            if gain < cfg.prune_min_evidence:
                below.append((gain, i))
        cut_arcsec = cut * float(np.abs(a_inv_l[di]).max())  # cutout side, ''
        pruned_now: list = []
        for _, i in sorted(below):
            xi = cand[i]["x"]
            if any(np.hypot(xi[0] - cand[j]["x"][0],
                            xi[1] - cand[j]["x"][1]) < cut_arcsec
                   for j in pruned_now):
                continue
            cand[i]["alive"] = False
            pruned_now.append(i)
        for i, ci in enumerate(cand):
            if not ci["alive"]:
                continue
            lz_s, lz_g = float(lz_s_b[i]), float(lz_g_b[i])
            if not cfg.classify:
                lz_g = -np.inf
            ci["p"] = float(jax.nn.sigmoid(lz_s - lz_g)) if cfg.classify else 1.0
            sigma_fit = (float(np.exp(xg_b[i][3 + n_bands]))
                         if cfg.classify else 0.0)
            if (cfg.classify and lz_g > lz_s + cfg.galaxy_margin_nats
                    and sigma_fit > cfg.galaxy_sigma_min_arcsec):
                ci["kind"], ci["x"] = "galaxy", np.asarray(xg_b[i])
            else:
                ci["kind"], ci["x"] = "star", np.asarray(xs_b[i])
        # positional dedup (all kinds): refits move CLEAN-ripple duplicates
        # onto the source they re-detected; keep the higher-evidence one
        gains = {i: max(float(lz_s_b[i]),
                        float(lz_g_b[i]) if cfg.classify else -np.inf)
                 - float(lz_0_b[i]) for i in range(n_cand)}
        alive_now = [i for i, c in enumerate(cand) if c["alive"]]
        for a_ix, i in enumerate(alive_now):
            if not cand[i]["alive"]:
                continue
            for j in alive_now[a_ix + 1:]:
                if not cand[j]["alive"]:
                    continue
                d = float(np.hypot(cand[i]["x"][0] - cand[j]["x"][0],
                                   cand[i]["x"][1] - cand[j]["x"][1]))
                if d < cfg.dedup_radius_arcsec:
                    loser = i if gains[i] < gains[j] else j
                    cand[loser]["alive"] = False
        # merge: a fitted galaxy owns its interior (same rule as the stamp
        # pipeline — halo fragments are not sources)
        for g in sorted((c for c in cand if c["alive"] and c["kind"] == "galaxy"),
                        key=lambda c: -float(np.exp(c["x"][2]))):
            if not g["alive"]:
                continue
            sig_g = float(np.exp(g["x"][3 + n_bands]))
            r_merge = cfg.merge_sigma_factor * np.clip(sig_g, 0.5, 4.0)
            flux_g = float(np.exp(g["x"][2]))
            for c in cand:
                if c is g or not c["alive"]:
                    continue
                dist = float(np.hypot(c["x"][0] - g["x"][0],
                                      c["x"][1] - g["x"][1]))
                if dist < r_merge and float(np.exp(c["x"][2])) < flux_g:
                    c["alive"] = False
        logger.log("classify_sweep", sweep=sweep,
                   kinds=[c["kind"] for c in cand if c["alive"]],
                   pruned=sum(not c["alive"] for c in cand),
                   du=[np.round(c["x"][:2], 2).tolist()
                       for c in cand if c["alive"]],
                   gain=[round(gains[i], 1) for i, c in enumerate(cand)
                         if c["alive"]],
                   lz_sg=[[round(float(lz_s_b[i]), 1),
                           round(float(lz_g_b[i]), 1)]
                          for i, c in enumerate(cand) if c["alive"]])
        state_now = [(c["kind"], c["alive"]) for c in cand]
        if sweep > 0 and state_now == state_prev:
            break
        state_prev = state_now

    # exact Carlin-Chib decision for the ambiguous band (same contract as
    # pipeline.run_pipeline's stage 2b; SURVEY.md C11)
    if cfg.classify and cfg.type_switch and cfg.classify_sweeps > 0:
        from celeste_tpu.inference.type_switch import sample_source_type_core

        amb = [i for i, c in enumerate(cand)
               if c["alive"] and abs(float(lz_g_b[i]) - float(lz_s_b[i]))
               < cfg.galaxy_margin_nats]
        if amb:
            rects = jnp.asarray(np.stack([_rect_of(c) for c in cand]))
            flags = jnp.asarray([c["kind"] == "star" for c in cand])
            alive_np = np.asarray([c["alive"] for c in cand])
            lams_np = np.asarray(cand_lams(rects, flags, cpx, cpy), np.float64)
            lams_np[~alive_np] = 0.0
            eff = _gather_eff(_scatter_total(lams_np, alive_np), lams_np)

            @jax.jit
            def type_switch_batch(keys, rects_a, px_a, py_a, cts_a, eff_a, mk_a):
                def per_cand(k, rect, pxi, pyi, c, e, m):
                    ls = lambda x: _logd_s(x, pxi, pyi, c, e, m)   # noqa: E731
                    lg = lambda x: _logd_g(x, pxi, pyi, c, e, m)   # noqa: E731
                    out = sample_source_type_core(
                        k, ls, lg, rect[:ds], rect,
                        n_chains=cfg.type_switch_chains,
                        n_steps=cfg.type_switch_steps,
                        n_map_steps=cfg.map_steps)
                    return (out["p_star"], out["x_star_mean"],
                            out["x_gal_mean"])
                return jax.vmap(per_cand)(keys, rects_a, px_a, py_a, cts_a,
                                          eff_a, mk_a)

            idx = jnp.asarray(amb)
            keys_a = jax.random.split(jax.random.fold_in(key, 77), len(amb))
            p_b, xs_m, xg_m = jax.tree_util.tree_map(np.asarray, type_switch_batch(
                keys_a, rects[idx], cpx[idx], cpy[idx], pd_cut[2][idx],
                eff[idx], pd_cut[4][idx]))
            for j, i in enumerate(amb):
                ps = float(p_b[j])
                ci = cand[i]
                ci["p"] = ps
                sigma_mean = float(np.exp(xg_m[j][3 + n_bands]))
                if ps < 0.5 and sigma_mean > cfg.galaxy_sigma_min_arcsec:
                    ci["kind"], ci["x"] = "galaxy", np.asarray(xg_m[j])
                else:
                    ci["kind"], ci["x"] = "star", np.asarray(xs_m[j])
            logger.log("type_switch", candidates=amb,
                       p_star=np.round(p_b, 3).tolist())

    alive_idx = [i for i, c in enumerate(cand) if c["alive"]]
    if not alive_idx:
        return [], {"n_sources": 0, "n_groups": 0}

    # ---- 4. group + sample: every group in ONE device program -------------
    # grouping/ownership geometry lives in the detect frame's pixel grid;
    # each frame also gets its own pixel positions for per-frame ownership
    alive_du = [np.asarray(cand[i]["x"][:2], np.float64) for i in alive_idx]
    alive_pos_l = [np.asarray([p0_l[f] + a_l[f] @ du for du in alive_du])
                   for f in range(nf)]
    alive_pos = alive_pos_l[di]
    labels = union_groups(alive_pos, cfg.link_radius_px)
    n_groups = int(labels.max()) + 1
    members = [[alive_idx[k] for k in np.nonzero(labels == g)[0]]
               for g in range(n_groups)]
    s_max = max(len(m) for m in members)
    logger.log("groups", n_groups=n_groups, s_max=s_max,
               sizes=[len(m) for m in members])

    if not cfg.sample:
        # MAP-only catalog: the detection/classification scan without the
        # posterior stage (fast survey sweeps; stds are zero by construction)
        catalog: List[CatalogEntry] = []
        for g, mem in enumerate(members):
            for i in mem:
                x, kind = cand[i]["x"], cand[i]["kind"]
                catalog.append(CatalogEntry(
                    kind=kind, p_star=cand[i]["p"],
                    du_mean=np.asarray(x[:2]), du_std=np.zeros(2),
                    flux_mean=np.exp(x[2:2 + n_bands]),
                    flux_std=np.zeros(n_bands),
                    extras={"group": g}))
        return catalog, {"n_sources": len(catalog), "n_groups": n_groups,
                         "groups": members, "s_max": s_max}

    # group cutout side: cover every group's bbox + margin (static per run)
    need = cfg.group_cut
    for mem in members:
        pts = alive_pos[[alive_idx.index(i) for i in mem]]
        ext = float(max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1])))
        need = max(need, int(np.ceil(ext)) + 2 * cfg.group_margin_px)
    gcut = int(min([-(-need // 8) * 8] + [min(s) for s in hw_l]))

    # final per-candidate lambdas for neighbor-group effective skies
    rects_f = jnp.asarray(np.stack([_rect_of(c) for c in cand]))
    flags_f = jnp.asarray([c["kind"] == "star" for c in cand])
    alive_f = np.asarray([c["alive"] for c in cand])
    lams_f = np.asarray(cand_lams(rects_f, flags_f, cpx, cpy), np.float64)
    lams_f[~alive_f] = 0.0
    canvas_l = _scatter_total(lams_f, alive_f)

    group_du = []
    for mem in members:
        dus = np.stack([alive_du[alive_idx.index(i)] for i in mem])
        group_du.append(dus.mean(axis=0))
    g_orig_l = []
    for f in range(nf):
        h_f, w_f = hw_l[f]
        pos = [p0_l[f] + a_l[f] @ du for du in group_du]
        g_orig_l.append(np.asarray([_cut_origin(cx, cy, gcut, h_f, w_f)
                                    for cx, cy in pos]))
    per_f = [[np.array(a) for a in _gather_cutouts(
        g_orig_l[f], gcut, counts_l[f], sky_l[f], mask_l[f])]
        for f in range(nf)]
    # [G, nf, Pg] stacks (px, py, counts, sky, mask)
    g_px, g_py, g_cts, g_sky, g_mk = [
        np.stack([per_f[f][k] for f in range(nf)], axis=1) for k in range(5)]

    # pixel ownership: each frame pixel belongs to the group of its nearest
    # alive candidate (in THAT frame's pixel grid) — group likelihoods never
    # double-count a pixel in any band
    own_lab = labels  # per alive candidate
    g_eff = np.empty_like(g_sky)
    for f in range(nf):
        ap = alive_pos_l[f]
        for g in range(n_groups):
            ox, oy = g_orig_l[f][g]
            pxg, pyg = g_px[g, f], g_py[g, f]
            d2 = ((pxg[None, :] - ap[:, 0][:, None]) ** 2
                  + (pyg[None, :] - ap[:, 1][:, None]) ** 2)
            owner = own_lab[np.argmin(d2, axis=0)]
            g_mk[g, f] = g_mk[g, f] * (owner == g)
            # neighbor groups' MAP lambdas -> effective sky on this cutout
            tot = canvas_l[f][oy:oy + gcut, ox:ox + gcut].reshape(-1)
            own = np.zeros(gcut * gcut, np.float64)
            for i in members[g]:
                ox_i, oy_i = origins_l[f][i]
                x0, y0 = max(ox_i, ox), max(oy_i, oy)
                x1 = min(ox_i + cut, ox + gcut)
                y1 = min(oy_i + cut, oy + gcut)
                if x1 <= x0 or y1 <= y0:
                    continue
                patch = lams_f[i, f].reshape(cut, cut)[
                    y0 - oy_i:y1 - oy_i, x0 - ox_i:x1 - ox_i]
                blk = own.reshape(gcut, gcut)
                blk[y0 - oy:y1 - oy, x0 - ox:x1 - ox] += patch
            g_eff[g, f] = np.maximum(
                g_sky[g, f] + np.maximum(tot - own, 0.0), 1e-6)

    # rectangular group states [G, S_max, GAL_D] + traced flags/alive
    rect_g = np.zeros((n_groups, s_max, gd), np.float32)
    flg_g = np.zeros((n_groups, s_max), bool)
    alv_g = np.zeros((n_groups, s_max), bool)
    for g, mem in enumerate(members):
        for k, i in enumerate(mem):
            rect_g[g, k] = _rect_of(cand[i])
            flg_g[g, k] = cand[i]["kind"] == "star"
            alv_g[g, k] = True

    d_g = s_max * gd

    def group_logd(x, flg, alv, pxg, pyg, ctsg, effg, mkg):
        rect = x.reshape(s_max, gd)
        ll = 0.0
        for f in range(nf):
            planes = jax.vmap(
                lambda v, fl: mixed_field_planes(v, frames[f], bands[f],
                                                 n_bands, fl)
            )(rect, flg)
            amp = planes[0] * alv[:, None]
            flat = tuple(p.reshape(1, -1) for p in (amp,) + planes[1:])
            ll += _loglik_jnp(*flat, pxg[f][None], pyg[f][None],
                              ctsg[f][None], effg[f][None], mkg[f][None],
                              centered=True)[0]
        return ll + _mixed_rect_logprior(rect, flg, alv, priors, n_bands)

    @jax.jit
    def sample_groups(keys, x0b, flg, alv, pxg, pyg, ctsg, effg, mkg):
        """vmap over groups: raw-space ChEES probe -> per-group dense metric
        -> whitened ChEES run.  (eps, T) stay traced per group — nothing
        here touches the host."""
        def one(kg, x0, fl, al, px_, py_, ct, ef, mk):
            logd = lambda x: group_logd(x, fl, al, px_, py_, ct, ef, mk)  # noqa: E731
            k1, k2, k3, k4 = jax.random.split(kg, 4)
            st, eps, traj = chees_warmup(
                k1, logd, x0, n_warmup=cfg.probe_warmup,
                init_step_size=cfg.init_step_size,
                max_leapfrog=cfg.max_leapfrog)
            probe, st, _ = run_chees_ensemble(
                k2, logd, st, n_steps=cfg.probe_steps, step_size=eps,
                trajectory_length=traj, max_leapfrog=cfg.max_leapfrog)
            m_hat, cov_hat = ensemble_covariance(probe[:, ::2], ridge=1e-4)
            logd_z, to_x, to_z = whiten_logdensity(logd, m_hat, cov_hat)
            st2, eps2, traj2 = chees_warmup(
                k3, logd_z, to_z(st.xs), n_warmup=cfg.n_warmup,
                init_step_size=0.3, max_leapfrog=cfg.max_leapfrog)
            samples_z, _, infos = run_chees_ensemble(
                k4, logd_z, st2, n_steps=cfg.n_steps, step_size=eps2,
                trajectory_length=traj2, max_leapfrog=cfg.max_leapfrog)
            return to_x(samples_z), infos
        return jax.vmap(one)(keys, x0b, flg, alv, pxg, pyg, ctsg, effg, mkg)

    def sample_groups_segmented(keys, x0b, flg, alv, pxg, pyg, ctsg, effg,
                                mkg):
        """``sample_groups`` as host-looped bounded device calls: the same
        probe -> whiten -> warmup -> run program, each warmup window /
        sampling segment its own jitted call of ``cfg.warmup_window`` /
        ``cfg.sample_segment`` steps.  Pre-split key slices and Halton
        ``start_iter`` offsets reproduce the monolithic jit's key/jitter
        streams exactly (bitwise at the kernel level —
        tests/test_chees.py::test_run_chees_presplit_keys_compose); the
        whole-pipeline composition is gated at posterior level instead,
        because each stage is its own XLA program and program-boundary
        fusion differs in the last ulp, which chaotic trajectories
        amplify (measured on the two-group frame: a group's real columns
        stay bitwise equal until whitening couples them to a dead-padding
        dim — tests/test_field.py documents it).  Segmenting buys
        axon-kill-edge robustness and per-segment progress events; stage
        carries are ordinary pytrees, so a checkpoint between any two
        calls resumes that execution exactly (SURVEY.md §5.4 pattern)."""
        seg = int(cfg.sample_segment)
        wwin = int(cfg.warmup_window or seg)
        dat = (flg, alv, pxg, pyg, ctsg, effg, mkg)

        def _logd(fl, al, px_, py_, ct, ef, mk):
            return lambda x: group_logd(x, fl, al, px_, py_, ct, ef, mk)

        # the EXACT key tree of the monolithic path: split(kg, 4) per group,
        # then each stage key pre-split to its total step count so window
        # slices reproduce the in-jit split(key, n) streams
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
        wk1 = jax.vmap(lambda k: jax.random.split(k, cfg.probe_warmup))(
            ks[:, 0])
        pk2 = jax.vmap(lambda k: jax.random.split(k, cfg.probe_steps))(
            ks[:, 1])
        wk3 = jax.vmap(lambda k: jax.random.split(k, cfg.n_warmup))(ks[:, 2])
        rk4 = jax.vmap(lambda k: jax.random.split(k, cfg.n_steps))(ks[:, 3])

        @jax.jit
        def init_raw(x0, *d):
            return jax.vmap(lambda x, *dd: chees_warmup_init(
                x, _logd(*dd), init_step_size=cfg.init_step_size))(x0, *d)

        @jax.jit
        def raw_window(kseg, carry, *d):
            return jax.vmap(lambda kw, c, *dd: chees_warmup_window(
                kw, _logd(*dd), c, n_iters=kw.shape[0],
                init_step_size=cfg.init_step_size,
                max_leapfrog=cfg.max_leapfrog))(kseg, carry, *d)

        @jax.jit
        def run_raw(kseg, st_, eps, traj, i0, *d):
            def one(kw, s, e, t, *dd):
                return run_chees_ensemble(
                    kw, _logd(*dd), s, n_steps=kw.shape[0], step_size=e,
                    trajectory_length=t, max_leapfrog=cfg.max_leapfrog,
                    start_iter=i0)
            return jax.vmap(one)(kseg, st_, eps, traj, *d)

        @jax.jit
        def whiten_init(probe, st_xs, *d):
            def one(p, xs, *dd):
                m, c = ensemble_covariance(p[:, ::2], ridge=1e-4)
                lz, _, tz = whiten_logdensity(_logd(*dd), m, c)
                return m, c, chees_warmup_init(tz(xs), lz,
                                               init_step_size=0.3)
            return jax.vmap(one)(probe, st_xs, *d)

        @jax.jit
        def z_window(kseg, carry, m, c, *d):
            def one(kw, cr, mi, ci, *dd):
                lz, _, _ = whiten_logdensity(_logd(*dd), mi, ci)
                return chees_warmup_window(kw, lz, cr, n_iters=kw.shape[0],
                                           init_step_size=0.3,
                                           max_leapfrog=cfg.max_leapfrog)
            return jax.vmap(one)(kseg, carry, m, c, *d)

        @jax.jit
        def run_z(kseg, st_, eps, traj, i0, m, c, *d):
            def one(kw, s, e, t, mi, ci, *dd):
                lz, tx, _ = whiten_logdensity(_logd(*dd), mi, ci)
                sz, s2, info = run_chees_ensemble(
                    kw, lz, s, n_steps=kw.shape[0], step_size=e,
                    trajectory_length=t, max_leapfrog=cfg.max_leapfrog,
                    start_iter=i0)
                return tx(sz), s2, info
            return jax.vmap(one)(kseg, st_, eps, traj, m, c, *d)

        # fixed-structure zero templates: the checkpoint loader validates
        # treedef + leaf shapes/dtypes against these, so a stale file from
        # a different field/config fails loudly instead of resuming wrong
        gb, nb, dg_ = x0b.shape
        f32 = np.float32

        def z_state():
            return ChEESState(xs=np.zeros((gb, nb, dg_), f32),
                              logps=np.zeros((gb, nb), f32),
                              grads=np.zeros((gb, nb, dg_), f32))

        def z_adapt():
            return ChEESAdaptState(*(np.zeros((gb,), f32) for _ in range(8)))

        def z_scal():
            return np.zeros((gb,), f32)

        def z_info(n):
            return ChEESInfo(accept_rate=np.zeros((gb, n), f32),
                             n_leapfrog=np.zeros((gb, n), np.int32),
                             trajectory_length=np.zeros((gb, n), f32),
                             step_size=np.zeros((gb, n), f32),
                             divergence_rate=np.zeros((gb, n), f32))

        z_m = lambda: np.zeros((gb, dg_), f32)              # noqa: E731
        z_c = lambda: np.zeros((gb, dg_, dg_), f32)         # noqa: E731
        ck = _SegCkpt(cfg.checkpoint_path, fingerprint={
            # initial chain states (frame + seed + grouping) ...
            "x0_sum": float(np.sum(np.asarray(x0b))),
            # ... plus every stream-affecting knob: a shape-preserving
            # config change must fail the gate, not resume into a
            # mixed-config run (ADVICE r3)
            "probe_warmup": int(cfg.probe_warmup),
            "probe_steps": int(cfg.probe_steps),
            "n_warmup": int(cfg.n_warmup),
            "n_steps": int(cfg.n_steps),
            "max_leapfrog": int(cfg.max_leapfrog),
            "init_step_size": float(cfg.init_step_size),
            # prior hyperparams enter the logdensity (dataclass repr is
            # deterministic and covers every field)
            "priors": repr(priors),
        })

        # ---- phase 1: raw-space warmup windows --------------------------
        pcarry = None
        if not ck.past("raw_warmup"):
            if ck.at("raw_warmup"):
                carry, off0 = ck.load((z_state(), z_adapt()))
            else:
                carry, off0 = init_raw(x0b, *dat), 0
            for off in range(off0, cfg.probe_warmup, wwin):
                carry = raw_window(wk1[:, off:off + wwin], carry, *dat)
                jax.block_until_ready(carry)
                ck.save("raw_warmup", carry, off + wwin)
            st1, eps1, traj1 = jax.jit(jax.vmap(chees_warmup_finish))(carry)
            pcarry = (st1, eps1, traj1,
                      np.zeros((gb, nb, cfg.probe_steps, dg_), f32))
            ck.save("probe", pcarry, 0)

        # ---- phase 2: raw-space probe segments (pool the dense metric) --
        zc = None
        if not ck.past("probe"):
            if pcarry is None:
                pcarry, poff = ck.load(
                    (z_state(), z_scal(), z_scal(),
                     np.zeros((gb, nb, cfg.probe_steps, dg_), f32)))
            else:
                poff = 0
            st, eps1, traj1, probe_buf = pcarry
            for off in range(poff, cfg.probe_steps, seg):
                p, st, _ = run_raw(pk2[:, off:off + seg], st, eps1, traj1,
                                   jnp.int32(off), *dat)
                jax.block_until_ready(st)
                probe_buf[:, :, off:off + p.shape[2]] = np.asarray(p)
                ck.save("probe", (st, eps1, traj1, probe_buf),
                        off + p.shape[2])
            m_h, c_h, zcarry = whiten_init(jnp.asarray(probe_buf), st.xs,
                                           *dat)
            zc = (m_h, c_h, zcarry)
            ck.save("z_warmup", zc, 0)

        # ---- phase 3: whitened-space warmup windows ---------------------
        rcarry = None
        if not ck.past("z_warmup"):
            if zc is None:
                zc, zoff = ck.load((z_m(), z_c(), (z_state(), z_adapt())))
            else:
                zoff = 0
            m_h, c_h, zcarry = zc
            for off in range(zoff, cfg.n_warmup, wwin):
                zcarry = z_window(wk3[:, off:off + wwin], zcarry, m_h, c_h,
                                  *dat)
                jax.block_until_ready(zcarry)
                ck.save("z_warmup", (m_h, c_h, zcarry), off + wwin)
            st2, eps2, traj2 = jax.jit(jax.vmap(chees_warmup_finish))(zcarry)
            rcarry = (st2, eps2, traj2, m_h, c_h,
                      np.zeros((gb, nb, cfg.n_steps, dg_), f32),
                      z_info(cfg.n_steps))
            ck.save("run", rcarry, 0)

        # ---- phase 4: frozen-(eps,T) sampling segments ------------------
        if rcarry is None:
            rcarry, roff = ck.load(
                (z_state(), z_scal(), z_scal(), z_m(), z_c(),
                 np.zeros((gb, nb, cfg.n_steps, dg_), f32),
                 z_info(cfg.n_steps)))
        else:
            roff = 0
        stz, eps2, traj2, m_h, c_h, samples_buf, info_buf = rcarry
        for off in range(roff, cfg.n_steps, seg):
            sx, stz, info = run_z(rk4[:, off:off + seg], stz, eps2, traj2,
                                  jnp.int32(off), m_h, c_h, *dat)
            jax.block_until_ready(stz)
            w = sx.shape[2]
            samples_buf[:, :, off:off + w] = np.asarray(sx)
            for buf, seg_leaf in zip(info_buf, info):
                buf[:, off:off + w] = np.asarray(seg_leaf)
            ck.save("run", (stz, eps2, traj2, m_h, c_h, samples_buf,
                            info_buf), off + w)
            logger.log("field_sample_segment",
                       done=min(off + seg, cfg.n_steps), total=cfg.n_steps)
        return jnp.asarray(samples_buf), info_buf

    k_s, k_i = jax.random.split(jax.random.fold_in(key, 5))
    x0b = (jnp.asarray(rect_g.reshape(n_groups, 1, d_g))
           + cfg.init_jitter * jax.random.normal(
               k_i, (n_groups, cfg.n_chains, d_g), jnp.float32))
    keys_g = jax.random.split(k_s, n_groups)
    batch = [keys_g, x0b, jnp.asarray(flg_g), jnp.asarray(alv_g),
             jnp.asarray(g_px), jnp.asarray(g_py), jnp.asarray(g_cts),
             jnp.asarray(g_eff), jnp.asarray(g_mk)]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        n_dev = int(mesh.devices.size)
        g_pad = (-n_groups) % n_dev
        if g_pad:
            # dead padding groups: mask 0 (likelihood exactly 0), alive 0
            # (standard-normal anchor prior), eff 1 (log stays finite even
            # though masked), keys/x0 derived OUTSIDE the real groups' key
            # stream so real-group results are bitwise those of mesh=None
            pad_keys = jax.vmap(lambda i: jax.random.fold_in(k_s, i))(
                jnp.arange(1 << 20, (1 << 20) + g_pad))
            pads = [pad_keys,
                    jnp.zeros((g_pad,) + x0b.shape[1:], x0b.dtype),
                    jnp.zeros((g_pad, s_max), bool),
                    jnp.zeros((g_pad, s_max), bool),
                    jnp.tile(batch[4][:1], (g_pad, 1, 1)),
                    jnp.tile(batch[5][:1], (g_pad, 1, 1)),
                    jnp.zeros((g_pad, nf, gcut * gcut), jnp.float32),
                    jnp.ones((g_pad, nf, gcut * gcut), jnp.float32),
                    jnp.zeros((g_pad, nf, gcut * gcut), jnp.float32)]
            batch = [jnp.concatenate([b, p], axis=0)
                     for b, p in zip(batch, pads)]
        shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        batch = [jax.device_put(b, shard) for b in batch]
        logger.log("shard_groups", n_devices=n_dev, n_groups=n_groups,
                   padded_to=n_groups + g_pad)
    if cfg.checkpoint_path and cfg.sample_segment is None:
        raise ValueError("cfg.checkpoint_path requires cfg.sample_segment: "
                         "the monolithic jit has no boundary to save at")
    sampler = (sample_groups if cfg.sample_segment is None
               else sample_groups_segmented)
    samples, infos = sampler(*batch)
    samples = np.asarray(samples)[:n_groups]          # [G, B, T, D_g]
    infos = jax.tree_util.tree_map(lambda a: np.asarray(a)[:n_groups], infos)
    kept = samples[:, :, cfg.n_steps // 4:, :]

    # ---- 5. catalog --------------------------------------------------------
    catalog: List[CatalogEntry] = []
    diag = []
    for g, mem in enumerate(members):
        ks = kept[g]                                   # [B, T, D_g]
        cols = []
        for k_m, i in enumerate(mem):
            d = ds if cand[i]["kind"] == "star" else gd
            cols.extend(range(k_m * gd, k_m * gd + d))
        summ = summarize(jnp.asarray(ks[..., cols]))
        diag.append({"group": g,
                     "rhat_max": float(jnp.max(summ["rhat"])),
                     "ess_min": float(jnp.min(summ["ess"])),
                     "divergence_rate": float(jnp.mean(
                         infos.divergence_rate[g])),
                     "accept_rate": float(jnp.mean(infos.accept_rate[g]))})
        flat = ks.reshape(-1, d_g)
        for k_m, i in enumerate(mem):
            blk = flat[:, k_m * gd:(k_m + 1) * gd]
            kind = cand[i]["kind"]
            du = blk[:, :2]
            flux = np.exp(blk[:, 2:2 + n_bands])
            extras = {"group": g}
            if kind == "galaxy":
                sigma = np.exp(blk[:, 3 + n_bands])
                extras.update({
                    "theta_dev_mean": float(
                        (1 / (1 + np.exp(-blk[:, 2 + n_bands]))).mean()),
                    "sigma_mean": float(sigma.mean()),
                    "sigma_std": float(sigma.std()),
                    "ab_mean": float(
                        (1 / (1 + np.exp(-blk[:, 4 + n_bands]))).mean()),
                    "phi_mean": float(blk[:, 5 + n_bands].mean()),
                })
            catalog.append(CatalogEntry(
                kind=kind, p_star=cand[i]["p"],
                du_mean=du.mean(0), du_std=du.std(0),
                flux_mean=flux.mean(0), flux_std=flux.std(0),
                extras=extras))
    logger.log("sample", n_groups=n_groups,
               rhat_max=max(d["rhat_max"] for d in diag),
               ess_min=min(d["ess_min"] for d in diag),
               divergence_max=max(d["divergence_rate"] for d in diag))
    artifacts = {"n_sources": len(catalog), "n_groups": n_groups,
                 "groups": members, "samples": samples, "group_cut": gcut,
                 "diagnostics": diag, "s_max": s_max}
    return catalog, artifacts
