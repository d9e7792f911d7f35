"""Runtime Gumbel-parameter fitting for arbitrary scoring systems.

The reference computes E-value parameters for non-default
(matrix, gap-open, gap-extend) combinations at runtime with the ALP
library's Monte-Carlo simulation (EvalueComputation.h:91-110 ->
lib/alp/sls_alignment_evaluer.cpp:989 initGapped, seed 42, lambda
tolerance 1%, K tolerance 5%, 60 s budget).  ALP sizes its realization
counts from WALL-CLOCK measurements of its own first iterations
(sls_alp_sim.cpp:223,336,351,439), so its output is a function of
machine speed and load: the reference's E-values for these combinations
are not reproducible across hosts by design.  Byte parity with the
reference is therefore impossible on this path; the contract is ALP's
own tolerance band.

This module fits the same 12-parameter set with a DETERMINISTIC
Monte-Carlo simulation that runs on the accelerator: a fixed-seed batch
of random sequence pairs is aligned with the batched XLA
Smith-Waterman kernel (integer scores are backend-exact), alignment
extents are regressed against score for the finite-size-correction
parameters (a_*, b_*, alpha_*, beta_*, sigma, tau), and (lambda, K) are
fitted by lattice maximum likelihood of the observed score maxima under
the SAME ALP tail-area formula used downstream
(search/evalue.py::EvalueComputation.area), so the fit is
self-consistent with E-value evaluation.  Same seed -> bit-identical
parameters, on any backend.

Validated against the vendored ALP's values (seed 42) for VTML80 10/1,
blosum80 9/1, blosum62 8/2 and blosum45 13/2 (tools/alpfit, goldens in
tests/test_gumbel.py): lambda within ALP's 1% tolerance, K within its
5% band.
"""

import hashlib
import json
import math
import os

import numpy as np

from .evalue import EvalueComputation


def lambda_ungapped(scores, pback):
    """Exact ungapped lattice lambda: solve sum p_i p_j e^{lambda s_ij}=1
    over the real-letter alphabet (Karlin-Altschul; the reference's
    LambdaCalculation role). Deterministic Newton iteration."""
    a = scores.shape[0] - 1  # exclude X/N
    s = np.asarray(scores[:a, :a], np.float64)
    p = np.asarray(pback[:a], np.float64)
    p = p / p.sum()
    pp = p[:, None] * p[None, :]
    lam = 0.5
    for _ in range(200):
        e = np.exp(lam * s)
        f = float((pp * e).sum()) - 1.0
        df = float((pp * s * e).sum())
        step = f / df
        lam -= step
        if abs(step) < 1e-14:
            break
    return lam


def _sample_codes(rng, pback, n, length):
    """(n, length) int32 letters 0..a-2 iid from the background."""
    a = len(pback) - 1
    p = np.asarray(pback[:a], np.float64)
    cum = np.cumsum(p / p.sum())
    u = rng.random((n, length))
    return np.searchsorted(cum, u).astype(np.int32)


def _simulate(scores, pback, gap_open, gap_extend, seed, n_pairs, length,
              chunk):
    """Align n_pairs random pairs; returns (S, len_I, len_J) int arrays.
    Integer SW on any backend is bit-deterministic for a fixed seed."""
    from ..ops.sw_jax import sw_align_batch

    rng = np.random.default_rng(seed)
    S = np.zeros(n_pairs, np.int64)
    len_i = np.zeros(n_pairs, np.int64)
    len_j = np.zeros(n_pairs, np.int64)
    lens = np.full(chunk, length, np.int32)
    for s0 in range(0, n_pairs, chunk):
        b = min(chunk, n_pairs - s0)
        q = _sample_codes(rng, pback, chunk, length)
        t = _sample_codes(rng, pback, chunk, length)
        bias = np.zeros((chunk, length), np.int32)
        # ALP's model charges a length-L gap open + L*extend
        # (sls_alp_data.cpp:274 d_open1=open1_+epen1_; header comment at
        # sls_alignment_evaluer.cpp:351); our kernel's open covers the
        # first gapped position, so shift one extend into the open
        sc, qs, qe, ts, te = sw_align_batch(
            q, bias, lens, t, lens, submat=scores,
            go=int(gap_open) + int(gap_extend), ge=int(gap_extend))
        S[s0:s0 + b] = sc[:b]
        len_j[s0:s0 + b] = (qe - qs + 1)[:b]   # J = sequence 1 (query)
        len_i[s0:s0 + b] = (te - ts + 1)[:b]   # I = sequence 2 (target)
    return S, len_i, len_j


def _ols(x, y):
    """(slope, intercept) float64 least squares."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xm, ym = x.mean(), y.mean()
    vx = ((x - xm) ** 2).sum()
    slope = (((x - xm) * (y - ym)).sum() / vx) if vx > 0 else 0.0
    return slope, ym - slope * xm


def fit_gapped(scores, pback, gap_open, gap_extend, seed=42,
               n_pairs=262144, length=384, chunk=4096):
    """Fit the 12 ALP parameters for an integer substitution matrix
    (alph x alph, last letter = X/N wildcard), background frequencies
    and affine gap costs (gap of length L costs open + (L-1)*extend —
    the ALP model, sls_alp.cpp:1147).  Deterministic in all inputs."""
    scores = np.asarray(scores, np.int64)
    S, len_i, len_j = _simulate(scores, pback, gap_open, gap_extend,
                                seed, n_pairs, length, chunk)

    # --- finite-size regressions (ALP's linear models: E[len|s], ---
    # --- Var[len|s], Cov[len_I,len_J|s] all linear in s) ---
    a_I, b_I = _ols(S, len_i)
    a_J, b_J = _ols(S, len_j)
    ri = len_i - (a_I * S + b_I)
    rj = len_j - (a_J * S + b_J)
    alpha_I, beta_I = _ols(S, ri * ri)
    alpha_J, beta_J = _ols(S, rj * rj)
    sigma, tau = _ols(S, ri * rj)
    # variances/covariance are nonnegative quantities; clamp the
    # intercepts so the thresholds in the area formula stay sane
    alpha_I = max(alpha_I, 0.0)
    alpha_J = max(alpha_J, 0.0)
    sigma = max(min(sigma, math.sqrt(alpha_I * alpha_J)
                    if alpha_I * alpha_J > 0 else sigma), 0.0)

    # --- (lambda, K) by lattice ML under the downstream area model ---
    lam_up = lambda_ungapped(scores, pback)

    uniq, counts = np.unique(S, return_counts=True)

    def nll(lam, k):
        p = dict(lam=lam, K=k, a_J=a_J, b_J=b_J, a_I=a_I, b_I=b_I,
                 alpha_J=alpha_J, beta_J=beta_J, alpha_I=alpha_I,
                 beta_I=beta_I, sigma=sigma, tau=tau)
        ev = EvalueComputation(float(length), params=p)
        # Lattice convention: K e^{-lam s} counts islands with score
        # >= s (the BLAST E-value convention ALP fits), so
        # P(S <= s) = P(no island >= s+1) = exp(-g(s+1)) and
        # P(S = s) = exp(-g(s+1)) - exp(-g(s))
        hi = np.asarray(uniq, np.float64) + 1.0
        lo = hi - 1.0
        g_hi = ev.area(hi, float(length)) * np.exp(-lam * hi) * k
        g_lo = ev.area(lo, float(length)) * np.exp(-lam * lo) * k
        pr = np.exp(-np.maximum(g_hi, 0.0)) - np.exp(-np.maximum(g_lo, 0.0))
        pr = np.maximum(pr, 1e-300)
        return -float((counts * np.log(pr)).sum())

    # profile optimization: golden-section on lambda, inner closed-form-
    # ish search on K (log-grid refine) — fully deterministic
    def best_k(lam):
        # moment start: K0 from Gumbel location of the sample
        k = math.exp(lam * float(np.median(S))) / (length * length)
        f = nll(lam, k)
        step = 2.0
        for _ in range(60):
            f_up, f_dn = nll(lam, k * step), nll(lam, k / step)
            if f_up < f:
                k, f = k * step, f_up
            elif f_dn < f:
                k, f = k / step, f_dn
            else:
                step = math.sqrt(step)
                if step < 1.0005:
                    break
        return k, f

    lo, hi = 0.35 * lam_up, 0.999 * lam_up
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    c = hi - gr * (hi - lo)
    d = lo + gr * (hi - lo)
    fc, fd = best_k(c)[1], best_k(d)[1]
    for _ in range(40):
        if fc < fd:
            hi, d, fd = d, c, fc
            c = hi - gr * (hi - lo)
            fc = best_k(c)[1]
        else:
            lo, c, fc = c, d, fd
            d = lo + gr * (hi - lo)
            fd = best_k(d)[1]
        if hi - lo < 1e-5:
            break
    lam = 0.5 * (lo + hi)
    k, _ = best_k(lam)

    return dict(lam=float(lam), K=float(k),
                a_J=float(a_J), b_J=float(b_J),
                a_I=float(a_I), b_I=float(b_I),
                alpha_J=float(alpha_J), beta_J=float(beta_J),
                alpha_I=float(alpha_I), beta_I=float(beta_I),
                sigma=float(sigma), tau=float(tau))


_FIT_CACHE_PATH = os.environ.get(
    "METAEUK_GUMBEL_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache",
                 "metaeuk_tpu_gumbel.json"))
_mem_cache = {}


def fitted_params(scores, pback, gap_open, gap_extend, **kw):
    """fit_gapped with an in-process + on-disk cache keyed by the exact
    scoring system (a fit costs seconds of device time)."""
    h = hashlib.blake2b(digest_size=12)
    h.update(np.ascontiguousarray(scores, np.int64).tobytes())
    h.update(np.ascontiguousarray(pback, np.float64).tobytes())
    key = f"{h.hexdigest()}_{int(gap_open)}_{int(gap_extend)}"
    if key in _mem_cache:
        return dict(_mem_cache[key])
    disk = {}
    try:
        with open(_FIT_CACHE_PATH) as f:
            disk = json.load(f)
    except (OSError, ValueError):
        pass
    if key in disk:
        _mem_cache[key] = disk[key]
        return dict(disk[key])
    p = fit_gapped(scores, pback, gap_open, gap_extend, **kw)
    _mem_cache[key] = p
    disk[key] = p
    try:
        os.makedirs(os.path.dirname(_FIT_CACHE_PATH), exist_ok=True)
        with open(_FIT_CACHE_PATH, "w") as f:
            json.dump(disk, f)
    except OSError:
        pass
    return p
