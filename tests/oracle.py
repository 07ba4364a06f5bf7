"""Float64 CPU oracle: textbook GP + greedy selection, NumPy/SciPy only.

Every device path in algp_tpu is validated against this module
(SURVEY.md §4).  It is deliberately simple and slow — straightforward
closed forms, dense refactorization where the device path uses incremental
updates — so that agreement between the two is strong evidence of
correctness.  The acceptance contract (BASELINE.json:5) requires the device
path's *selected-sample index sequences* to match this oracle exactly and
posterior fields to match within tolerance.

Selection-fidelity contract (shared with the device path): greedy argmax
happens at **f32 score resolution** with lowest-index tie-breaking
(np.argmax / jnp.argmax both return the first maximum).  The oracle keeps
all internal state in f64 but rounds the per-round score field to f32
before the argmax: scores that a f32 device cannot distinguish (e.g.
exp(-r²) underflow for far-apart candidates) are genuine ties and must be
broken identically on both sides — otherwise "bitwise-consistent
selections" (BASELINE.json:5) would be unattainable for any f32 device.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

SQRT3 = np.sqrt(3.0)
SQRT5 = np.sqrt(5.0)


# ------------------------------ kernels ------------------------------------


def sqdist(x1, x2, ls):
    a = x1 / ls
    b = x2 / ls
    d = a[:, None, :] - b[None, :, :]
    return np.sum(d * d, axis=-1)


def stationary_form(kind, r2):
    if kind == "rbf":
        return np.exp(-0.5 * r2)
    r = np.sqrt(np.maximum(r2, 0.0))
    if kind == "matern32":
        return (1 + SQRT3 * r) * np.exp(-SQRT3 * r)
    if kind == "matern52":
        a = SQRT5 * r
        return (1 + a + a * a / 3.0) * np.exp(-a)
    raise ValueError(kind)


def gram(x1, x2, *, spatial_kind="rbf", feature_kind="rbf", ds=2,
         ls_spatial=1.0, ls_feature=1.0, outputscale=1.0):
    ls_s = np.broadcast_to(np.asarray(ls_spatial, np.float64), (ds,))
    K = stationary_form(spatial_kind, sqdist(x1[:, :ds], x2[:, :ds], ls_s))
    df = x1.shape[1] - ds
    if df > 0:
        ls_f = np.broadcast_to(np.asarray(ls_feature, np.float64), (df,))
        K = K * stationary_form(
            feature_kind, sqdist(x1[:, ds:], x2[:, ds:], ls_f)
        )
    return outputscale * K


# ------------------------------ exact GP -----------------------------------


def nll(K, y):
    """Negative log marginal likelihood, ½yᵀK⁻¹y + ½log|K| + (n/2)log2π."""
    n = len(y)
    L = np.linalg.cholesky(K)
    alpha = sla.cho_solve((L, True), y)
    return 0.5 * y @ alpha + np.sum(np.log(np.diag(L))) + 0.5 * n * np.log(2 * np.pi)


def posterior(K_train, K_cross, k_diag, y):
    """(mean, var) at test points.  K_train includes noise; k_diag doesn't."""
    L = np.linalg.cholesky(K_train)
    alpha = sla.cho_solve((L, True), y)
    mean = K_cross.T @ alpha
    V = sla.solve_triangular(L, K_cross, lower=True)
    var = k_diag - np.sum(V * V, axis=0)
    return mean, var


# ----------------------- greedy selection oracles --------------------------


def greedy_variance_selection(K, noise_var, rounds, pilot_idx=()):
    """Greedy max-posterior-variance (entropy) selection, dense f64.

    K: (N, N) prior covariance over all candidates (no noise on diag).
    noise_var: scalar or (N,) observation-noise variance used when
        conditioning on a selected point (heteroscedastic-aware).
    Selection conditions on *noisy* observations at selected points.
    Returns (selected_indices, final posterior variance diag).
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    C = K.astype(np.float64).copy()
    taken = np.zeros(N, bool)
    for j in pilot_idx:
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
    sel = []
    for _ in range(rounds):
        # measurement entropy: posterior variance of the *noisy* observation
        # (heteroscedastic-aware; matches the device path's convention)
        d = np.diag(C) + nv
        d[taken] = -np.inf
        j = int(np.argmax(d.astype(np.float32)))  # f32 score resolution
        sel.append(j)
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
    return np.array(sel), np.diag(C).copy()


def greedy_mi_selection(K, noise_var, rounds, pilot_idx=()):
    """Krause-style greedy mutual-information selection, dense f64.

    Score(y) = σ²(y | A) / σ²(y | V∖A∖y)   (ratio form, JMLR 2008),
    where A = pilot ∪ already-selected, both conditionings on noisy
    observations (noise variance added consistently, matching the device
    path).  The denominator uses the precision-matrix identity
    σ²(y | rest) = 1 / [(K_complement + Σ)⁻¹]_yy, and selected points are
    removed from the complement by Schur-complement downdates — the same
    algorithm as the device path but recomputed densely here for safety.
    Returns (selected_indices, scores_trace list of (N,) arrays).
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    C = K.astype(np.float64).copy()  # posterior cov given A (numerator)
    taken = np.zeros(N, bool)
    for j in pilot_idx:
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
    # complement precision over V \ A
    P = np.linalg.inv(K + np.diag(nv))
    for j in pilot_idx:
        P = _precision_delete(P, j)
    sel, traces = [], []
    for _ in range(rounds):
        num = np.diag(C) + nv  # variance of noisy measurement given A
        # 1/P_yy is Var(z_y | z_rest) for the noisy joint K+Σ — it already
        # includes y's own measurement noise, so nothing is added here.
        den = 1.0 / np.diag(P)
        score = num / den
        score[taken] = -np.inf
        traces.append(score.copy())
        j = int(np.argmax(score.astype(np.float32)))  # f32 score resolution
        sel.append(j)
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        P = _precision_delete(P, j)
        taken[j] = True
    return np.array(sel), traces


def follow_selection(K, noise_var, selections, pilot_idx=(), strategy="mi"):
    """Replay a device-chosen selection sequence through the f64 oracle.

    For each round, conditions on the device's choice and returns
    (score_of_choice, max_score) pairs.  Used where the field has exact
    symmetries (regular grids): mirror-image candidates have *identical*
    scores in exact arithmetic, so sequence equality is ill-posed and the
    fidelity criterion becomes per-round ε-optimality of the device's pick
    under the f64 oracle.
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    C = K.astype(np.float64).copy()
    taken = np.zeros(N, bool)
    P = np.linalg.inv(K + np.diag(nv)) if strategy == "mi" else None
    for j in pilot_idx:
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
        if P is not None:
            P = _precision_delete(P, j)
    out = []
    for j in selections:
        j = int(j)
        num = np.diag(C) + nv
        score = num / (1.0 / np.diag(P)) if strategy == "mi" else num
        score[taken] = -np.inf
        out.append((float(score[j]), float(score.max())))
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
        if P is not None:
            P = _precision_delete(P, j)
    return out


def _precision_delete(P, j):
    P = P - np.outer(P[:, j], P[j, :]) / P[j, j]
    P[j, :] = 0.0
    P[:, j] = 0.0
    P[j, j] = 1.0
    return P


def lowrank_precision(K, zidx, noise_var, z_jitter=1e-6):
    """FITC/Nyström prior precision over all candidates, dense f64.

    Mirrors algp_tpu.acquisition_lowrank.lowrank_precision_seed: inducing
    set = candidate subset `zidx`, Q = K[:,Z](K[Z,Z]+jI)⁻¹K[Z,:], diagonal
    corrected to Σ's exact diagonal (clamped ≥ 0), then P̃ = Σ̃⁻¹ dense.
    The jitter is relative to the outputscale (= diag K for stationary
    kernels), matching the device formula.
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    zidx = np.asarray(zidx, int)
    os_ = float(np.mean(np.diag(K)))
    Kzz = K[np.ix_(zidx, zidx)] + z_jitter * os_ * np.eye(len(zidx))
    Kxz = K[:, zidx]
    Q = Kxz @ np.linalg.solve(Kzz, Kxz.T)
    d = np.maximum(np.diag(K) - np.diag(Q), 0.0) + nv
    Sigma = Q + np.diag(d)  # diag = q + d = k + nv (Σ's diagonal is exact)
    return np.linalg.inv(Sigma)


def greedy_mi_selection_lowrank(K, zidx, noise_var, rounds, pilot_idx=()):
    """Greedy Krause-MI with a low-rank complement precision, dense f64.

    Same algorithm as greedy_mi_selection but the complement precision is
    seeded from the FITC factorization over inducing subset `zidx` — the
    oracle for algp_tpu.acquisition_lowrank.greedy_select_lowrank.  The
    numerator conditioning stays exact (as on device).
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    C = K.astype(np.float64).copy()
    taken = np.zeros(N, bool)
    P = lowrank_precision(K, zidx, noise_var)
    for j in pilot_idx:
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
        P = _precision_delete(P, j)
    sel, traces = [], []
    for _ in range(rounds):
        num = np.diag(C) + nv
        score = num * np.diag(P)
        score[taken] = -np.inf
        traces.append(score.copy())
        j = int(np.argmax(score.astype(np.float32)))  # f32 score resolution
        sel.append(j)
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        P = _precision_delete(P, j)
        taken[j] = True
    return np.array(sel), traces


def sgpr_reference(K, zidx, y, noise_var, z_jitter=1e-6):
    """Dense f64 SGPR (Titsias collapsed bound) reference: returns
    (neg_elbo, mean, var) with inducing set = candidate subset `zidx`,
    evaluated/predicted over all candidates.  Mirrors
    algp_tpu.models.sparse_gp (relative K_zz jitter included).
    """
    N = K.shape[0]
    lam = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    zidx = np.asarray(zidx, int)
    os_ = float(np.mean(np.diag(K)))
    Kzz = K[np.ix_(zidx, zidx)] + z_jitter * os_ * np.eye(len(zidx))
    Kxz = K[:, zidx]
    Q = Kxz @ np.linalg.solve(Kzz, Kxz.T)
    Sigma = Q + np.diag(lam)
    _, ld = np.linalg.slogdet(Sigma)
    nelbo = 0.5 * (
        N * np.log(2 * np.pi) + ld + y @ np.linalg.solve(Sigma, y)
    ) + 0.5 * np.sum(np.maximum(np.diag(K) - np.diag(Q), 0.0) / lam)
    Sm = Kzz + Kxz.T @ (Kxz / lam[:, None])
    mean = Kxz @ np.linalg.solve(Sm, Kxz.T @ (y / lam))
    var = (
        np.diag(K) - np.diag(Q)
        + np.einsum("ij,ji->i", Kxz, np.linalg.solve(Sm, Kxz.T))
    )
    return float(nelbo), mean, var


def greedy_mi_selection_lowrank_ensemble(
    K, zidx_list, noise_var, rounds, pilot_idx=()
):
    """z-ENSEMBLE greedy MI, dense f64: one low-rank complement precision
    per inducing design, per-candidate ratio scores AVERAGED across
    designs before every argmax (f32 score resolution, min-index
    tie-break) — the oracle for
    acquisition_lowrank.greedy_select_lowrank with a (K, M, d) z stack.
    The numerator conditioning is design-independent and shared.
    """
    N = K.shape[0]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), (N,))
    C = K.astype(np.float64).copy()
    taken = np.zeros(N, bool)
    Ps = [lowrank_precision(K, z, noise_var) for z in zidx_list]
    for j in pilot_idx:
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        taken[j] = True
        Ps = [_precision_delete(P, j) for P in Ps]
    sel = []
    for _ in range(rounds):
        num = np.diag(C) + nv
        score = num * np.mean([np.diag(P) for P in Ps], axis=0)
        score[taken] = -np.inf
        j = int(np.argmax(score.astype(np.float32)))
        sel.append(j)
        c = C[:, j] / np.sqrt(C[j, j] + nv[j])
        C -= np.outer(c, c)
        Ps = [_precision_delete(P, j) for P in Ps]
        taken[j] = True
    return np.array(sel)


# ----------------------- coregionalized (ICM) GP ---------------------------


def _icm_system(Kx, B, noise_var_t, mask=None, noise_scale=None, jitter=0.0):
    """Dense f64 sub-system over OBSERVED (plot, trait) cells only.

    Flattening is plot-major (entry m = i·T + t), matching
    models.coregional: kron(Kx, B)[m, m'] = Kx[i, j]·B[t, s].  Returns
    (C_sub, flat_mask).  Where the device path identity-pads masked
    entries, the oracle DROPS them — equality of the two likelihoods is
    exactly the identity-padding contract.
    """
    n = Kx.shape[0]
    T = B.shape[0]
    C = np.kron(np.asarray(Kx, np.float64), np.asarray(B, np.float64))
    ns = np.ones(n) if noise_scale is None else np.asarray(noise_scale, np.float64)
    nv = (ns[:, None] * np.asarray(noise_var_t, np.float64)[None, :]).reshape(-1)
    C = C + np.diag(nv + jitter)
    mf = (
        np.ones((n, T), bool) if mask is None else np.asarray(mask, bool)
    ).reshape(-1)
    return C[np.ix_(mf, mf)], mf


def icm_nll(Kx, B, Y, noise_var_t, mask=None, noise_scale=None, jitter=0.0):
    """Joint ICM negative log marginal likelihood over observed cells.

    Kx: (n, n) shared kernel Gram (no noise); B: (T, T) trait covariance;
    Y: (n, T); noise_var_t: (T,) per-trait noise variance; mask: (n, T)
    bool observation mask; noise_scale: (n,) per-plot variance multiplier.
    """
    C, mf = _icm_system(Kx, B, noise_var_t, mask, noise_scale, jitter)
    y = np.asarray(Y, np.float64).reshape(-1)[mf]
    return nll(C, y)


def icm_posterior(Kx, Kc, k_diag, B, Y, noise_var_t, mask=None,
                  noise_scale=None, jitter=0.0):
    """Per-trait posterior (means, vars) at test points, each (N, T).

    Kc: (n, N) cross-Gram train→test (no outputscale beyond what Kx/Kc
    carry); k_diag: (N,) prior diag of the shared kernel at test points.
    """
    n = Kx.shape[0]
    T = B.shape[0]
    C, mf = _icm_system(Kx, B, noise_var_t, mask, noise_scale, jitter)
    y = np.asarray(Y, np.float64).reshape(-1)[mf]
    L = np.linalg.cholesky(C)
    alpha = sla.cho_solve((L, True), y)
    N = Kc.shape[1]
    means = np.zeros((N, T))
    vars_ = np.zeros((N, T))
    Bf = np.asarray(B, np.float64)
    for t in range(T):
        # flattened cross-covariance rows (i, s) → trait t at test points
        cross = np.kron(np.asarray(Kc, np.float64), Bf[:, t : t + 1])[mf]
        means[:, t] = cross.T @ alpha
        V = sla.solve_triangular(L, cross, lower=True)
        vars_[:, t] = Bf[t, t] * np.asarray(k_diag, np.float64) - np.sum(
            V * V, axis=0
        )
    return means, vars_
