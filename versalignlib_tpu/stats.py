"""Alignment score statistics: bit scores and E-values (Karlin-Altschul).

ADDITIVE — the reference reports raw DP scores only. Production database
search reports significance: under the Karlin-Altschul/Gumbel theory the
maximal local (Smith-Waterman) score S of two random sequences of lengths
m, n follows

    P(S >= x)  ~=  1 - exp(-K * m * n * exp(-lambda * x))

with lambda the unique positive root of ``sum_ij p_i q_j e^{lambda s_ij}
= 1`` (exact, computable by bisection for any substitution model with
negative expected score) and K a harder constant. Two regimes:

- **Ungapped scoring**: lambda comes from the theory (``karlin_lambda``);
  exact and parameter-only.
- **Gapped scoring** (the practical case): no closed form exists — BLAST
  ships simulation-derived tables. Here :func:`calibrate` does the same
  honestly per parameter set: it samples maximal scores of random pairs
  through the framework's own kernels and fits the Gumbel location with
  lambda estimated from the tail (method of moments), yielding a
  :class:`GumbelCalibration` that converts raw scores to bit scores and
  E-values. Calibrations are tiny, serializable, and reusable across runs
  (cache one per scoring model, like BLAST's tables).

E-value of a hit with raw score x against a database of total length D
with query length m:  ``E = K * m * D * exp(-lambda * x)``; the bit score
``S' = (lambda * x - ln K) / ln 2`` makes ``E = m * D * 2^{-S'}``.
"""

from __future__ import annotations

import dataclasses
import json
import math

import numpy as np

from versalignlib_tpu.params import AlignmentParameters

#: Euler-Mascheroni constant (Gumbel mean = mode + gamma / lambda).
EULER_GAMMA = 0.5772156649015329

#: Background DNA composition: uniform A/C/G/T (codes 1..4).
DNA_UNIFORM = (0.25, 0.25, 0.25, 0.25)


def _score_table(params: AlignmentParameters) -> np.ndarray:
    """Dense substitution table over the valid (nonzero-scoring) codes."""
    if params.matrix is not None:
        M = np.asarray(params.matrix, dtype=np.float64)
        return M[1:, 1:]  # code 0 is padding by contract
    # Reference 6x6 model: match/mismatch over A/C/G/T (codes 1..4).
    M = np.full((4, 4), float(params.score_mismatch))
    np.fill_diagonal(M, float(params.score_match))
    return M


def karlin_lambda(
    params: AlignmentParameters,
    freqs: tuple[float, ...] | None = None,
    tol: float = 1e-12,
) -> float:
    """The ungapped Karlin-Altschul lambda for this substitution model.

    Solves ``sum_ij p_i p_j exp(lambda * s_ij) = 1`` by bisection.
    Requires a valid scoring regime: negative expected score and at least
    one positive score (otherwise no positive root exists — raises).
    """
    S = _score_table(params)
    if freqs is None:
        k = S.shape[0]
        p = np.full(k, 1.0 / k)
    else:
        p = np.asarray(freqs, dtype=np.float64)
        if p.shape[0] != S.shape[0] or abs(p.sum() - 1.0) > 1e-9:
            raise ValueError(
                f"freqs must be {S.shape[0]} probabilities summing to 1")
    w = np.outer(p, p)
    expected = float((w * S).sum())
    if expected >= 0:
        raise ValueError(
            f"expected score {expected:.3f} >= 0: local-alignment "
            "statistics require a negative-drift scoring model")
    if S.max() <= 0:
        raise ValueError("no positive substitution score: lambda undefined")

    def phi(lam: float) -> float:
        return float((w * np.exp(lam * S)).sum()) - 1.0

    lo, hi = 0.0, 1.0
    while phi(hi) < 0:
        hi *= 2.0
        if hi > 1e3:
            raise ValueError("failed to bracket lambda")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if phi(mid) < 0:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


def entropy_h(params: AlignmentParameters,
              freqs: tuple[float, ...] | None = None) -> float:
    """Relative entropy H (bits-per-position analogue, in nats):
    ``H = lambda * sum p_i p_j s_ij e^{lambda s_ij}``."""
    lam = karlin_lambda(params, freqs)
    S = _score_table(params)
    k = S.shape[0]
    p = (np.full(k, 1.0 / k) if freqs is None
         else np.asarray(freqs, dtype=np.float64))
    w = np.outer(p, p)
    return float(lam * (w * S * np.exp(lam * S)).sum())


@dataclasses.dataclass(frozen=True)
class GumbelCalibration:
    """Fitted extreme-value law for one scoring model: E-value machinery.

    ``lam``/``k`` are the Gumbel parameters for ``P(S >= x) ~= 1 -
    exp(-k*m*n*e^{-lam*x})`` at the calibration lengths; ``m``/``n`` and
    ``samples`` record provenance.
    """

    lam: float
    k: float
    m: int
    n: int
    samples: int

    def bit_score(self, raw) -> np.ndarray:
        return (self.lam * np.asarray(raw, dtype=np.float64)
                - math.log(self.k)) / math.log(2.0)

    def evalue(self, raw, query_len: int, db_len: int) -> np.ndarray:
        """Expected chance hits >= raw in a (query_len x db_len) search."""
        return (self.k * float(query_len) * float(db_len)
                * np.exp(-self.lam * np.asarray(raw, dtype=np.float64)))

    def pvalue(self, raw, query_len: int, db_len: int) -> np.ndarray:
        return -np.expm1(-self.evalue(raw, query_len, db_len))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, text: str) -> "GumbelCalibration":
        return cls(**json.loads(text))


def calibrate(
    params: AlignmentParameters,
    m: int = 128,
    n: int = 128,
    samples: int = 512,
    seed: int = 0,
    impl: str = "auto",
    lam: float | None = None,
) -> GumbelCalibration:
    """Empirically fit the Gumbel law for this scoring model (SW only).

    Scores ``samples`` random uniform-DNA pairs of shape (m, n) through
    the framework's own kernels, then fits: lambda from the score variance
    (Gumbel: var = pi^2 / (6 lambda^2)) unless supplied (pass the
    theoretical :func:`karlin_lambda` for ungapped models), and K from the
    location: ``mode = mean - gamma/lambda``, ``K = e^{lambda*mode} /
    (m*n)``. This is BLAST's simulation approach in miniature; for
    production-grade precision raise ``samples`` (error ~ 1/sqrt(samples))
    and cache the result (``to_json``).
    """
    from versalignlib_tpu.search import _pick_impl
    from versalignlib_tpu.types import Algorithm

    if params.matrix is not None:
        n_codes, lo_code = len(params.matrix) - 1, 1
    else:
        n_codes, lo_code = 4, 1
    rng = np.random.default_rng(seed)
    reads = rng.integers(lo_code, lo_code + n_codes,
                         size=(samples, m)).astype(np.uint8)
    refs = rng.integers(lo_code, lo_code + n_codes,
                        size=(samples, n)).astype(np.uint8)
    impl, interpret = _pick_impl(impl)
    if impl == "pallas":
        from versalignlib_tpu.ops.pallas_score import score_batch_device

        scores = np.asarray(score_batch_device(
            reads, refs, params, Algorithm.SMITH_WATERMAN, interpret))
    else:
        from versalignlib_tpu.ops.xla import score_batch

        scores = np.asarray(score_batch(
            reads, refs, params, Algorithm.SMITH_WATERMAN))
    s = scores.astype(np.float64)
    if lam is None:
        var = float(s.var())
        if var <= 0:
            raise ValueError("degenerate score distribution; raise samples")
        lam = math.pi / math.sqrt(6.0 * var)
    mode = float(s.mean()) - EULER_GAMMA / lam
    k = math.exp(lam * mode) / (m * n)
    return GumbelCalibration(lam=lam, k=k, m=m, n=n, samples=samples)
