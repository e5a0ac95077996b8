"""Knob selection helpers for the LSH dedup family.

``lsh_params_for_threshold`` picks (n_bands, rows_per_band) so the
MinHash banding S-curve P(pair collides) = 1 − (1 − s^r)^b crosses 1/2
as close as possible to the desired Jaccard threshold — the standard
(Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4) way to turn
"drop pairs above similarity t" into concrete banding knobs for
``dedup.minhash_band_index`` / ``minhash_lsh_pairs``.

Pure driver-side arithmetic over the knob space — nothing here touches
data.
"""

from __future__ import annotations

import math


def lsh_collision_probability(s: float, n_bands: int,
                              rows_per_band: int) -> float:
    """P(candidate pair) for a pair with true Jaccard ``s`` under
    (b, r) banding: 1 − (1 − s^r)^b."""
    return 1.0 - (1.0 - s ** rows_per_band) ** n_bands


def lsh_params_for_threshold(threshold: float,
                             n_hashes: int = 128) -> dict:
    """Choose (n_bands, rows_per_band) with n_bands·rows_per_band ≤
    ``n_hashes`` whose S-curve midpoint (the similarity where collision
    probability crosses 1/2) is nearest ``threshold``.

    Returns {n_bands, rows_per_band, midpoint, p_at_threshold} —
    ``p_at_threshold`` is the collision probability at exactly the
    requested threshold (recall for pairs right at the cut)."""
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for r in range(1, n_hashes + 1):
        b = n_hashes // r
        if b < 1:
            break
        # midpoint: s where 1-(1-s^r)^b = 1/2  =>  s = (1-2^(-1/b))^(1/r)
        mid = (1.0 - 2.0 ** (-1.0 / b)) ** (1.0 / r)
        cand = (abs(mid - threshold), r, b, mid)
        if best is None or cand[0] < best[0]:
            best = cand
    _, r, b, mid = best
    return {"n_bands": b, "rows_per_band": r,
            "midpoint": round(mid, 4),
            "p_at_threshold": round(
                lsh_collision_probability(threshold, b, r), 4)}
