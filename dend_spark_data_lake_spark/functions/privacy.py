"""Differential-privacy noise primitives for releasable aggregates.

A training-data pipeline that publishes corpus statistics (per-language
counts, per-source sizes — the dataset-card numbers) may need them
differentially private. The standard mechanism for counting queries is
Laplace noise with scale b = sensitivity / epsilon (Dwork et al.,
"Calibrating Noise to Sensitivity in Private Data Analysis", TCC 2006).

The noise here is DETERMINISTIC — drawn by inverse-CDF from the md5
bucket of a caller-supplied key (normally the group key plus a salt),
the same engine-portable uniform the sampling operators use
(operators/sampling.py). That makes the released numbers reproducible
across runs and oracle-checkable cross-engine.

PRIVACY CAVEAT — read before releasing anything: with a PUBLIC salt
(such as the demo default ``"laplace"``) this mechanism provides ZERO
privacy, not epsilon-DP. Anyone who knows the salt can recompute
``md5(key || ':' || salt)`` from the group key alone, reconstruct the
exact noise value, and subtract it to denoise the release exactly.
That is strictly weaker than a released one-shot noisy table, whose
noise realization is not public. The deterministic draw exists so the
cross-engine oracle can certify the PLUMBING (inverse-CDF transform,
scan-side projection, scale arithmetic) — it is a testing device, not
a privacy mechanism. Production DP use REQUIRES swapping
``md5(key||salt)`` for a keyed PRF (HMAC) with a salt kept secret from
every release consumer (and fresh per release for composition); the
Spark-side plumbing is identical. Callers should treat the ``salt``
parameter as mandatory-and-secret, never the default.

No counterpart in the reference (SURVEY.md §2 training-pipeline
extension rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket_int, _BUCKETS


def det_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in the OPEN interval (0, 1): the 16-bit md5
    bucket of ``key || ':' || salt`` mapped to ``(h + 0.5) / 65536`` —
    never exactly 0, 0.5, or 1, so ``ln`` below is always finite and the
    sign() below never sees an exact zero."""
    return (
        hash_bucket_int(F.concat(key.cast("string"), F.lit(":" + salt)))
        + F.lit(0.5)
    ) / F.lit(float(_BUCKETS))


def laplace_noise(key: Column, scale: float, salt: str) -> Column:
    """Laplace(0, b) noise by inverse CDF of a deterministic uniform.

    ``salt`` is deliberately REQUIRED (no default): a public or guessable
    salt makes the noise exactly recomputable from ``key`` and the release
    denoisable (zero privacy — see the module caveat). Pass a secret,
    per-release value in production (and swap md5 for HMAC).

    With c = u - 1/2 ∈ (-1/2, 1/2):  noise = -b · sign(c) · ln(1 - 2|c|).
    DuckDB replica (the oracle formula, kept in lockstep with this
    expression):

        -b * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))
        where u = (CAST(concat('0x', substr(md5(key || ':' || salt), 1, 4))
                   AS BIGINT) + 0.5) / 65536.0

    Pure scan-side projection — adds no shuffle to the aggregate it
    perturbs.
    """
    u = det_uniform(key, salt)
    c = u - F.lit(0.5)
    return F.lit(-float(scale)) * F.signum(c) * F.log(F.lit(1.0) - 2.0 * F.abs(c))
