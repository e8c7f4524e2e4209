"""Amendment-source reconciliation: merge steno votes with PDF letters.

The reference assembles its amendments table by joining two independently
parsed sources — letter metadata from amendment PDFs and vote outcomes from
steno protocols — reconciling LETTER VARIANTS on the way: a steno vote can
reference "A1"/"A2" (re-submitted variants of amendment "A") that the PDF
lists only under the base letter, so an exact letter match is tried first
and the digit-stripped base letter second
(/root/reference/pspcz_analyzer/services/amendments/merger.py:144-251; the
merged 33-column shape is cache_manager.py:14-47).

Spark-first shape: the letters side is dimension-sized (letters per
document), so both match levels are BROADCAST hash joins against the vote
fact — no shuffle of the votes at all, and the variant fallback is a second
broadcast join rather than a per-row retry loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_amendment_sources(
    votes: DataFrame,
    letters: DataFrame,
    votes_key: str = "doc_id",
    letters_key: str = "doc_id",
    letter_col: str = "letter",
    payload_cols: tuple[str, ...] = ("submitters", "n_subs"),
) -> DataFrame:
    """Attach letter payloads to votes with two-level letter matching.

    ``votes`` rows join ``letters`` on (key, letter) first ('exact'); rows
    that miss retry on the digit-stripped base letter ('variant', e.g.
    "A1" -> "A"); rows with no letter or no match at either level get
    ``match_kind = 'none'`` and null payloads. Votes columns pass through
    unchanged; payload columns are appended plus ``match_kind``.
    """
    payload = list(payload_cols)

    # Both match levels build a broadcast side from ``letters``; without a
    # persist the letters plan — typically a Python mapInPandas PDF parse —
    # executes once PER build. Dimension-sized by contract, so caching it
    # is cheap; LRU eviction reclaims it (queries return lazily, so there
    # is no safe unpersist point here).
    from pyspark import StorageLevel

    letters = letters.persist(StorageLevel.MEMORY_AND_DISK)

    def _side(tag: str, key_expr: str) -> DataFrame:
        return F.broadcast(
            letters.select(
                F.col(letters_key).alias(f"__{tag}_key"),
                F.col(letter_col).alias(f"__{tag}_letter"),
                *[F.col(c).alias(f"__{tag}_{c}") for c in payload],
                F.lit(1).alias(f"__{tag}_hit"),
            )
        )

    exact = _side("e", letters_key)
    variant = _side("v", letters_key)
    base = F.regexp_replace(F.col(letter_col), r"\d+$", "")
    out = (
        votes.join(
            exact,
            (F.col(votes_key) == F.col("__e_key"))
            & (F.col(letter_col) == F.col("__e_letter")),
            "left",
        )
        .join(
            variant,
            (F.col(votes_key) == F.col("__v_key"))
            & (base == F.col("__v_letter")),
            "left",
        )
    )
    kind = (
        F.when(F.col("__e_hit").isNotNull(), "exact")
        .when(F.col("__v_hit").isNotNull(), "variant")
        .otherwise("none")
    )
    return out.select(
        *[F.col(c) for c in votes.columns],
        *[
            F.coalesce(F.col(f"__e_{c}"), F.col(f"__v_{c}")).alias(c)
            for c in payload
        ],
        kind.alias("match_kind"),
    )
