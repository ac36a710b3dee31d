"""Focused (topical) crawling: frontier priority from parent-page
relevance.

Chakrabarti, van den Berg & Dom, "Focused crawling: a new approach to
topic-specific Web resource discovery" (Computer Networks 31, 1999 —
public paper): instead of crawling breadth-first, score each FETCHED
page against the target topic and dispatch its out-links with priority
proportional to the parent's score — pages about a topic
overwhelmingly link to more pages about it (the paper's radius-1
hypothesis). This is the third frontier-ordering signal beside link
authority (``graphrank.rank_priorities``) and freshness
(``revisit``): authority says *important*, focus says *on-topic*.

The relevance source is pluggable — any (discovered_seq, relevance)
table over fetched pages: ``lmquality.score_unigram`` fit on an
in-topic corpus (low perplexity = on-topic, the CCNet trick),
``functions/text.quality_score``, or an external classifier's output.

Scale shape: the level assignment windows over the PAGE dim (fetched
pages — orders of magnitude smaller than the frontier; same documented
trade-off as ``rank_priorities``, swap ntile for approxQuantile cuts
if the page dim itself is huge), then ONE equi-join on ``parent_seq``
against the frontier — the frontier is already hash-partitioned on
that key family, and children of one hot parent are edge rows, not a
window. Seeds and orphans (no scored parent) keep their base priority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def focused_priorities(
    frontier: DataFrame,
    page_relevance: DataFrame,
    n_levels: int = 10,
    seq_col: str = "discovered_seq",
    rel_col: str = "relevance",
    priority_col: str = "priority",
) -> DataFrame:
    """Boost each frontier row's ``priority`` by its PARENT page's
    relevance level (1..n_levels, ntile over the scored-page dim; ties
    broken by ``seq_col`` so the assignment is deterministic). Rows
    whose ``parent_seq`` has no score — seeds, parents not yet scored
    — get no boost. The boost ADDS to the existing priority, so
    source-declared priorities and rank/focus signals compose the same
    way ``rank_priorities`` does."""
    w = Window.orderBy(F.asc(rel_col), F.asc(seq_col))
    levels = page_relevance.select(
        F.col(seq_col).alias("parent_seq"),
        F.ntile(n_levels).over(w).alias("_rel_level"),
    )
    return (
        frontier.join(levels, "parent_seq", "left")
        .withColumn(
            priority_col,
            F.col(priority_col) + F.coalesce(F.col("_rel_level"), F.lit(0)),
        )
        .drop("_rel_level")
    )
