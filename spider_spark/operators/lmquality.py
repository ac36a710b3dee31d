"""Self-trained unigram LM quality scoring (round 4; beyond the
reference — SURVEY.md §8).

The CCNet (Wenzek et al., LREC'20) / GPT-3 (Brown et al. 2020, App. A)
pipeline scores every candidate document with a language model and
keeps the low-perplexity tail; CCNet's KenLM stage is a 5-gram model,
but the pipeline SHAPE — fit a model on a corpus, score every doc,
threshold on per-token log-prob — is what a Spark engine must supply.
This module implements that shape with a corpus-fit unigram model (the
container has no KenLM; a unigram model is the degenerate n=1 case and
keeps every step an exact, oracle-checkable DataFrame computation).

Scale shape:

* :func:`fit_unigram` — ONE map-side-combinable token shuffle
  (``explode → groupBy(token).count``); ``min_count`` and ``vocab_cap``
  bound the model size so the scoring join always BROADCASTS (a 64k
  vocab is a few MB — never a shuffle on the corpus side);
* :func:`score_unigram` — explode + broadcast-hash join + one
  ``groupBy(doc_id)`` re-aggregation: the only corpus-wide shuffle is
  on the doc id, exactly like ``textdedup.decontaminate``;
* determinism — pure count arithmetic plus ``ln``; ties at the vocab
  cap break by (count DESC, token ASC), so the same corpus yields the
  same model on any cluster size.

Out-of-vocabulary tokens take an add-half floor: ``p_oov = 0.5 / N``
(half an observation over the training mass — the Jeffreys/Krichevsky-
Trofimov choice), so unseen junk degrades the score smoothly instead of
zeroing it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


@dataclass
class UnigramModel:
    """Fitted model: a broadcast-sized vocab DataFrame of
    ``(token, n, logp)``, the training-token total, and the OOV floor
    log-prob (``ln(0.5 / total_tokens)``)."""

    vocab: DataFrame
    total_tokens: int
    oov_logp: float


def fit_unigram(
    corpus: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    vocab_cap: int = 1 << 16,
) -> UnigramModel:
    """Fit a unigram LM over ``corpus[text_col]``.

    One ``explode → groupBy(token).count`` pass (map-side combinable —
    partial counts merge before the shuffle); the probability mass
    denominator is the FULL token count (including tokens later dropped
    by ``min_count``/``vocab_cap``), so kept-token probabilities stay
    honest and the dropped tail is absorbed by the OOV floor at scoring
    time. The vocab is capped to the ``vocab_cap`` most frequent tokens
    (ties: token ASC) so the model is always broadcastable.
    """
    counts = (
        corpus.select(F.explode(TX.tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # total over the aggregated counts: vocab-sized job, not a second
    # pass over the corpus
    total = counts.agg(F.sum("n")).first()[0] or 0
    if total == 0:
        return UnigramModel(
            counts.select("token", "n", F.lit(0.0).alias("logp")),
            0,
            0.0,
        )
    vocab = (
        counts.filter(F.col("n") >= min_count)
        # the sort runs over the BOUNDED vocab dim (not the corpus) and
        # limit() keeps it a TakeOrdered, never a global sort shuffle
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(vocab_cap)
        .select("token", "n", F.log(F.col("n") / F.lit(float(total))).alias("logp"))
    )
    return UnigramModel(vocab, int(total), math.log(0.5 / total))


def score_unigram(
    docs: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average log-prob and perplexity under ``model``.

    Returns ``(id_col, n_toks, avg_logp, perplexity)`` with one row per
    input row; empty documents score NULL. The vocab join broadcasts;
    the only corpus-wide shuffle is the ``groupBy(id_col)``
    re-aggregation.
    """
    tok = docs.select(id_col, F.explode(TX.tokens(F.col(text_col))).alias("token"))
    scored = (
        tok.join(F.broadcast(model.vocab.select("token", "logp")), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.coalesce(F.col("logp"), F.lit(model.oov_logp))).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_toks",
            (F.col("_sum_lp") / F.col("n_toks")).alias("avg_logp"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_toks"), F.lit(0)).alias("n_toks"),
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("perplexity"),
        )
    )
