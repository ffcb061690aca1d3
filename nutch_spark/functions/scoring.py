"""Scoring-filter hook registry — the reference's ScoringFilter
extension surface as column-function hooks.

Reference: scoring/ScoringFilter.java defines 9 hook points that
plugins (default: scoring-opic) implement; the crawl jobs call them at
fixed places. Here each hook is a plain Python callable over Columns,
collected in a `ScoringHooks` record — registering a custom scorer is
assigning a function, no classloading:

  hook                      called from                reference
  ----                      -----------                ---------
  injected_score            inject seed rows           OPICScoringFilter.injectedScore (score as-is)
  initial_score             new linked URLs            OPICScoringFilter.initialScore = 0.0
  generator_sort_value      generate ordering          OPICScoringFilter.generatorSortValue = score × initSort
  pass_score_before_parsing fetch → content metadata   OPIC stashes score for parse
  pass_score_after_parsing  content → parse metadata   (pass-through)
  distribute_score_to_outlinks  parse outlink contribs OPICScoringFilter.distributeScoreToOutlinks:
                                                       score/valid_count × internal/external factor
  update_db_score           updatedb merge             OPICScoringFilter.updateDbScore = score + Σ inlinks
  indexer_score             index boost                OPICScoringFilter.indexerScore = score
  orphan_score              (orphan cleanup; unused)   —

`OPIC` below reproduces the default plugin exactly — it is the very
arithmetic the operators inline (updatedb adds the link-adjust sum,
parse divides by valid_count, generate sorts by score), so the default
hook set and the operator defaults agree by construction; operators
take these hooks where the computation is a genuine extension point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[..., Column]


def _identity(score: Column) -> Column:
    return score


def _as_score_col(init_sort) -> Column:
    """Sort values thread through plugin chains
    (ScoringFilters.generatorSortValue), so a hook's init_sort may be
    the previous plugin's output Column rather than a float."""
    return init_sort if isinstance(init_sort, Column) else F.lit(float(init_sort))


@dataclass
class ScoringHooks:
    injected_score: ColumnFn = _identity
    # initialScore(url, datum) runs on the promoted first-link datum
    # for brand-new linked URLs (CrawlDbReducer.java:150-153, 192-206):
    # OPIC resets the score to 0; a no-op filter (AbstractScoringFilter)
    # keeps the link datum's own score, so the hook receives it.
    initial_score: ColumnFn = field(default=lambda link_score=None: F.lit(0.0))
    generator_sort_value: ColumnFn = field(
        default=lambda score, init_sort=1.0: score * _as_score_col(init_sort)
    )
    pass_score_before_parsing: ColumnFn = _identity
    pass_score_after_parsing: ColumnFn = _identity
    distribute_score_to_outlinks: ColumnFn = field(
        default=lambda score, valid_count, factor: score / valid_count * factor
    )
    update_db_score: ColumnFn = field(
        default=lambda base, link_adjust: base + link_adjust
    )
    indexer_score: ColumnFn = _identity


OPIC = ScoringHooks()

_REGISTRY: dict[str, ScoringHooks] = {"opic": OPIC}


def register(name: str, hooks: ScoringHooks) -> None:
    _REGISTRY[name] = hooks


def get(name: str) -> ScoringHooks:
    return _REGISTRY[name]
