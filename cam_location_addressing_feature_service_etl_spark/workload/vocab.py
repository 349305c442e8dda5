"""Vocabulary induction: iterative BPE-style merge-rule learning.

The third iterative family member (after connected components and
PageRank) and the only DATA-DEPENDENT one: the transformation applied
in round r is chosen from a global statistic of round r-1's output
(the most frequent adjacent pair), so the oracle must unroll both the
statistic and the rewrite each round. ``operators/bpe.py`` holds the
window-function formulation of greedy-left merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import JOIN_CH, bpe_merge_rules
from ..operators.dedup import tokens_col
from .llm_text import TOKENS_SQL, _t
from . import register

_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    toks = TOKENS_SQL.format(col="text")
    parts = [
        f"""
WITH tokl AS (SELECT doc_id, {toks} AS t FROM documents),
tok0 AS (
  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM tokl
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
wn{p} AS (
  SELECT doc_id, pos, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok{p}
),
top{r} AS (
  SELECT tok AS a, nxt AS b, COUNT(*) AS cnt
  FROM wn{p} WHERE nxt IS NOT NULL
  GROUP BY tok, nxt ORDER BY cnt DESC, a, b LIMIT 1
),
m{r} AS (
  SELECT w.doc_id, w.pos FROM wn{p} w JOIN top{r} ON w.tok = top{r}.a AND w.nxt = top{r}.b
),
i{r} AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM m{r}
),
tk{r} AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           pos - MIN(pos) OVER (PARTITION BY doc_id, isl) AS off
    FROM i{r}
  ) WHERE off % 2 = 0
),
tok{r} AS (
  SELECT t.doc_id,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS pos,
         CASE WHEN s.pos IS NOT NULL THEN top{r}.a || '{JOIN_CH}' || top{r}.b
              ELSE t.tok END AS tok
  FROM tok{p} t
  CROSS JOIN top{r}
  LEFT JOIN tk{r} s ON s.doc_id = t.doc_id AND s.pos = t.pos
  LEFT JOIN tk{r} d ON d.doc_id = t.doc_id AND d.pos + 1 = t.pos
  WHERE d.pos IS NULL
)"""
        )
    selects = [
        f"SELECT {r} AS merge_round, a AS pair_a, b AS pair_b, CAST(cnt AS BIGINT) AS pair_count FROM top{r}"
        for r in range(1, rounds + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


@register("text_bpe_merge_rules", oracle=_bpe_oracle())
def text_bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn {n} BPE-style merge rules over the document corpus: per
    round, the corpus-wide most frequent adjacent token pair (count
    desc, lexicographic tiebreak) is merged greedy-left everywhere and
    the next round re-counts on the rewritten sequences. Output: one
    rule per round with its pre-merge pair count — the vocabulary
    deltas a tokenizer-training job would emit."""
    (documents,) = _t(spark, sf_dir, "documents")
    tokens = documents.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    )
    return bpe_merge_rules(tokens, rounds=_BPE_ROUNDS)


text_bpe_merge_rules.__doc__ = text_bpe_merge_rules.__doc__.format(n=_BPE_ROUNDS)
