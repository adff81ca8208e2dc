"""Association-rule mining registry rows (market-basket over orders'
lineitems), DuckDB oracle replaying the exact integer-count rule
statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import mining as M
from ..sources import load_table
from . import register

MIN_SUPPORT = 2
RULES_TOP = 50

ASSOC_ORACLE = f"""
WITH atx AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
abs_ AS (SELECT b FROM atx GROUP BY b HAVING count(*) <= {M.MAX_BASKET}),
at_ AS (SELECT atx.b, atx.i FROM atx JOIN abs_ USING (b)),
anb AS (SELECT count(DISTINCT b) AS n FROM at_),
asup AS (SELECT i, count(*) AS s FROM at_ GROUP BY 1),
apairs AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*) AS sup_ab
  FROM at_ a JOIN at_ b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
),
arules AS (
  SELECT item_a, item_b, CAST(sup_ab AS BIGINT) AS sup_ab,
         CAST(sa.s AS BIGINT) AS sup_a, CAST(sb.s AS BIGINT) AS sup_b,
         (sup_ab * 1000000) // sa.s AS conf_a_b_fp6,
         (sup_ab * 1000000) // sb.s AS conf_b_a_fp6,
         (sup_ab * anb.n * 1000000) // (sa.s * sb.s) AS lift_fp6
  FROM apairs
  JOIN asup sa ON sa.i = apairs.item_a
  JOIN asup sb ON sb.i = apairs.item_b
  CROSS JOIN anb
),
aranked AS (
  SELECT *, row_number() OVER (ORDER BY lift_fp6 DESC, item_a ASC, item_b ASC) AS rank
  FROM arules
)
SELECT item_a, item_b, sup_ab, sup_a, sup_b, conf_a_b_fp6, conf_b_a_fp6, lift_fp6, rank
FROM aranked WHERE rank <= {RULES_TOP}
"""


@register("assoc_part_rules", oracle=ASSOC_ORACLE)
def assoc_part_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: top-{k}
    part pairs by LIFT among pairs co-purchased in >= {s} orders, with
    exact support counts and fp6 integer confidence/lift (rank order on
    an integer key is engine-build-proof). The pair generator
    is a basket-key equi-join (cost Σ|basket|², bounded by the
    ``max_basket`` guard — the itemset analogue of the LSH paths'
    ``max_bucket`` cap), support counting is one map-side-combined
    aggregate, and the item-support table joins back item-sized. The
    oracle replays the whole rule derivation from raw lineitem with
    integer-exact counts, so a single missed or miscounted pair breaks
    the hash.""".format(k=RULES_TOP, s=MIN_SUPPORT)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    rules = M.pair_rules(
        li, basket="l_orderkey", item="l_partkey", min_support=MIN_SUPPORT
    )
    lim = rules.orderBy(
        F.col("lift_fp6").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(RULES_TOP)
    w = Window.orderBy(F.col("lift_fp6").desc(), F.col("item_a").asc(), F.col("item_b").asc())
    return lim.withColumn("rank", F.row_number().over(w))
