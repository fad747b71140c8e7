"""User-defined function surface — the extension hooks the reference
lacks entirely (its only extension point is forwarding parse args to
``read.table``, ``R/lazy.frame.R:60,93-99``).

Ground rules encoded here (and enforced by bench):
- UDFs are the slow path; everything expressible with built-ins stays
  JVM-side. These exist for logic Spark genuinely can't express.
- When Python is unavoidable: Arrow-vectorized ``pandas_udf`` /
  ``applyInPandas`` / ``mapInPandas`` — never row-at-a-time
  ``F.udf`` in a hot path (10-100× slower: per-row pickle serde).
- Grouped-map functions receive one GROUP per call: at 100 TB the group
  key must have bounded cardinality per group (a skewed giant group
  lands on one executor — pre-salt or pre-aggregate first).

Each flavor below is deterministic so the DuckDB oracle can verify the
Python path value-for-value against pure SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------- #
# scalar pandas UDF (Arrow-vectorized, batch at a time)
# --------------------------------------------------------------------- #

@F.pandas_udf(T.LongType())
def token_count_vectorized(text: pd.Series) -> pd.Series:
    """Whitespace token count — the pandas twin of
    operators.text.token_count, for pipelines already paying the Arrow
    boundary. Semantics identical to the JVM version (oracle-checked)."""
    stripped = text.fillna("").str.strip()
    return stripped.str.split(r"\s+").map(lambda xs: 0 if xs == [""] else len(xs)).astype("int64")


# --------------------------------------------------------------------- #
# grouped-aggregate pandas UDF (one group in → one scalar out)
# --------------------------------------------------------------------- #

@F.pandas_udf(T.DoubleType())
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """sum(price*qty)/sum(qty) — a UDAF the reference could never do."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else 0.0


# --------------------------------------------------------------------- #
# grouped-map applyInPandas (one group in → a frame out)
# --------------------------------------------------------------------- #

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("zscore_x1000", T.LongType()),
    ]
)


def zscore_per_group(orders: DataFrame) -> DataFrame:
    """Per-status z-score of order totals via grouped-map pandas.

    Output is integer milliunits (floor(z*1000)) — the engine's standard
    trick for cross-engine float reproducibility (see parity.py
    conventions). The same quantity is one SQL window expression; the
    point here is demonstrating the Python escape hatch yields IDENTICAL
    results to the declarative plan.
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        import numpy as np

        z = (pdf["o_totalprice"] - mu) / sd if sd and not pd.isna(sd) else pdf["o_totalprice"] * 0.0
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"].astype("int64"),
                "o_orderstatus": pdf["o_orderstatus"],
                "zscore_x1000": np.floor(z * 1000).astype("int64"),
            }
        )

    return (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .applyInPandas(per_group, ZSCORE_SCHEMA)
    )


# --------------------------------------------------------------------- #
# Python UDTF (one row in → many rows out; Spark 3.5+/4)
# --------------------------------------------------------------------- #

@F.udtf(returnType="pos: int, bigram: string", useArrow=True)
class BigramUDTF:
    """Emit (position, bigram) rows per document — table-function shape
    (lateral view) the reference's row-model cannot express at all.
    Arrow-optimized (``useArrow=True``): rows cross the Python boundary
    in Arrow batches (ArrowEvalPythonUDTF), not one pickled row at a
    time — the same 10-100x boundary-cost rule every other Python path
    in this repo follows."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        words = [w for w in (text or "").strip().split() if w]
        for i in range(len(words) - 1):
            yield i + 1, f"{words[i]} {words[i + 1]}"


def bigrams(spark, docs: DataFrame) -> DataFrame:
    """doc_id + exploded bigrams via the UDTF (LATERAL join)."""
    spark.udtf.register("lfs_bigrams", BigramUDTF)
    docs.createOrReplaceTempView("__udtf_docs__")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM __udtf_docs__ d,
        LATERAL lfs_bigrams(d.doc_id, d.text) t
        """
    )
