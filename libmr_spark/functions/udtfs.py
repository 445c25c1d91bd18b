"""Python UDTFs (table functions) — the one UDF shape the builder's
step model doesn't already cover. The reference's reader IS a
UDTF-as-source (SURVEY §2.2: ``ExecutionReader`` yields rows until
exhausted, /root/reference/src/mr.h:80); Spark 4's native ``udtf``
gives the lateral form: one input row → many output rows, usable from
SQL after registration.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string", useArrow=True)
class Tokenize:
    """Explode a string into (position, token) rows — the canonical
    UDTF demo, mirroring the per-record fan-out a LibMR reader does
    from a scanned key. ``useArrow=True`` puts the lateral fan-out on
    the Arrow batch path (plan node ``ArrowEvalPythonUDTF``, verified
    by scripts/plan_lint.py) instead of row-at-a-time pickling."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield (i, tok)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM tokenize(...)``)."""
    spark.udtf.register("tokenize", Tokenize)
