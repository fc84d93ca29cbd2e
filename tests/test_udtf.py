"""Python UDTF surface (SURVEY.md §2.11): a table function expanding each
document into sentence rows, checked equivalent to the JVM explode path
(which is what production uses — the UDTF exists for logic that CAN'T be
expressed with explode/split)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, sent_idx: int, sentence: string")
class SentenceSplit:
    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for i, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield doc_id, i, s


def test_udtf_matches_jvm_explode(spark):
    df = spark.createDataFrame(
        [
            (1, "First point. Second point.  Third."),
            (2, "Only one"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("t_docs")
    spark.udtf.register("sentence_split", SentenceSplit)
    via_udtf = {
        (r.doc_id, r.sentence)
        for r in spark.sql(
            "SELECT s.doc_id, s.sentence FROM t_docs, "
            "LATERAL sentence_split(doc_id, text) s"
        ).collect()
    }
    via_explode = {
        (r.doc_id, r.sentence)
        for r in df.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.transform(
                        F.split("text", r"\."), lambda s: F.trim(s)
                    ),
                    lambda s: s != "",
                )
            ).alias("sentence"),
        ).collect()
    }
    assert via_udtf == via_explode
    assert (1, "Second point") in via_udtf
