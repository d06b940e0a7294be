"""Freeze embed_media's output over the sf0.001 media table to
tests/fixtures/golden/media_embeddings.jsonl — the DuckDB oracle for the
media_embed_ann driver query recomputes brute-force cosine top-k from these
frozen vectors (contract_sql._MEDIA_EMB_VIEW), and a pytest pins the live
mapInPandas output to the fixture.

Re-run ONLY when multimodal.embed_media / media_df semantics deliberately
move, and say so in the commit message (the fixture freezes the embedding
spec the same way articles.jsonl freezes the cascade spec).

float32 components are serialized through Python float (exact double
widening), so DuckDB's DOUBLE[] read reproduces Spark's float->double cast
bit-for-bit.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden", "media_embeddings.jsonl",
)


def main() -> None:
    from newsspark.multimodal import embed_media, media_df
    from newsspark.session import get_spark

    spark = get_spark(app_name="freeze-media-emb", cores=8,
                      shuffle_partitions=8)
    rows = (
        embed_media(media_df(spark, "/root/testdata/sf0.001"))
        .where("error is null")
        .selectExpr("media_id as vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    with open(OUT, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "vec_id": r["vec_id"],
                        "embedding": [float(v) for v in r["embedding"]],
                    }
                )
                + "\n"
            )
    print(f"wrote {len(rows)} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
